"""Class-path padding + decay mask (SURVEY.md §2.9 G2; reference
kgs.py:315-339 ``_padding_class_path``) and the V6 path-weighted class
embedding (ontoea.py:656-681).

Semantics transcribed exactly: paths (leaf-first, root-last) are
LEFT-padded to the max depth; the mask assigns weight ``dw^k`` to the
k-th real position counting from the leaf, NEG_INF to padding, then
softmaxes the row. ``delay_weight=0`` degenerates to a one-hot on the
leaf class (the comment at ontoea.py:282-290); ``delay_weight=1`` is
uniform over the path.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e9


def padding_class_path(
    path_ids: dict[int, list[int]], delay_weight: float = 1.0
) -> tuple[int, np.ndarray, np.ndarray, list[int]]:
    """path_ids: class_id -> [leaf_id, parent_id, ..., root_id].

    Returns (max_depth, path_mat [n, d] int64, mask_mat [n, d] float64,
    row_order) with rows sorted by class id for determinism; padding
    positions carry id 0 and softmax weight ~0.
    """
    order = sorted(path_ids)
    max_depth = max((len(p) for p in path_ids.values()), default=0)
    paths, masks = [], []
    for cls in order:
        p = path_ids[cls]
        pad = max_depth - len(p)
        paths.append([0] * pad + list(p))
        raw = np.full(max_depth, NEG_INF, dtype=np.float64)
        w = 1.0
        for i in range(pad, max_depth):
            raw[i] = w
            w *= delay_weight
        e = np.exp(raw - raw.max())
        masks.append(e / e.sum())
    return (
        max_depth,
        np.asarray(paths, dtype=np.int64).reshape(len(order), max_depth),
        np.asarray(masks, dtype=np.float64).reshape(len(order), max_depth),
        order,
    )


def path_weighted_embeds(
    onto_embeds: np.ndarray,
    path_mat: np.ndarray,
    mask_mat: np.ndarray,
) -> np.ndarray:
    """V6: per class, the mask-weighted sum of its (row-L2-normalized)
    ancestor embeddings (ontoea.py:659-660)."""
    norms = np.linalg.norm(onto_embeds, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    O = onto_embeds / norms
    return np.einsum("ndk,nd->nk", O[path_mat], mask_mat)
