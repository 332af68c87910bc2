"""Distributed Lloyd's must match an independent NumPy transcription
from the same deterministic init (golden gate — no SQL oracle for
iterative algorithms)."""

from __future__ import annotations

import numpy as np


def _blobs(rng, n_per=20, dim=4):
    centers = np.array(
        [[5.0, 0, 0, 0], [0, 5.0, 0, 0], [0, 0, 5.0, 0]]
    )
    pts = np.vstack(
        [c + rng.normal(0, 0.3, size=(n_per, dim)) for c in centers]
    )
    return pts


def _numpy_lloyd(pts, init, n_iter):
    C = init.copy()
    for _ in range(n_iter):
        d2 = ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(np.round(d2, 12), axis=1)
        for c in range(len(C)):
            if np.any(a == c):
                C[c] = pts[a == c].mean(axis=0)
    return C, a


def test_kmeans_matches_numpy(spark):
    from ontoea_spark.operators.kmeans import assign_cells, kmeans_fit, kmeans_init

    rng = np.random.default_rng(3)
    pts = _blobs(rng)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "id long, vec array<double>",
    )
    init = kmeans_init(emb, k=3)
    init_mat = np.array(
        [r.cvec for r in sorted(init.collect(), key=lambda r: r.cid)]
    )
    want_C, want_a = _numpy_lloyd(pts, init_mat, n_iter=5)

    got = kmeans_fit(emb, k=3, n_iter=5)
    got_C = np.array([r.cvec for r in sorted(got.collect(), key=lambda r: r.cid)])
    assert np.allclose(got_C, want_C, atol=1e-9)

    got_a = {
        r.id: r.cid for r in assign_cells(emb, got).collect()
    }
    for i in range(len(pts)):
        assert got_a[i] == want_a[i]
    # blobs must be separated: 3 distinct cells, 20 members each
    from collections import Counter

    assert sorted(Counter(got_a.values()).values()) == [20, 20, 20]
