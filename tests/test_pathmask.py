"""G2 padding/decay mask vs a direct transcription of
kgs.py:315-339, plus V6 path-weighted eval quality."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.ontology.pathmask import (
    padding_class_path,
    path_weighted_embeds,
)


def test_padding_and_mask_semantics():
    paths = {3: [3, 1, 0], 5: [5, 0], 0: [0]}
    d, pmat, mmat, order = padding_class_path(paths, delay_weight=0.5)
    assert d == 3 and order == [0, 3, 5]
    # row for cls 0: [pad, pad, 0]
    assert pmat[0].tolist() == [0, 0, 0]
    # its mask: padding ~0, real position gets all weight
    assert mmat[0][2] == pytest.approx(1.0)
    assert mmat[0][0] == pytest.approx(0.0, abs=1e-12)
    # cls 3: no padding; weights softmax([1, .5, .25])
    raw = np.array([1.0, 0.5, 0.25])
    want = np.exp(raw - raw.max()) / np.exp(raw - raw.max()).sum()
    assert np.allclose(mmat[1], want)
    # delay_weight=0 -> one-hot on the leaf (ontoea.py:282-290 comment)
    _d, _p, m0, _o = padding_class_path({7: [7, 2, 0]}, delay_weight=0.0)
    # softmax([1, 0, 0]) — leaf dominates but softmax keeps mass ratios e:1:1
    assert m0[0][0] == max(m0[0])
    # rows sum to 1
    assert np.allclose(mmat.sum(axis=1), 1.0)


def test_path_weighted_embeds_formula():
    onto = np.array([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    paths = {2: [2, 1, 0], 1: [1, 0]}
    _d, pmat, mmat, order = padding_class_path(paths, delay_weight=1.0)
    W = path_weighted_embeds(onto, pmat, mmat)
    O = onto / np.linalg.norm(onto, axis=1, keepdims=True)
    # cls 1 row (order [1, 2]): pad + [1, 0]; uniform over 2 real slots
    got1 = W[0]
    # padding slot contributes O[0] * ~0 weight
    want1 = mmat[0][0] * O[pmat[0][0]] + 0.5 * O[1] + 0.5 * O[0]
    assert np.allclose(got1, want1, atol=1e-9)


def test_alignment_quality_path_mode(spark):
    from ontoea_spark.training.align_pipeline import (
        evaluate,
        prepare_from_parts,
        train,
    )
    from ontoea_spark.training.benchgen import generate_two_kg
    from ontoea_spark.training.trainer import TrainConfig

    b = generate_two_kg(spark, n_ent=200, seed=11)
    data = prepare_from_parts(spark, b.triples1, b.triples2, b.links, b.cv)
    model = train(data, TrainConfig(dim=32, epochs=80, seed=11))
    m = evaluate(spark, data, model, type_mode="path", delay_weight=0.5).collect()[0]
    assert m.hits1 >= 0.85, m.asDict()
