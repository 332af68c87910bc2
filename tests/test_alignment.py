"""End-to-end alignment quality + determinism + distributed-gradient
equivalence (SURVEY.md §5 rebuild test strategy)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.training.align_pipeline import (
    evaluate,
    prepare_from_parts,
    run_benchmark_alignment,
    train,
)
from ontoea_spark.training.benchgen import generate_two_kg
from ontoea_spark.training.trainer import (
    OntoEATrainer,
    TrainConfig,
    distributed_gradients,
)


@pytest.fixture(scope="module")
def bench_data(spark):
    b = generate_two_kg(spark, n_ent=300, seed=42)
    return prepare_from_parts(spark, b.triples1, b.triples2, b.links, b.cv)


def test_alignment_quality(spark, bench_data):
    """OntoEA-style quality on the D-W-15K-style synthetic benchmark:
    near-isomorphic KGs with 70% seed links must align almost perfectly."""
    model = train(bench_data, TrainConfig(dim=32, epochs=100, seed=42))
    m = evaluate(spark, bench_data, model).collect()[0]
    assert m.hits1 >= 0.9, m.asDict()
    assert m.hits10 == 1.0, m.asDict()
    assert m.mrr >= 0.93, m.asDict()


def test_training_determinism(bench_data):
    """Same seed => byte-identical embeddings (BASELINE determinism)."""
    cfg = TrainConfig(dim=16, epochs=10, seed=7)
    tri = np.array(
        [[r.s_id, r.p_id, r.o_id] for r in bench_data.edges.collect()],
        dtype=np.int64,
    )
    cv = np.array(
        [[r.ent_id, r.cls_id] for r in bench_data.cv_ids.collect()],
        dtype=np.int64,
    )
    tr = np.array(
        [
            [r.id1, r.id2]
            for r in bench_data.links_split.filter("split = 'train'").collect()
        ],
        dtype=np.int64,
    )
    runs = []
    for _ in range(2):
        m = OntoEATrainer(bench_data.n_ent, bench_data.n_rel, bench_data.n_cls, cfg)
        m.fit(tri, bench_data.sub_ids, cv, tr)
        runs.append((m.ent.copy(), m.rel.copy(), m.onto.copy(), m.mapping.copy()))
    for a, b in zip(runs[0], runs[1]):
        assert np.array_equal(a, b)


def test_distributed_gradients_match_driver(spark, bench_data):
    """The applyInPandas gradient shards must sum to the same global
    gradient regardless of partitioning (scale-out correctness)."""
    cfg = TrainConfig(dim=16, seed=3)
    model = OntoEATrainer(bench_data.n_ent, bench_data.n_rel, bench_data.n_cls, cfg)
    edges = bench_data.edges.selectExpr(
        "s_id AS h", "p_id AS r", "o_id AS t"
    )
    ge1, gr1, l1 = distributed_gradients(
        spark, edges.repartition(2), model.ent, model.rel, cfg
    )
    ge8, gr8, l8 = distributed_gradients(
        spark, edges.repartition(8), model.ent, model.rel, cfg
    )
    assert abs(l1 - l8) < 1e-6 * max(1.0, abs(l1))
    assert np.allclose(ge1, ge8, atol=1e-9)
    assert np.allclose(gr1, gr8, atol=1e-9)


def test_alignment_csls_variant(spark, bench_data):
    """V5 third pass: CSLS-rescaled fused scores (T4) keep quality."""
    model = train(bench_data, TrainConfig(dim=32, epochs=100, seed=42))
    m = evaluate(spark, bench_data, model, csls_k=10).collect()[0]
    assert m.hits1 >= 0.9, m.asDict()


def test_run_benchmark_alignment_smoke(spark):
    m = run_benchmark_alignment(
        spark, n_ent=120, cfg=TrainConfig(dim=16, epochs=30, seed=42)
    ).collect()[0]
    assert 0.0 <= m.hits1 <= 1.0 and m.mr >= 1.0
