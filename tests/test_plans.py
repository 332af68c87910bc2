"""Physical-plan regression gates for the scale properties the engine
depends on: predicate pushdown reaching the parquet scan, and candidate
joins staying equi-joins (never a row-level cartesian product)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["q1_pricing"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "PushedFilters: [" in plan, plan
    # the shipdate predicate must reach the scan, not sit in a Filter above it
    scan_part = plan[plan.index("PushedFilters") :]
    assert "l_shipdate" in scan_part[:400], scan_part[:400]


def test_embedding_neardup_is_not_all_pairs(spark):
    """The near-dup path must candidate-generate via bucket equi-joins —
    a CartesianProduct/BroadcastNestedLoop over the embedding rows is the
    n^2 regression the LSH banding exists to prevent."""
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["dedup_embedding"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_contamination_broadcasts_benchmark_side(spark):
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["contamination"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_lsh_topk_is_equi_join(spark):
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["ann_lsh_top1"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ivfpq_scoring_is_projection_not_pivot(spark):
    """IVF-PQ ADC scoring must be a static element_at projection over the
    candidate equi-join — no CartesianProduct anywhere, and no aggregate
    ON THE CANDIDATE PAIRS (the pivot regression would shuffle
    candidates x m rows through a groupBy(lid, rid))."""
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["ann_ivfpq_top1"](spark, SF_CORRECT)
    plan = _plan(df)
    # BroadcastNestedLoopJoin appears ONLY as the bounded centroid
    # fan-out (same shape as ivf_topk_join: n_rows x n_cells against a
    # broadcast side); a row-level cartesian would print CartesianProduct
    assert "CartesianProduct" not in plan, plan
    # every HashAggregate keys on a single id (cells/codes/lut builds);
    # a pair-keyed aggregate would print both lid and rid in its keys
    import re

    for keys in re.findall(r"HashAggregate\(keys=\[([^\]]*)\]", plan):
        assert not ("lid" in keys and "rid" in keys), keys


def test_source_cap_first_window_is_salt_partitioned(spark):
    """The stratified cap's first window must partition by (source, salt)
    so a hot domain never lands in a single window task; the final
    source-level window then sees at most cap * n_salts rows."""
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["source_cap"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "_salt" in plan, plan
    # salted window comes before (deeper in the plan string than) the
    # final source-only window: two Window operators total
    assert plan.count("Window") >= 2, plan


def test_curation_pipeline_plan_shape(spark):
    """The end-to-end curation chain must stay hash-joined (no row-level
    cartesian/nested-loop) and keep the salted cap window — the composite
    plan must not degrade the properties each stage guarantees alone."""
    from ontoea_spark import driver_queries as DQ

    df = DQ.queries()["curation_pipeline"](spark, SF_CORRECT)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "salt" in plan, plan


def test_filter_ops_broadcast_gate(spark):
    """The P6/P7/J2/J4 link- and entity-set hints are row-count-gated:
    link/entity sets grow with the corpus, so a hard broadcast hint on
    them is an OOM at crawl scale. Small sides keep the broadcast plan;
    threshold 0 drops the hint (AQE plans the join), results identical."""
    from ontoea_spark.operators.filters import (
        remove_no_triples_link,
        remove_unlinked_triples,
    )

    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c"), ("c", "p", "a")],
        "s string, p string, o string",
    )
    linked = spark.createDataFrame([("a",), ("b",)], "entity string")

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString().lower()

    hinted = remove_unlinked_triples(triples, linked)
    gated = remove_unlinked_triples(triples, linked, broadcast_threshold=0)
    assert "broadcast" in plan(hinted), plan(hinted)
    assert "broadcast" not in plan(gated), plan(gated)
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(hinted) == rows(gated) == [("a", "p", "b")]

    links = spark.createDataFrame([("a", "x"), ("z", "y")], "e1 string, e2 string")
    t2 = spark.createDataFrame([("x", "p", "y")], "s string, p string, o string")
    h2 = remove_no_triples_link(links, triples, t2)
    g2 = remove_no_triples_link(links, triples, t2, broadcast_threshold=0)
    assert "broadcast" in plan(h2), plan(h2)
    assert "broadcast" not in plan(g2), plan(g2)
    assert (
        rows(h2.select("e1", "e2")) == rows(g2.select("e1", "e2")) == [("a", "x")]
    )
