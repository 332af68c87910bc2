"""two_kg_dictionaries must produce byte-identical dictionaries to the
per-call interleaved_ids operator (same D1/D2 semantics, 4x fewer passes
over the triple stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontoea_spark.operators.dictionary import interleaved_ids, two_kg_dictionaries
from tests.conftest import SF_CORRECT


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_combined_matches_per_call(spark):
    from ontoea_spark.pipeline.extract import extract_pages_text, extract_triples
    from ontoea_spark.pipeline.kg_build import split_two_kgs
    from ontoea_spark.pipeline.pages import synthesize_pages

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    tagged = split_two_kgs(extract_pages_text(synthesize_pages(docs)))
    all_triples = extract_triples(
        tagged.select("kg", "text"), namespace_col="kg"
    ).localCheckpoint(eager=True)
    t1 = all_triples.filter(F.col("s").startswith("kg1:"))
    t2 = all_triples.filter(F.col("s").startswith("kg2:"))

    ent_c, rel_c = two_kg_dictionaries(
        all_triples,
        F.when(F.col("s").startswith("kg1:"), F.lit(1)).otherwise(F.lit(2)),
    )
    assert _rows(ent_c) == _rows(interleaved_ids(t1, t2, roles=("s", "o")))
    assert _rows(rel_c) == _rows(interleaved_ids(t1, t2, roles=("p",)))


def test_combined_empty_second_kg(spark):
    tri = spark.createDataFrame(
        [("kg1:a", "p:x", "kg1:b"), ("kg1:b", "p:x", "kg1:a")],
        "s string, p string, o string",
    )
    ent, rel = two_kg_dictionaries(
        tri, F.when(F.col("s").startswith("kg1:"), F.lit(1)).otherwise(F.lit(2))
    )
    rows = {(r.elem, r.id) for r in ent.collect()}
    # n_other = 0 => ids continue sequentially from 0 (rank == id);
    # equal freqs tie-break by elem DESC => 'kg1:b' ranks first
    assert rows == {("kg1:b", 0), ("kg1:a", 1)}
    assert [r.id for r in rel.collect()] == [0]


def test_encode_broadcast_gate(spark):
    """VERDICT r4 #2: the encode joins must broadcast a small dictionary
    but DROP the hint past broadcast_threshold — the entity dictionary is
    corpus-derived vocab (10^8-10^9 URIs at 100 TB) and a forced
    F.broadcast there OOMs driver and executors. Past the gate the plan
    must contain no broadcast hint (AQE then picks SMJ/shuffled-hash),
    with identical results."""
    from ontoea_spark.operators.dictionary import (
        encode_attribute_triples,
        encode_pairs,
        encode_triples,
    )

    tri = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a"), ("a", "q", "zzz-unknown")],
        "s string, p string, o string",
    )
    ent = spark.createDataFrame([("a", 0), ("b", 1)], "elem string, id long")
    rel = spark.createDataFrame([("p", 0), ("q", 1)], "elem string, id long")

    def _plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString().lower()

    hinted = encode_triples(tri, ent, rel)
    gated = encode_triples(tri, ent, rel, broadcast_threshold=0)
    assert "broadcast" in _plan(hinted), _plan(hinted)
    assert "broadcast" not in _plan(gated), _plan(gated)
    assert _rows(hinted) == _rows(gated) == [(0, 0, 1), (1, 0, 0)]

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "zzz-unknown")], "e1 string, e2 string"
    )
    hinted_p = encode_pairs(pairs, ent, ent)
    gated_p = encode_pairs(pairs, ent, ent, broadcast_threshold=0)
    assert "broadcast" in _plan(hinted_p)
    assert "broadcast" not in _plan(gated_p)
    assert _rows(hinted_p) == _rows(gated_p) == [(0, 1)]

    attrs = spark.createDataFrame(
        [("a", "p", "42"), ("zzz-unknown", "p", "7")],
        "e string, a string, v string",
    )
    hinted_a = encode_attribute_triples(attrs, ent, rel)
    gated_a = encode_attribute_triples(attrs, ent, rel, broadcast_threshold=0)
    assert "broadcast" in _plan(hinted_a)
    assert "broadcast" not in _plan(gated_a)
    assert _rows(hinted_a) == _rows(gated_a) == [(0, 0, "42")]
