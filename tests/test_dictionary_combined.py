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
