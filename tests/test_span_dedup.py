"""Hand-computed semantics for dedup.span_dedup_signals — the oracle
mirrors the same interval-merge logic, so a shared misconception would
pass the oracle gate; these expectations are derived by hand instead.

Corpus (k=3 grams, tokens are single letters):

* doc 0: ``a b c d e f`` — grams at 0..3; grams ``a b c`` (pos 0) and
  ``d e f`` (pos 3) are duplicated (doc 1 / doc 2), intervals [0,3) and
  [3,6) TOUCH and must merge into ONE span covering all 6 tokens.
* doc 1: ``a b c x y z`` — only ``a b c`` (pos 0) duplicated: 3 tokens,
  1 span.
* doc 2: ``q q d e f q`` — only ``d e f`` (pos 2): 3 tokens, 1 span.
* doc 3: ``p p r p p r p p`` — WITHIN-doc repeat: ``p p r`` at 0 and 3
  (corpus count 2 from one doc), ``p r p`` at 1 and 4, ``r p p`` at 2
  and 5; all 6 grams duplicated, overlapping cover = [0,8) = 8 tokens,
  1 span.
* doc 4: ``u v`` — shorter than k: 0 grams, all-zero row.
* doc 5: ``m n o h i j k l`` — no duplicated grams: zero dup counts.
"""

from __future__ import annotations

from ontoea_spark.operators.dedup import span_dedup_signals

DOCS = [
    (0, "a b c d e f"),
    (1, "a b c x y z"),
    (2, "q q d e f q"),
    (3, "p p r p p r p p"),
    (4, "u v"),
    (5, "m n o h i j k l"),
]

# doc_id -> (n_tokens, n_grams, n_dup_grams, dup_tokens, dup_ppm, n_dup_spans)
EXPECT = {
    0: (6, 4, 2, 6, 1000000, 1),
    1: (6, 4, 1, 3, 500000, 1),
    2: (6, 4, 1, 3, 500000, 1),
    3: (8, 6, 6, 8, 1000000, 1),
    4: (2, 0, 0, 0, 0, 0),
    5: (8, 6, 0, 0, 0, 0),
}


def test_span_dedup_hand_computed(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = {
        r.doc_id: (
            r.n_tokens,
            r.n_grams,
            r.n_dup_grams,
            r.dup_tokens,
            r.dup_ppm,
            r.n_dup_spans,
        )
        for r in span_dedup_signals(docs, k=3).collect()
    }
    assert out == EXPECT


def test_span_dedup_partition_invariant(spark):
    """Interval merge must not depend on physical layout: repartitioned
    input produces identical rows (the window orders by pos per doc)."""
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    a = sorted(map(tuple, span_dedup_signals(docs, k=3).collect()))
    b = sorted(
        map(tuple, span_dedup_signals(docs.repartition(7, "text"), k=3).collect())
    )
    assert a == b


def test_minhash_partial_band_parity(spark):
    """bands that do not divide k form a trailing short band (hf DIV
    rows_per_band semantics) — r6 review: the wide band-key build must
    not drop the trailing hash functions."""
    from pyspark.sql import functions as F

    from ontoea_spark.functions.hashing import MINHASH_PARAMS
    from ontoea_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w v u")],
        "doc_id long, text string",
    )
    bands = 5
    k = len(MINHASH_PARAMS)
    r = k // bands
    # reference construction straight from the long signature shape
    sigs = minhash_signatures(docs)
    banded = (
        sigs.withColumn("band", F.expr(f"hf DIV {r}"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("hf", "minhash"))),
                    lambda s: s.minhash.cast("string"),
                ),
            ).alias("band_key")
        )
    )
    a = banded.select(F.col("id").alias("id1"), "band", "band_key")
    b = banded.select(F.col("id").alias("id2"), "band", "band_key")
    expect = sorted(
        tuple(x)
        for x in a.join(b, ["band", "band_key"])
        .filter("id1 < id2")
        .groupBy("id1", "id2")
        .agg(F.count("*").cast("long").alias("n_bands"))
        .collect()
    )
    got = sorted(tuple(x) for x in minhash_lsh_pairs(docs, bands=bands).collect())
    assert got == expect and len(got) >= 1
