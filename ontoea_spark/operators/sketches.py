"""Mergeable profiling sketches: KMV (bottom-k) distinct/overlap, count-min.

At 10^12 documents, exact ``COUNT(DISTINCT ...)`` over every profiling
dimension is unaffordable, and this engine's own scale machinery needs
cardinality and heavy-hitter estimates as *inputs* before exact numbers
exist: the broadcast size gates (operators/dictionary.py,
pipeline/incremental.py) decide on a count, and the salted-join path
(operators/salting.py) wants to know the hot keys. These sketches are the
one-pass, mergeable way to get those numbers from a 100 TB scan.

Both sketches are **deterministic**, built on the portable md5-derived
hash family (functions/hashing.py), so the same bytes produce the same
sketch in Spark and in the DuckDB oracles — unlike Spark's built-in
``approx_count_distinct`` (HyperLogLog++, engine-private registers) which
can never be hash-checked cross-engine.

KMV / bottom-k (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07):
keep the k smallest *distinct* hash values per group. With hashes uniform
on [0, M): ``est_distinct = (k-1) * M / h_(k)`` once the sketch is full,
exact below k. Sketches form a semilattice — ``merge = k smallest of the
union`` — so partial sketches from any partitioning of the data merge to
exactly the sketch of the whole (asserted bit-for-bit in tests), and the
same sketches estimate set overlap: the k smallest of minima(A) ∪
minima(B) are exactly the k smallest of A ∪ B, so
``|bottom_k(A∪B) ∩ minima(A) ∩ minima(B)| / |bottom_k(A∪B)|`` estimates
Jaccard(A, B).

Count-min (Cormode & Muthukrishnan, J.Alg'05): a d×w counter matrix,
``cell(i, h_i(x) mod w) += 1``; point frequency estimate is
``min_i cell(i, h_i(x))`` — always ≥ the true count, with the error
bounded by the sum of colliding keys. Purely additive, so Spark's
partial aggregation (map-side combine) *is* the sketch merge, and the
materialized size is bounded at d·w rows no matter the input.

Reference parity note: the reference profiles its KGs with exact
single-machine dict passes (``sort_elements``, reference
code/src/openea/modules/load/read.py:14-26 — a Python dict of
per-element counts); these sketches are the rebuild-only at-scale
analogue of those passes, for the regime where the dict no longer fits
one machine.

Scale shape:
- ``kmv_sketch`` is ONE shuffle: ``dense_rank() <= k`` over a window on
  the group key lets Spark 4's ``InferWindowGroupLimit`` keep only k
  distinct hash values per group *per map task* before the exchange
  (plan-asserted in tests/test_sketches.py), and the following
  ``collect_set`` groupBy reuses the window's partitioning — no second
  exchange, no unbounded collect state.
- ``cms_sketch`` is ONE shuffle whose output is ≤ d·w rows regardless of
  input size; the per-partition partial-agg state is bounded the same way.
- pairwise overlap is a P² op over *sketches* (k longs per group), for
  low-cardinality profiling keys (predicates, languages, sources); the
  corpus is only touched by the sketch pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ontoea_spark.functions.hashing import (
    MINHASH_PARAMS,
    portable_hash64,
    minhash_expr,
)

# Hash space size of portable_hash64: 60 bits. Exactly representable as a
# double (1 significant bit), as is (k-1)*M for k-1 < 2^52.
HASH_SPACE = float(1 << 60)

# Static gate for broadcasting a count-min table into the estimate join:
# the CMS has AT MOST d*w rows by construction, so the decision needs no
# runtime count() — unlike the corpus-growing frames gated elsewhere.
CMS_BROADCAST_MAX_CELLS = 1_000_000


def _hash_value(value_col: str) -> Column:
    """Portable 60-bit hash of any column, via its canonical string form
    (both engines cast BIGINT/VARCHAR identically). NULL values hash to
    NULL — every sketch below filters them out explicitly: a NULL is not
    a value, and letting it through breaks the invariants (it consumes a
    dense_rank slot then vanishes from collect_set, truncating a KMV to
    k-1; it accumulates CMS mass in a NULL cell no lookup can reach,
    underestimating — and Spark orders NULLs first while DuckDB orders
    them last, so cross-engine parity dies too)."""
    return portable_hash64(F.col(value_col).cast("string"))


def _sign_cols(hcol: Column, d: int) -> list[Column]:
    """The ±1 AMS sign family over a pre-hashed value (parity bit of the
    d MinHash family members) — shared by ams_f2_sketch and the salting
    suggestion so the two can never drift apart."""
    if not 1 <= d <= len(MINHASH_PARAMS):
        raise ValueError(f"d must be in [1, {len(MINHASH_PARAMS)}]")
    return [
        (F.lit(1) - F.lit(2) * (minhash_expr(hcol, a, b) % 2)).cast("long")
        for (a, b) in MINHASH_PARAMS[:d]
    ]


def kmv_sketch(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 64,
    pre_distinct: bool = False,
) -> DataFrame:
    """Per-key KMV sketch: the k smallest distinct hash values of
    ``value_col``, as a sorted array. Returns ``[*key_cols, minima]``.

    ``dense_rank`` (not row_number over a pre-distinct) handles duplicate
    values in one pass: equal hashes share a rank, so ``rank <= k`` keeps
    exactly the k smallest *distinct* hashes, and the optimizer's
    WindowGroupLimit bounds per-task state to k *ranks* before the
    shuffle — ONE exchange total.

    That bound is on ranks, not rows: every duplicate of a surviving
    value shares its rank and passes through. When single (key, value)
    pairs repeat millions of times (recrawled hot URLs), set
    ``pre_distinct=True``: a ``groupBy(key, hash)`` dedups with map-side
    partial aggregation FIRST, so the heavy duplication collapses inside
    each map task and only distinct pairs ever shuffle — a second (small)
    exchange buys a bounded first one. Same result bit-for-bit (asserted
    in tests); pick by duplication profile.
    """
    hashed = df.select(*key_cols, _hash_value(value_col).alias("__h")).filter(
        F.col("__h").isNotNull()
    )
    if pre_distinct:
        # compiles to an Aggregate -> partial (map-side) dedup per task
        hashed = hashed.dropDuplicates()
    w = Window.partitionBy(*key_cols).orderBy("__h")
    ranked = hashed.withColumn("__r", F.dense_rank().over(w)).filter(
        F.col("__r") <= k
    )
    # the groupBy key equals the window partitioning -> no second exchange
    return ranked.groupBy(*key_cols).agg(
        F.array_sort(F.collect_set("__h")).alias("minima")
    )


def kmv_sketch_global(
    df: DataFrame, value_col: str, k: int = 64, n_buckets: int = 256
) -> DataFrame:
    """Whole-corpus (un-keyed) KMV sketch as a single ``[minima]`` row.

    The naive form — ``kmv_sketch`` with an empty key — would put the
    entire corpus through ONE window partition (the single-partition
    WindowExec scale killer). Instead: bucket rows by ``hash mod
    n_buckets`` so the bottom-k runs per bucket in parallel (same
    WindowGroupLimit-bounded shape), then merge the ≤ n_buckets·k
    surviving minima in one tiny final aggregate — correct because each
    global minimum is also a minimum of its own bucket (the semilattice
    merge again). Feed the result to :func:`kmv_estimate`."""
    w = Window.partitionBy("__b").orderBy("__h")
    ranked = (
        df.select(_hash_value(value_col).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .withColumn("__b", F.pmod("__h", F.lit(n_buckets)))
        .withColumn("__r", F.dense_rank().over(w))
        .filter(F.col("__r") <= k)
    )
    parts = ranked.groupBy("__b").agg(
        F.collect_set("__h").alias("part")
    )
    return parts.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("part")))),
            1,
            k,
        ).alias("minima")
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Distinct-count estimate from a KMV sketch: exact (= |minima|) while
    the sketch is not full, else ``(k-1) * M / h_(k)``. Returns
    ``[*keys, n_minima, est_distinct]``."""
    size = F.size("minima")
    kth = F.element_at("minima", k).cast("double")
    est = F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / kth
    )
    return sketch.select(
        *[c for c in sketch.columns if c != "minima"],
        size.cast("int").alias("n_minima"),
        F.round(est).cast("long").alias("est_distinct"),
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, key_cols: list[str], k: int
) -> DataFrame:
    """Merge two KMV sketch tables: per key, the k smallest of the union
    of their minima. Exactly ``kmv_sketch`` of the concatenated inputs
    (semilattice — asserted bit-for-bit in tests), so shard-level sketches
    roll up without touching the shards again."""
    empty = F.array().cast("array<long>")
    a2 = a.select(*key_cols, F.col("minima").alias("__ma"))
    b2 = b.select(*key_cols, F.col("minima").alias("__mb"))
    j = a2.join(b2, on=list(key_cols), how="full_outer")
    merged = F.slice(
        F.array_sort(
            F.array_union(
                F.coalesce("__ma", empty), F.coalesce("__mb", empty)
            )
        ),
        1,
        k,
    )
    return j.select(*key_cols, merged.alias("minima"))


def kmv_pairwise_jaccard(
    sketch: DataFrame, key_col: str, k: int
) -> DataFrame:
    """Estimated Jaccard overlap between every pair of groups, from their
    KMV sketches alone (Beyer et al. SIGMOD'07): restrict to the k
    smallest hashes of the pair's union (== k smallest of A∪B), count how
    many sit in both sketches. Exact while both sets fit the sketch.

    Returns ``[<key>_a, <key>_b, k_used, inter_k, jaccard_est]`` for
    key_a < key_b. P² pairs over k-long arrays: a profiling op for
    low-cardinality keys — the corpus was only touched by the sketch."""
    a = sketch.select(
        F.col(key_col).alias(f"{key_col}_a"), F.col("minima").alias("__ma")
    )
    b = sketch.select(
        F.col(key_col).alias(f"{key_col}_b"), F.col("minima").alias("__mb")
    )
    pairs = a.join(b, F.col(f"{key_col}_a") < F.col(f"{key_col}_b"))
    union_k = F.slice(F.array_sort(F.array_union("__ma", "__mb")), 1, k)
    inter = F.array_intersect(
        union_k, F.array_intersect("__ma", "__mb")
    )
    return pairs.select(
        f"{key_col}_a",
        f"{key_col}_b",
        F.size(union_k).cast("int").alias("k_used"),
        F.size(inter).cast("int").alias("inter_k"),
        F.round(F.size(inter) / F.size(union_k), 6).alias("jaccard_est"),
    )


def ams_f2_sketch(
    df: DataFrame, key_cols: list[str], value_col: str, d: int = 8
) -> DataFrame:
    """AMS sketch of the second frequency moment (Alon-Matias-Szegedy,
    STOC'96): per key, ``z_i = Σ_rows sign_i(value)`` for d independent
    ±1 hash functions — each ``z_i²`` is an unbiased estimate of
    ``F₂ = Σ_v f(v)²``, the SELF-JOIN SIZE of the column. F₂ is the
    statistic that predicts an equi-join's output blowup (the
    canonical_two_hop edge self-join costs exactly Σ deg(o)² paths)
    before running it, and the skew diagnostic (F₂/n² → 1 means one hot
    key dominates — the salting trigger).

    Purely additive — the sketch of a union is the elementwise sum, so
    Spark's map-side combine is the merge (monoid, like the CMS) and the
    state is d longs per key. Returns ``[*key_cols, z: array<long>]``.
    """
    signs = _sign_cols(_hash_value(value_col), d)
    sums = [
        F.sum(F.col(f"__s{i}")).cast("long").alias(f"__z{i}")
        for i in range(d)
    ]
    return (
        df.select(
            *key_cols, *[s.alias(f"__s{i}") for i, s in enumerate(signs)]
        )
        .filter(F.col("__s0").isNotNull())  # NULL values are not values
        .groupBy(*key_cols)
        .agg(*sums)
        .select(
            *key_cols,
            F.array(*[F.col(f"__z{i}") for i in range(d)]).alias("z"),
        )
    )


def ams_f2_estimate(sketch: DataFrame) -> DataFrame:
    """F₂ (self-join size) estimate from an AMS sketch: the mean of the
    d squared counters (mean, not the textbook median-of-means — one
    fixed hash family, deterministic, and the cross-engine oracle is a
    plain avg; the estimator variance is what the tests pin). Returns
    ``[*keys, f2_est]`` (double, 6dp)."""
    # square in DOUBLE: a hub key with f_max > ~3e9 rows puts |z| past
    # sqrt(2^63) and a long square overflows exactly where the skew
    # signal matters most; the fixed left-to-right array fold keeps the
    # float sum order-invariant (and the oracle mirrors the same order)
    sq = F.transform("z", lambda v: v.cast("double") * v)
    est = F.aggregate(
        sq, F.lit(0.0), lambda acc, v: acc + v
    ) / F.size("z")
    return sketch.select(
        *[c for c in sketch.columns if c != "z"],
        F.round(est, 6).alias("f2_est"),
    )


def _cms_cols(hcol: Column, d: int, w: int) -> list[Column]:
    if not 1 <= d <= len(MINHASH_PARAMS):
        raise ValueError(f"d must be in [1, {len(MINHASH_PARAMS)}]")
    return [
        (minhash_expr(hcol, a, b) % w).cast("int")
        for (a, b) in MINHASH_PARAMS[:d]
    ]


def cms_sketch(df: DataFrame, value_col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch of ``value_col`` frequencies: ``[row, col, cnt]``
    with row ∈ [0, d), col ∈ [0, w). One shuffle; ≤ d·w output rows and
    bounded partial-agg state regardless of input size — the additive
    merge IS Spark's map-side combine."""
    cells = df.filter(F.col(value_col).isNotNull()).select(
        F.posexplode(F.array(*_cms_cols(_hash_value(value_col), d, w))).alias(
            "row", "col"
        )
    )
    return cells.groupBy("row", "col").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame, values: DataFrame, value_col: str, d: int, w: int
) -> DataFrame:
    """Point frequency estimates for each (distinct) row of ``values``:
    ``min_i cell(i, h_i(x))``, 0-filled for never-seen cells. Always ≥ the
    true count. Returns ``values + est_count``.

    The CMS side is ≤ d·w rows *by construction*, so the broadcast
    decision is static — no runtime count() gate needed."""
    vcells = values.filter(F.col(value_col).isNotNull()).select(
        value_col,
        F.posexplode(
            F.array(*_cms_cols(_hash_value(value_col), d, w))
        ).alias("row", "col"),
    )
    cms_side = F.broadcast(cms) if d * w <= CMS_BROADCAST_MAX_CELLS else cms
    joined = vcells.join(cms_side, ["row", "col"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est_count"
        )
    )
