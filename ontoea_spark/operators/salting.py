"""Explicit skew salting for hub-entity joins (BASELINE.json north rule:
"salted repartitioning for skewed hub entities").

Web-scale KGs are scale-free: a handful of hub entities carry a huge
share of triples, so an equi-join keyed on entity funnels those rows
into single reducer tasks. AQE's skew-join split handles *sort-merge*
cases adaptively; this module is the explicit, deterministic variant
that also covers aggregations and works regardless of join strategy:

* :func:`salted_join` — replicate the small/dim side ``n_salts`` times,
  scatter the fact side by a deterministic hash salt, join on
  (key, salt). Result rows are identical to the unsalted join; the skew
  key's rows spread over ``n_salts`` tasks.
* :func:`salted_count` — two-stage aggregation through a salted
  partial: groupBy (key, salt) -> partial counts -> final groupBy key.
  (Spark's hash aggregate already does map-side partials; the explicit
  form matters when the *reduce* keys themselves are too hot, e.g.
  count-distinct-like states.)

Salts are ``pmod(portable_hash64(row-identity), n_salts)`` — no RNG, so
results and partitioning are reproducible run-to-run.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoea_spark.functions.hashing import portable_hash64


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` (skewed on ``key``) with ``dim`` by replicating dim
    across ``n_salts`` salt values. ``salt_src``: column whose hash
    scatters fact rows (defaults to the whole-row-ish first non-key
    column; pass an id column for stability).

    Returns the same rows as ``fact.join(dim, key, how)`` with fact
    columns first. ``how`` is restricted to inner/left/left_semi/
    left_anti: replicating dim ``n_salts``x would duplicate every
    *unmatched* dim row under right/full outer joins, silently changing
    results — those variants raise.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, not "
            f"{how!r}: the dim side is replicated {n_salts}x, so outer "
            f"joins would emit each unmatched dim row {n_salts} times"
        )
    src = salt_src or [c for c in fact.columns if c != key][0]
    fact_s = fact.withColumn(
        "__salt", F.pmod(portable_hash64(F.col(src).cast("string")), F.lit(n_salts))
    )
    salts = (
        dim.sparkSession.range(n_salts)
        .select(F.col("id").cast("long").alias("__salt"))
    )
    dim_r = dim.crossJoin(F.broadcast(salts))
    out = fact_s.join(dim_r, [key, "__salt"], how)
    return out.drop("__salt")


def suggest_n_salts(
    df: DataFrame,
    key_col: str,
    n_partitions: int,
    max_salts: int = 64,
    d: int = 16,
) -> int:
    """Size the salt count from ONE sketch pass instead of guessing.

    A global AMS F₂ aggregate over the join key (operators/sketches.py
    has the keyed form; here it's a plain ``df.agg`` — partial sign-sums
    per partition, one d-long final row) upper-bounds the hottest key's
    row count by ``sqrt(F₂)`` (since ``f_max² ≤ Σ f(v)² = F₂``), then
    spreads that mass over tasks of target size ``n / n_partitions``::

        n_salts = clamp(ceil(sqrt(F₂_est) / (n / P)), 1, max_salts)

    Uniform data (K distinct keys): sqrt(F₂) = n/√K « n/P whenever
    K » P², so the suggestion is 1 — no pointless salting. One hub
    holding α·n rows: sqrt(F₂) ≈ α·n, suggestion ≈ α·P — the hub's rows
    spread to roughly perfect balance. Mass spread over a few medium
    keys over-salts (the bound is loose there) — conservative by
    design; the cost of a few extra salts is a small dim-side
    replication, the cost of under-salting is a straggler task. One
    pass, d longs of state, deterministic (fixed ±1 hash family)."""
    from ontoea_spark.operators.sketches import _sign_cols

    # NULL join keys never match — ignore them (also keeps the sums
    # non-NULL: an all-NULL key column otherwise sums to NULL)
    keyed = df.filter(F.col(key_col).isNotNull())
    h = portable_hash64(F.col(key_col).cast("string"))
    signs = _sign_cols(h, d)  # raises ValueError on d out of range
    row = keyed.select(
        *[s.alias(f"__s{i}") for i, s in enumerate(signs)]
    ).agg(
        F.count("*").alias("__n"),
        *[F.sum(f"__s{i}").alias(f"__z{i}") for i in range(d)],
    ).first()
    n = row["__n"]
    if not n:
        return 1
    f2 = sum(row[f"__z{i}"] ** 2 for i in range(d)) / d
    f_max_bound = math.sqrt(max(f2, 0.0))
    target = max(n / max(n_partitions, 1), 1.0)
    return int(min(max_salts, max(1, math.ceil(f_max_bound / target))))


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """Two-stage count by ``key`` through a salted partial aggregate.
    Output: DataFrame[<key>, n: bigint] — identical to
    ``df.groupBy(key).count()``.

    The salt hashes the whole row identity (all columns concatenated),
    keeping the module's no-RNG determinism promise: the same input
    produces the same partial-aggregate partitioning run-to-run and
    under task retries."""
    salted = df.withColumn(
        "__salt",
        F.pmod(
            portable_hash64(
                F.concat_ws("", *[F.col(c).cast("string") for c in df.columns])
            ),
            F.lit(n_salts),
        ),
    )
    partial = salted.groupBy(key, "__salt").agg(F.count("*").alias("pc"))
    return partial.groupBy(key).agg(F.sum("pc").cast("long").alias("n"))
