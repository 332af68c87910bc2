"""Distributed k-means (Lloyd's) for the IVF coarse quantizer —
deterministic end to end (hash-ordered init, struct-ordered argmin
tie-break, fixed iteration count; never rand()).

Per iteration: one broadcast of the k x dim centroid table, one
JVM-expression distance argmin over the corpus, one groupBy(cid, dim)
mean — all combiner-friendly; the only driver traffic is the k x dim
centroid matrix itself (which must be broadcast next round anyway).
Feeds :func:`ontoea_spark.operators.simjoin.ivf_topk_join`.

Golden-tested against an independent NumPy Lloyd's transcription
(tests/test_kmeans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontoea_spark.functions.hashing import portable_hash64


def _d2(vec_col: str, cvec_col: str):
    return F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col(cvec_col).cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_init(
    emb: DataFrame, k: int, id_col: str = "id", vec_col: str = "vec"
) -> DataFrame:
    """Deterministic seeds: the k vectors with the smallest portable
    hash of their id (a reproducible pseudo-random sample)."""
    seeds = (
        emb.select(
            F.col(id_col).cast("long").alias("sid"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
            portable_hash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h", "sid")
        .limit(k)
    )
    w_rows = seeds.collect()
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(i, list(r.cvec)) for i, r in enumerate(w_rows)],
        "cid long, cvec array<double>",
    )


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """Nearest-centroid assignment DataFrame[id, vec, cid] — broadcast
    centroids, argmin by (d2, cid) struct order (deterministic ties)."""
    j = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).crossJoin(F.broadcast(centroids))
    scored = j.withColumn("d2", F.round(_d2("vec", "cvec"), 12))
    best = scored.groupBy("id").agg(
        F.min(F.struct("d2", "cid")).alias("b"), F.first("vec").alias("vec")
    )
    return best.select("id", "vec", F.col("b.cid").alias("cid"))


def kmeans_fit(
    emb: DataFrame,
    k: int,
    n_iter: int = 10,
    id_col: str = "id",
    vec_col: str = "vec",
    round_to: int | None = None,
) -> DataFrame:
    """Fixed-iteration Lloyd's. Returns DataFrame[cid, cvec] (a centroid
    with no members keeps its previous position).

    ``round_to``: optionally round each updated centroid coordinate to
    this many decimals per iteration. Lloyd's means are
    order-of-summation sensitive in the last ulp (partial aggregation
    order is nondeterministic), so rounding pins the centroids to
    values any engine reproduces exactly — what makes the trained
    quantizer DuckDB-oracle-checkable (driver query
    ``ann_ivf_kmeans_top1`` uses round_to=9)."""
    spark: SparkSession = emb.sparkSession
    centroids = kmeans_init(emb, k, id_col, vec_col)
    m_expr = F.avg("val") if round_to is None else F.round(F.avg("val"), round_to)
    for _ in range(n_iter):
        assigned = assign_cells(emb, centroids, id_col, vec_col)
        means = (
            assigned.select("cid", F.posexplode("vec").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(m_expr.alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.m,
                ).alias("cvec")
            )
        )
        new_rows = {r.cid: list(r.cvec) for r in means.collect()}
        old_rows = {r.cid: list(r.cvec) for r in centroids.collect()}
        centroids = spark.createDataFrame(
            [
                (cid, new_rows.get(cid, old_rows[cid]))
                for cid in sorted(old_rows)
            ],
            "cid long, cvec array<double>",
        )
    return centroids
