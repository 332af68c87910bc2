"""Deterministic frequency-ordered dictionary encoding (SURVEY.md §2.3).

Reproduces the reference's id-assignment semantics relationally:

* D1 ``sort_elements`` (read.py:14-26): count each element's occurrences
  across the triple positions it may fill, order by (freq desc, uri desc)
  — the tie-break makes ids deterministic.
* D2 ``generate_mapping_id`` (read.py:64-96): interleave the two ranked
  KGs — KG1 rank-i -> 2i, KG2 rank-i -> 2i+1 for i < min(n1, n2); the
  longer KG's tail continues sequentially at 2*min(n1, n2).
* D3 ``generate_mapping_id_oneKG`` (read.py:99-117): rank -> id.
* D5-D7 ``uris_*_2ids`` (read.py:120-163): dictionary joins; the entity
  dictionary is broadcast (per-KG vocab ≪ triples at web scale: the
  dictionary is |entities|, triples are |mentions|).

Scale notes: the only shuffles are the groupBy count and the global
row_number. The global rank is a single-partition window by necessity
(ids are globally dense); at 100 TB the dictionary itself is still only
|distinct entities| rows after the distributed count, and if that
outgrows one partition the two-phase variant (partition ranks + offset
by cumulative partition counts) drops in without changing the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def element_frequencies(
    triples: DataFrame, roles: tuple[str, ...] = ("s", "o")
) -> DataFrame:
    """D1 counting half: occurrences of each element over the given triple
    positions. roles ('s','o') counts entities, ('p',) counts relations.

    Returns DataFrame[elem: string, freq: bigint].
    """
    parts = [triples.select(F.col(r).alias("elem")) for r in roles]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionAll(p)
    return unioned.groupBy("elem").agg(F.count("*").alias("freq"))


def ranked_elements(
    triples: DataFrame,
    roles: tuple[str, ...] = ("s", "o"),
    range_partitions: int = 32,
) -> DataFrame:
    """D1: rank elements by (freq desc, elem desc); rank is 0-based.

    Scalable exact global rank — two-phase instead of a single-partition
    window (which would funnel the whole dictionary through one task):

      1. ``repartitionByRange`` on the sort key: partition i holds keys
         strictly above partition i+1 (keys are unique: elem is distinct);
      2. ``row_number`` *within* each range partition (parallel);
      3. global rank = local rank + cumulative count of earlier
         partitions (a window over ``range_partitions`` rows — trivial).

    The rank values are independent of where the sampled range bounds
    land; the partitioned frame is cached so the pid column is consistent
    across the two branches that consume it.

    Returns DataFrame[elem, freq, rank].
    """
    freqs = element_frequencies(triples, roles)
    part = freqs.repartitionByRange(
        range_partitions, F.desc("freq"), F.desc("elem")
    ).withColumn("pid", F.spark_partition_id())
    part = part.cache()
    wl = Window.partitionBy("pid").orderBy(F.desc("freq"), F.desc("elem"))
    local = part.withColumn("lrank", F.row_number().over(wl))
    counts = part.groupBy("pid").agg(F.count("*").alias("cnt"))
    woff = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(woff), F.lit(0))
    ).select("pid", "off")
    return local.join(F.broadcast(offsets), "pid").select(
        "elem",
        "freq",
        (F.col("off") + F.col("lrank") - 1).cast("long").alias("rank"),
    )


def single_kg_ids(
    triples: DataFrame, roles: tuple[str, ...] = ("s", "o")
) -> DataFrame:
    """D3: one-KG dictionary, id == rank. DataFrame[elem, freq, id]."""
    return ranked_elements(triples, roles).withColumnRenamed("rank", "id")


def interleaved_ids(
    triples1: DataFrame,
    triples2: DataFrame,
    roles: tuple[str, ...] = ("s", "o"),
) -> DataFrame:
    """D2: interleaved two-KG id assignment (read.py:72-83 semantics).

    Returns DataFrame[kg: bigint (1|2), elem: string, freq, rank, id].
    Stays lazy: the n1/n2 scalars join in via a broadcast 1-row aggregate
    instead of driver-side count() actions.
    """
    r1 = ranked_elements(triples1, roles).withColumn("kg", F.lit(1).cast("long"))
    r2 = ranked_elements(triples2, roles).withColumn("kg", F.lit(2).cast("long"))
    n1 = r1.agg(F.count("*").alias("n_other")).withColumn("kg", F.lit(2).cast("long"))
    n2 = r2.agg(F.count("*").alias("n_other")).withColumn("kg", F.lit(1).cast("long"))
    both = r1.unionByName(r2)
    sizes = n1.unionByName(n2)
    joined = both.join(F.broadcast(sizes), "kg")
    # rank < n_other: interleave (2*rank + kg-1); else: tail at 2*n_other
    ident = F.when(
        F.col("rank") < F.col("n_other"),
        F.lit(2) * F.col("rank") + (F.col("kg") - F.lit(1)),
    ).otherwise(F.lit(2) * F.col("n_other") + (F.col("rank") - F.col("n_other")))
    return joined.select(
        "kg", "elem", "freq", "rank", ident.cast("long").alias("id")
    )


def encode_triples(
    triples: DataFrame, ent_ids: DataFrame, rel_ids: DataFrame
) -> DataFrame:
    """D5: (s,p,o) -> (s_id, p_id, o_id) via three broadcast dictionary
    joins. Inner-join semantics: rows whose element is missing from the
    dictionary drop silently (reference read.py:141-149 asserts full
    coverage instead; use :func:`encode_coverage` to assert/meter).

    Returns DataFrame[s_id, p_id, o_id] (bigint).
    """
    e = ent_ids.select("elem", "id")
    r = rel_ids.select("elem", "id")
    return (
        triples.join(
            F.broadcast(e.withColumnRenamed("elem", "s").withColumnRenamed("id", "s_id")),
            "s",
        )
        .join(
            F.broadcast(r.withColumnRenamed("elem", "p").withColumnRenamed("id", "p_id")),
            "p",
        )
        .join(
            F.broadcast(e.withColumnRenamed("elem", "o").withColumnRenamed("id", "o_id")),
            "o",
        )
        .select("s_id", "p_id", "o_id")
    )


def encode_pairs(
    pairs: DataFrame, ids1: DataFrame, ids2: DataFrame
) -> DataFrame:
    """D6 (uris_pair_2ids, read.py:129-138): pairs with either side missing
    from its dictionary are silently dropped (inner-join semantics — the
    reference does the same with an `if in` filter)."""
    return (
        pairs.join(
            F.broadcast(
                ids1.select(F.col("elem").alias("e1"), F.col("id").alias("id1"))
            ),
            "e1",
        )
        .join(
            F.broadcast(
                ids2.select(F.col("elem").alias("e2"), F.col("id").alias("id2"))
            ),
            "e2",
        )
        .select("id1", "id2")
    )


def encode_attribute_triples(
    attr_triples: DataFrame, ent_ids: DataFrame, attr_ids: DataFrame
) -> DataFrame:
    """D7 (read.py:152-163): heads without an entity id drop silently;
    the literal passes through unchanged."""
    return (
        attr_triples.join(
            F.broadcast(
                ent_ids.select(F.col("elem").alias("e"), F.col("id").alias("e_id"))
            ),
            "e",
        )
        .join(
            F.broadcast(
                attr_ids.select(F.col("elem").alias("a"), F.col("id").alias("a_id"))
            ),
            "a",
        )
        .select("e_id", "a_id", "v")
    )
