"""Class-compatibility scoring v1–v6 (SURVEY.md §2.9 G4/G5; reference
``check.py:103-343``) as JVM-side array expressions over a class-pair
cross join.

The reference builds a dense ``[n_onto, n_onto]`` NumPy matrix with an
O(n²) Python loop (``check.py:56-100``). Classes number in the hundreds,
so the pair table here is tiny — but the expressions stay whole-stage
codegen'd (no Python), and the same column expressions could score
billions of pairs if they had to.

Path convention: ``path = [cls, parent, ..., root]`` (tree.py). With a
single-parent tree, two classes are *equal* iff same leaf, which the
reference tests as ``aLen == bLen and aParent[0] == bParent[0]``.

Out-of-bounds array access uses ``F.get`` (0-based, NULL when OOB) —
safe under ANSI mode, matching DuckDB's NULL-on-OOB list indexing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ontoea_spark.ontology.tree import THING_URI


def _is_thing(c: Column) -> Column:
    # reference is_thing (check.py:19-22) is substring containment
    return c.contains(THING_URI)


def _disjoint(pa, pb, da, db) -> Column:
    return F.arrays_overlap(da, pb) | F.arrays_overlap(db, pa)


def _suffix_len(pa: Column, pb: Column) -> Column:
    """Length of the longest common *suffix* of two paths (the reference's
    back-to-front walk, check.py:134-139)."""
    mism = F.transform(
        F.sequence(F.lit(1), F.least(F.size(pa), F.size(pb))),
        lambda i: F.get(pa, F.size(pa) - i) != F.get(pb, F.size(pb) - i),
    )
    pos = F.array_position(mism, F.lit(True))
    return F.when(pos == 0, F.least(F.size(pa), F.size(pb))).otherwise(pos - 1)


def _v1(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    al, bl = F.size(pa), F.size(pb)
    both_thing = (al == 1) & (bl == 1) & (F.get(pa, 0) == THING_URI)
    eq_len = F.when(
        (F.get(pa, 0) == F.get(pb, 0)) & ~_is_thing(F.get(pa, 0)), 1.0
    ).otherwise(0.0)
    a_longer = F.when(
        (F.get(pa, al - bl) == F.get(pb, 0)) & ~_is_thing(F.get(pb, 0)), 1.0
    ).otherwise(0.0)
    b_longer = F.when(
        (F.get(pb, bl - al) == F.get(pa, 0)) & ~_is_thing(F.get(pa, 0)), 1.0
    ).otherwise(0.0)
    return (
        F.when(both_thing, 0.5)
        .when(al == bl, eq_len)
        .when(al > bl, a_longer)
        .otherwise(b_longer)
    )


def _v2(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    al, bl = F.size(pa), F.size(pb)
    both_thing = (al == 1) & (bl == 1) & (F.get(pa, 0) == THING_URI)
    sl = _suffix_len(pa, pb)
    containment = (sl == al) | (sl == bl)
    cont_flag = (
        F.when((sl == al) & (F.get(pa, 0) == THING_URI), F.lit(unsure_w))
        .when((sl == bl) & (F.get(pb, 0) == THING_URI), F.lit(unsure_w))
        .otherwise(1.0)
    )
    # first element of the common suffix (aParent[start1+1], check.py:149);
    # sl == 0 (no shared root) is undefined in the reference (IndexError) —
    # scored -1 here.
    common_head = F.get(pa, al - sl)
    sibling_flag = F.when(
        (sl == 0) | (common_head == THING_URI), -1.0
    ).otherwise(1.0)
    return (
        F.when(_disjoint(pa, pb, da, db), -1.0)
        .when(both_thing, F.lit(unsure_w))
        .when(containment, cont_flag)
        .otherwise(sibling_flag)
    )


def _v3(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    al, bl = F.size(pa), F.size(pb)
    eq_len = (
        F.when(F.get(pa, 0) == F.get(pb, 0), 1.0)
        .when(
            (F.get(pa, 1) == F.get(pb, 1)) & ~_is_thing(F.get(pa, 1)), 1.0
        )
        .otherwise(0.0)
    )
    a_longer = F.when(
        (F.get(pa, al - bl) == F.get(pb, 0)) & ~_is_thing(F.get(pb, 0)), 1.0
    ).otherwise(0.0)
    b_longer = F.when(
        (F.get(pb, bl - al) == F.get(pa, 0)) & ~_is_thing(F.get(pa, 0)), 1.0
    ).otherwise(0.0)
    return (
        F.when(al == bl, eq_len).when(al > bl, a_longer).otherwise(b_longer)
    )


def _v4(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    return F.when(c1 == c2, 1.0).otherwise(0.0)


def _v5(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    inter = F.size(F.array_intersect(pa, pb)).cast("double")
    score = (2 * inter + k) / (
        (F.size(pa) + F.size(pb)).cast("double") + k
    )
    return (
        F.when(_disjoint(pa, pb, da, db), 0.0)
        .when(c1 == c2, 1.0)
        .otherwise(score)
    )


def _v6(c1, c2, pa, pb, da, db, k, unsure_w) -> Column:
    inter = F.size(F.array_intersect(pa, pb)).cast("double")
    score = (inter + k) / (
        F.greatest(F.size(pa), F.size(pb)).cast("double") + k
    )
    return (
        F.when(_disjoint(pa, pb, da, db), 0.0)
        .when(c1 == c2, 1.0)
        .otherwise(score)
    )


_VERSIONS = {1: _v1, 2: _v2, 3: _v3, 4: _v4, 5: _v5, 6: _v6}


def compat_pairs(
    paths_with_disj: DataFrame,
    version: int = 5,
    k: float = 0.0,
    unsure_w: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """All-pairs class-compatibility table — the relational form of the
    reference's conflict matrix ``check_type_coherence`` (check.py:56-100;
    default config uses v5, ``ontoea_args_15K.json`` check_version=4 which
    selects check_type_v5 at check.py:81-83).

    Input: DataFrame[cls, path, disj] from
    :func:`ontoea_spark.ontology.tree.disjoint_targets`.
    Output: DataFrame[c1, c2, score: double].
    """
    fn = _VERSIONS[version]
    a = paths_with_disj.select(
        F.col("cls").alias("c1"),
        F.col("path").alias("pa"),
        F.col("disj").alias("da"),
    )
    b = paths_with_disj.select(
        F.col("cls").alias("c2"),
        F.col("path").alias("pb"),
        F.col("disj").alias("db"),
    )
    score = fn(
        F.col("c1"), F.col("c2"), F.col("pa"), F.col("pb"),
        F.col("da"), F.col("db"), F.lit(float(k)), float(unsure_w),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "c1", "c2", F.round(score.cast("double"), round_to).alias("score")
    )


def score_pairs(
    pairs: DataFrame,
    paths_with_disj: DataFrame,
    version: int = 5,
    k: float = 0.0,
    unsure_w: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Compatibility score for an explicit (c1, c2) pair table (instead
    of the all-pairs cross join) — the J7/J11 lookup shape. Returns the
    input columns + ``score``."""
    fn = _VERSIONS[version]
    a = paths_with_disj.select(
        F.col("cls").alias("c1"), F.col("path").alias("pa"), F.col("disj").alias("da")
    )
    b = paths_with_disj.select(
        F.col("cls").alias("c2"), F.col("path").alias("pb"), F.col("disj").alias("db")
    )
    score = fn(
        F.col("c1"), F.col("c2"), F.col("pa"), F.col("pb"),
        F.col("da"), F.col("db"), F.lit(float(k)), float(unsure_w),
    )
    return (
        pairs.join(F.broadcast(a), "c1")
        .join(F.broadcast(b), "c2")
        .withColumn("score", F.round(score.cast("double"), round_to))
        .drop("pa", "pb", "da", "db")
    )


def calibrate_seed_pairs(
    compat: DataFrame, seed_class_pairs: DataFrame
) -> DataFrame:
    """Seed calibration (kgs.py:288-307 / G6): force score=1 for every
    class pair observed on a training alignment link (both directions).

    seed_class_pairs: DataFrame[c1, c2].
    """
    seeds = (
        seed_class_pairs.select("c1", "c2")
        .union(
            seed_class_pairs.select(
                F.col("c2").alias("c1"), F.col("c1").alias("c2")
            )
        )
        .distinct()
        .withColumn("is_seed", F.lit(True))
    )
    return (
        compat.join(F.broadcast(seeds), ["c1", "c2"], "left")
        .select(
            "c1",
            "c2",
            F.when(F.col("is_seed"), 1.0).otherwise(F.col("score")).alias("score"),
        )
    )
