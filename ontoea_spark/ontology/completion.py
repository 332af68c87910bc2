"""Class completion by relation — the full G8 kernel (SURVEY.md §2.9;
reference: inference.py:193-282 ``find_class_by_relation`` + the T5
min-entropy argmax at inference.py:390-399), distributed.

For each *untyped* head entity e (loc='head' flavour):

  1. tail-class evidence: the classes of e's tail neighbours per
     relation — ``other_ent_type[r]`` (inference.py:216-227);
  2. candidate heads: typed heads h of relation r whose tail's class is
     in that evidence set (inference.py:235-243) — note this makes the
     candidate set *per (e, r)*;
  3. class histogram: frequencies of every class on the candidate
     heads' class paths (inference.py:247-255, A5);
  4. greedy descent from the root: while the current node's observed
     children have top-2 entropy <= threshold, move to the
     highest-frequency child (inference.py:259-271; entropy A6); stop
     node != root becomes the (e, r) prediction with its stop entropy;
  5. per entity: the minimum-entropy prediction across relations (T5),
     tie-broken by class name.

Deviations (documented): the reference's ``max(children_freq,
key=class_freq.get)`` tie-breaks by dict insertion order — here argmax
is (freq desc, cls asc), deterministic. Same for the final T5 argmax.

Scale shape: everything up to the descent is joins + explode +
groupBy; the descent itself is a driver loop of <= tree-depth rounds
over the small per-(e, r) state frame (classes are few; state rows =
candidate (e, r) pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ontoea_spark.ontology.tree import THING_URI


def complete_classes(
    triples: DataFrame,
    cv: DataFrame,
    paths: DataFrame,
    entropy_threshold: float = 0.7,
    max_depth: int = 8,
) -> DataFrame:
    """triples: (s, p, o); cv: (entity, cls) known classes;
    paths: (cls, path) root-ward. Returns DataFrame[entity, cls, entropy]
    — predicted class per previously-untyped head entity.
    """
    heads = triples.select("s").distinct()
    untyped = heads.join(cv, heads.s == cv.entity, "left_anti")

    tcls = cv.select(F.col("entity").alias("t_ent"), F.col("cls").alias("t_cls"))
    hcls = cv.select(F.col("entity").alias("h_ent"), F.col("cls").alias("h_cls"))

    # (1) per (e, r): evidence tail classes
    evidence = (
        triples.join(untyped.select(F.col("s").alias("e")), triples.s == F.col("e"))
        .join(tcls, triples.o == tcls.t_ent)
        .select("e", "p", "t_cls")
        .distinct()
    )
    # (2) candidate typed heads per (e, r): any triple (h, r, t2) with
    # class(t2) in evidence(e, r) and h typed
    ht = (
        triples.join(tcls, triples.o == tcls.t_ent)
        .join(hcls, triples.s == hcls.h_ent)
        .select(F.col("p").alias("p2"), "t_cls", F.col("s").alias("h"), "h_cls")
        .distinct()
    )
    cand = (
        evidence.join(
            ht, (evidence.p == ht.p2) & (evidence.t_cls == ht.t_cls)
        )
        .select("e", "p", "h", "h_cls")
        .distinct()
    )
    # (3) per (e, r): class-path histogram over distinct candidate heads
    hist = (
        cand.join(F.broadcast(paths), cand.h_cls == paths.cls)
        .select("e", "p", F.explode("path").alias("acls"))
        .groupBy("e", "p", "acls")
        .agg(F.count("*").alias("n"))
    )
    # observed tree edges (child -> parent) global (single-parent tree)
    edges = (
        paths.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("path") - 2),
                    lambda i: F.struct(
                        F.get("path", i).alias("child"),
                        F.get("path", i + 1).alias("parent"),
                    ),
                )
            ).alias("x")
        )
        .select("x.child", "x.parent")
        .filter(F.col("parent").isNotNull())
        .distinct()
    )
    # children with freqs per (e, p, parent)
    ch = hist.join(F.broadcast(edges), hist.acls == edges.child).select(
        "e", "p", "parent", F.col("acls").alias("child"), "n"
    )
    wrk = Window.partitionBy("e", "p", "parent").orderBy(
        F.desc("n"), F.asc("child")
    )
    ranked = (
        ch.withColumn("rn", F.row_number().over(wrk))
        .withColumn("nch", F.count("*").over(Window.partitionBy("e", "p", "parent")))
    )
    top2 = ranked.filter("rn <= 2").groupBy("e", "p", "parent").agg(
        F.max(F.when(F.col("rn") == 1, F.col("n"))).alias("f1"),
        F.max(F.when(F.col("rn") == 2, F.col("n"))).alias("f2"),
        F.max(F.when(F.col("rn") == 1, F.col("child"))).alias("best_child"),
        F.max("nch").alias("nch"),
    )
    p1 = F.col("f1") / (F.col("f1") + F.col("f2"))
    p2c = F.col("f2") / (F.col("f1") + F.col("f2"))
    ent_expr = F.when(F.col("nch") == 1, 0.0).otherwise(
        -(p1 * F.log2(p1)) - (p2c * F.log2(p2c))
    )
    steps = top2.select(
        "e", "p", "parent", "best_child", ent_expr.alias("entropy")
    ).cache()

    # (4) greedy descent: driver loop over the small state frame
    state = (
        steps.select("e", "p").distinct()
        .select("e", "p", F.lit(THING_URI).alias("node"), F.lit(0.0).alias("entropy"))
    )
    for _ in range(max_depth):
        nxt = state.join(
            steps.select(
                F.col("e").alias("se"), F.col("p").alias("sp"),
                F.col("parent"), F.col("best_child"),
                F.col("entropy").alias("step_entropy"),
            ),
            (F.col("e") == F.col("se"))
            & (F.col("p") == F.col("sp"))
            & (F.col("node") == F.col("parent")),
            "left",
        ).select(
            "e",
            "p",
            F.when(
                F.col("parent").isNotNull()
                & (F.col("step_entropy") <= entropy_threshold),
                F.col("best_child"),
            )
            .otherwise(F.col("node"))
            .alias("node"),
            F.when(
                F.col("parent").isNotNull(), F.col("step_entropy")
            )
            .otherwise(F.col("entropy"))
            .alias("entropy"),
        )
        state = nxt.localCheckpoint(eager=True)

    preds = state.filter(F.col("node") != THING_URI)
    # (5) T5: per entity keep the min-entropy prediction (cls asc ties)
    wmin = Window.partitionBy("e").orderBy(F.asc("entropy"), F.asc("node"))
    return (
        preds.withColumn("rn", F.row_number().over(wmin))
        .filter("rn = 1")
        .select(
            F.col("e").alias("entity"),
            F.col("node").alias("cls"),
            F.round("entropy", 6).alias("entropy"),
        )
    )
