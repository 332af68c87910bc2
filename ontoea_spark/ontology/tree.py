"""Ontology class-tree operators (SURVEY.md §2.9 G1/G2/G3/G9).

Reference semantics: each class has at most one parent
(``check.py:113-119`` parent-chain walk; ``inference.py:141-149``), the
root is ``owl#Thing``; a class *path* is the root-ward ancestor list
*starting with the class itself* (``read.py:470-473`` format).

Scale design: the class tree is always tiny relative to the entity
space (hundreds vs billions), so paths are derived by an iterative
broadcast self-join (depth iterations, zero shuffle on the big side)
and the resulting path table is itself broadcast into every downstream
entity-level join. Nothing here ever shuffles entity-scale data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

THING_URI = "http://www.w3.org/2002/07/owl#Thing"


def all_classes(subclass: DataFrame) -> DataFrame:
    """Distinct classes = children ∪ parents of the subClassOf edge set
    (mirrors ``check.py:59``: keys | values)."""
    return (
        subclass.select(F.col("child").alias("cls"))
        .union(subclass.select(F.col("parent")))
        .distinct()
    )


def class_paths(
    subclass: DataFrame, max_depth: int = 32, iters: int | None = None
) -> DataFrame:
    """Root-ward ancestor paths for every class.

    subclass: DataFrame[child, parent] — single parent per child (the
    reference stores it as a dict, ``check.py:40``, so a duplicate child
    would silently keep the last edge; here duplicates are dropped
    deterministically by keeping the max parent).

    ``iters``: when the tree depth is known, run exactly that many join
    rounds with no convergence counting (each extra round is a no-op once
    a class reaches the root) — keeps the plan fully lazy. Default: count
    per round, stop at fixpoint.

    Returns DataFrame[cls, path: array<string>] where
    ``path = [cls, parent, grandparent, ..., root]``
    (``inference.py:141-149`` chain-walk semantics).
    """
    edges = (
        subclass.groupBy("child").agg(F.max("parent").alias("parent"))
    )
    paths = all_classes(subclass).select(
        "cls", F.array("cls").alias("path"), F.col("cls").alias("cur")
    )
    for i in range(iters if iters is not None else max_depth):
        if iters is None and paths.filter(F.col("cur").isNotNull()).count() == 0:
            break
        j = paths.join(
            F.broadcast(edges), paths.cur == edges.child, "left"
        )
        paths = j.select(
            "cls",
            F.when(F.col("parent").isNull(), F.col("path"))
            .otherwise(F.concat(F.col("path"), F.array(F.col("parent"))))
            .alias("path"),
            F.col("parent").alias("cur"),
        )
    return paths.select("cls", "path")


def truncate_paths(paths: DataFrame, max_depth: int) -> DataFrame:
    """Cap paths at ``max_depth`` by replacing deep classes with their
    ancestor at depth — i.e. keep the *last* max_depth elements
    (root-ward suffix), per ``inference.py:497-520``
    (class_path_truncation)."""
    return paths.select(
        "cls",
        F.when(
            F.size("path") <= max_depth, F.col("path")
        )
        .otherwise(
            F.slice(F.col("path"), -max_depth, max_depth)
        )
        .alias("path"),
    )


def disjoint_targets(paths: DataFrame, disjoint: DataFrame) -> DataFrame:
    """Per class: the disjointWith-targets declared on any of its
    ancestors (including itself).

    disjoint: DataFrame[child, target] (``check.py:42-49``; dict semantics
    → dedup by max like :func:`class_paths`).

    Returns DataFrame[cls, path, disj: array<string>] (disj possibly
    empty). Two classes a, b conflict iff
    ``arrays_overlap(a.disj, b.path) OR arrays_overlap(b.disj, a.path)``
    — exactly ``check.py:171-181`` (check_disjoint) with the ancestor
    lists pre-expanded.
    """
    d = disjoint.groupBy("child").agg(F.max("target").alias("target"))
    exploded = paths.select("cls", F.explode("path").alias("anc"))
    targets = (
        exploded.join(F.broadcast(d), exploded.anc == d.child, "inner")
        .groupBy("cls")
        .agg(F.sort_array(F.collect_set("target")).alias("disj"))
    )
    return paths.join(targets, "cls", "left").select(
        "cls",
        "path",
        F.coalesce("disj", F.array().cast("array<string>")).alias("disj"),
    )


def ontology_structure_lines(
    subclass: DataFrame, max_layers: int = 10
) -> list[str]:
    """G10 ``print_ontology_structure`` (inference.py:104-133): BFS
    layer-by-layer pretty-print of the class tree — one line per depth,
    each parent's children rendered as '(c1 c2 ...)\\t', capped at
    ``max_layers`` layers. Diagnostic only; the tree aggregation is one
    Spark groupBy over the (child, parent) edges (|classes| rows), the
    string formatting is driver-side like the reference's print loop.

    Deviation: children within a node are SORTED (the reference iterates
    a Python set — nondeterministic print order); basenames strip the
    URI prefix up to the last '/' or '#', matching os.path.split on the
    reference's URIs.
    """
    import posixpath

    def base(col):
        return F.element_at(F.split(F.regexp_replace(col, "#", "/"), "/"), -1)

    tree_rows = (
        subclass.select(
            base(F.col("parent")).alias("p"), base(F.col("child")).alias("c")
        )
        .groupBy("p")
        .agg(F.array_sort(F.collect_set("c")).alias("children"))
        .collect()
    )
    tree = {r.p: list(r.children) for r in tree_rows}
    root = posixpath.split(THING_URI.replace("#", "/"))[-1]
    queue: list[list[str]] = [[root]]
    lines: list[str] = []
    for _ in range(max_layers):
        if not queue:
            break
        layer_nums = len(queue)
        line = ""
        while layer_nums:
            node = queue.pop(0)
            line += "(" + " ".join(node) + ")\t"
            for child in node:
                if child in tree:
                    queue.append(tree[child])
            layer_nums -= 1
        lines.append(line)
    return lines
