"""Connected components over candidate-pair edges — duplicate-CLUSTER
resolution (rebuild scope: pair joins from the dedup suite tell you two
docs match; canonicalization needs the transitive closure, i.e. one
representative per component).

Algorithm: iterative min-label propagation. Each round every node takes
the minimum component label among itself and its neighbors; rounds are
localCheckpoint-materialized (truncated lineage — iterative plans grow
exponentially otherwise, the links-fixpoint lesson) and stop when no
label changes. Convergence is O(max component diameter) rounds —
duplicate clusters are near-cliques, so 2-3 rounds in practice; for
adversarially long chains the large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce") halves diameter per round and
drops in behind the same contract.

Per round: one shuffle (neighbor groupBy-min) + one broadcast-free join
on id. The driver sees only a changed-label COUNT per round — no row
data ever collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    left_col: str = "id1",
    right_col: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``pairs`` (undirected). Nodes without any edge keep their own id
    (singleton components).

    nodes: DataFrame with ``id_col``; pairs: DataFrame[left_col, right_col].
    Returns DataFrame[id, component].
    """
    sym = (
        pairs.select(
            F.col(left_col).cast("long").alias("a"),
            F.col(right_col).cast("long").alias("b"),
        )
        .unionAll(
            pairs.select(
                F.col(right_col).cast("long").alias("a"),
                F.col(left_col).cast("long").alias("b"),
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(id_col).cast("long").alias("comp"),
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nb_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nb_comp"))
        )
        new_labels = (
            labels.join(nb_min, labels["id"] == nb_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))
                ).alias("comp"),
                (F.col("nb_comp") < F.col("comp")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("id", "comp")
        if n_changed == 0:
            break
    return labels.select("id", F.col("comp").alias("component"))
