"""Entity canonicalization — consume alignment links to unify the KG.

The north rule's "link and canonicalize entities before materializing"
stage: ``build_kg`` emits two per-KG triple sets plus (e1, e2) alignment
links; this module folds the links back into the graph so every aligned
entity cluster becomes ONE canonical node, then re-encodes the merged
triple set with a single unified dictionary.

Reference counterpart: OntoEA never rewrites the graph — aligned pairs
only ever share an *id* during training (``generate_sharing_id``,
reference read.py:29-61, kgs.py:33-40) and matches surface at
evaluation. The rebuild makes the merge a first-class distributed
stage, because at crawl scale the canonical graph IS the product (the
partitioned edge/vertex tables downstream consumers read).

At-scale design (the shuffles, all of them):

* the component computation runs over the LINK set only — O(linked
  entities), orders of magnitude smaller than the edge table — with
  pointer-jumping min-label propagation (O(log diameter) rounds,
  ``operators/graph.py``);
* the (entity -> canonical) map keeps only NON-identity rows, so its
  size is bounded by the number of merged entities; the two edge-rewrite
  joins broadcast it while it fits (same row-count gate as the
  dictionary encodes) and degrade to AQE-planned shuffled joins past
  the threshold;
* one ``distinct`` over the rewritten triples (set semantics — merging
  collapses parallel edges), then the unified dictionary reuses the
  two-phase exact rank (no single-partition window anywhere).

Chains and many-to-many links are handled by construction: a predicted
link set where kg1:a and kg1:b both link kg2:x collapses all three to
min(kg1:a, kg1:b). For the synthetic gold links (1:1 bipartite,
``kg1:w`` < ``kg2:w`` lexicographically) the component minimum is
always the kg1 member — which is what lets the driver oracle express
the same rewrite as two plain left joins.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoea_spark.operators.dictionary import (
    BROADCAST_ROW_THRESHOLD,
    _gated_broadcast,
    encode_triples,
    single_kg_ids,
)
from ontoea_spark.operators.graph import connected_components


@dataclass
class CanonicalKG:
    triples: DataFrame  # canonical (s, p, o) URIs, set semantics
    ent_ids: DataFrame  # unified dictionary (elem, freq, id)
    rel_ids: DataFrame
    edges: DataFrame  # (s_id, p_id, o_id)
    vertices: DataFrame  # (id, uri, freq, srcs)


def canonical_entity_map(
    links: DataFrame,
    left_col: str = "e1",
    right_col: str = "e2",
    max_iter: int = 25,
) -> DataFrame:
    """(e1, e2) pairs -> (entity, canonical) with canonical = the
    minimum URI in each connected component of the link graph.

    Only entities that actually change are returned (identity rows are
    dropped), so the map's row count == number of merged-away entities —
    the quantity the broadcast gate should see, not |all entities|.
    """
    nodes = (
        links.select(F.col(left_col).alias("entity"))
        .unionAll(links.select(F.col(right_col).alias("entity")))
        .distinct()
    )
    comp = connected_components(
        nodes, links, id_col="entity",
        left_col=left_col, right_col=right_col, max_iter=max_iter,
    )
    return comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("entity"), F.col("component").alias("canonical")
    )


def rewrite_triples(
    triples: DataFrame,
    mapping: DataFrame,
    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD,
) -> DataFrame:
    """Rewrite s/o through the canonical map; distinct.

    Two left joins (subject, object) against the non-identity map —
    broadcast while the map fits under ``broadcast_threshold`` rows,
    shuffled otherwise — then one set-semantics distinct (parallel
    edges collapse when their endpoints merge). Predicates are left
    untouched: entity alignment merges nodes, not relations.
    """
    mapping = mapping.localCheckpoint(eager=True)
    small = mapping.count() <= broadcast_threshold
    ms = _gated_broadcast(
        mapping.select(
            F.col("entity").alias("s"), F.col("canonical").alias("s_canon")
        ),
        small,
    )
    mo = _gated_broadcast(
        mapping.select(
            F.col("entity").alias("o"), F.col("canonical").alias("o_canon")
        ),
        small,
    )
    return (
        triples.join(ms, "s", "left")
        .join(mo, "o", "left")
        .select(
            F.coalesce("s_canon", "s").alias("s"),
            F.col("p"),
            F.coalesce("o_canon", "o").alias("o"),
        )
        .distinct()
    )


def vertex_provenance(
    entities: DataFrame,
    mapping: DataFrame,
    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD,
) -> DataFrame:
    """(canonical uri -> srcs): which source KGs merged into each node.

    ``entities``: one column ``entity`` of pre-rewrite URIs (namespace-
    prefixed ``kg<N>:...``). Returns (uri, srcs) with srcs the sorted
    comma-joined distinct namespace prefixes — ``'kg1,kg2'`` for a
    merged node, single-prefix otherwise. One groupBy over the entity
    set (not the edge table).
    """
    small = mapping.count() <= broadcast_threshold
    m = _gated_broadcast(
        mapping.select(
            F.col("entity"), F.col("canonical")
        ),
        small,
    )
    return (
        entities.join(m, "entity", "left")
        .select(
            F.coalesce("canonical", "entity").alias("uri"),
            F.substring_index("entity", ":", 1).alias("src"),
        )
        .groupBy("uri")
        .agg(F.concat_ws(",", F.array_sort(F.collect_set("src"))).alias("srcs"))
    )


def canonicalize_kg(
    triples1: DataFrame,
    triples2: DataFrame,
    links: DataFrame,
    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD,
) -> CanonicalKG:
    """Full canonicalization: links -> components -> rewrite -> unified
    dictionary -> edge/vertex tables.

    The unified dictionary is the one-KG path (D3 ``mapping_id_oneKG``,
    reference read.py:64-69: id == frequency rank) over the CANONICAL
    triple set — merged nodes rank by their merged frequency, which is
    exactly the property the downstream adjacency/degree consumers want.
    """
    all_t = triples1.unionByName(triples2)
    mapping = canonical_entity_map(links)
    canon = rewrite_triples(
        all_t, mapping, broadcast_threshold
    ).localCheckpoint(eager=True)
    ent_ids = single_kg_ids(canon).localCheckpoint(eager=True)
    rel_ids = single_kg_ids(canon, roles=("p",)).localCheckpoint(eager=True)
    edges = encode_triples(canon, ent_ids, rel_ids, broadcast_threshold)
    pre_entities = (
        all_t.select(F.col("s").alias("entity"))
        .unionAll(all_t.select(F.col("o").alias("entity")))
        .distinct()
    )
    prov = vertex_provenance(pre_entities, mapping, broadcast_threshold)
    vertices = ent_ids.select(
        F.col("id"), F.col("elem").alias("uri"), F.col("freq")
    ).join(prov, "uri").select("id", "uri", "freq", "srcs")
    return CanonicalKG(
        triples=canon,
        ent_ids=ent_ids,
        rel_ids=rel_ids,
        edges=edges,
        vertices=vertices,
    )
