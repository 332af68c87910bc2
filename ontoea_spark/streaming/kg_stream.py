"""Streaming incremental KG construction — the flagship pipeline as a
stream (rebuild surface; the reference is batch-only, SURVEY.md §2.13).

Each micro-batch of crawled pages runs the SAME extraction expressions
as the batch DAG (``pipeline.kg_build``), then folds the resulting
triples into the persisted graph with ``pipeline.incremental.
incremental_update`` — frozen existing ids, appended unseen ids,
O(delta + one scan) edge merge. The stream therefore converges to the
same URI-level graph as a one-shot batch rebuild over the same pages
(id ASSIGNMENT differs by arrival order — the documented incremental
deviation from the batch interleave — but the decoded (s, p, o, kg)
edge set is identical; asserted by tests/test_streaming.py).

State layout (the Iceberg-append analogue this sandbox can express in
plain parquet): each micro-batch commits ONLY ITS DELTA —
``{state_dir}/v{batch_id}/{ent_ids,rel_ids,edges}`` holds the NEW
dictionary rows (ids above the parent's max — the frozen-append
contract makes "new" a cheap id-range filter) and the NOVEL edges
(``incremental_update`` already computes them for the anti-join merge).
A batch's write cost is O(delta), never O(graph) — at 10^12 documents a
full-table rewrite per micro-batch would be the scale killer. Reading
state = union of committed deltas at or below a version (Iceberg's
manifest-of-files, literally). foreachBatch may REPLAY a batch after a
crash; delta dirs keyed by batch_id make the retry idempotent — a
replayed batch re-reads deltas strictly below its own id and overwrites
only its own. Long streams compact old deltas exactly as Iceberg
compacts manifests; compaction changes file layout, not content.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENT_SCHEMA = "kg long, elem string, freq long, rank long, id long"
REL_SCHEMA = ENT_SCHEMA
EDGE_SCHEMA = "s_id long, p_id long, o_id long, kg long"

_STATE_TABLES = ("ent_ids", "rel_ids", "edges")


def _committed_versions(
    state_dir: str, tables: tuple[str, ...] = _STATE_TABLES
) -> list[int]:
    """Versions whose LAST table write finished (parquet _SUCCESS marker
    on every table — a half-written snapshot from a crashed batch is
    invisible and its replay overwrites it)."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        if not name.startswith("v"):
            continue
        base = os.path.join(state_dir, name)
        if all(
            os.path.exists(os.path.join(base, t, "_SUCCESS"))
            for t in tables
        ):
            out.append(int(name[1:]))
    return sorted(out)


def read_kg_state(
    spark, state_dir: str, before: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame] | None:
    """(ent_ids, rel_ids, edges) as the UNION of committed deltas,
    optionally restricted to versions < ``before`` (a replaying batch
    must read strictly below its own id, never its own half-committed
    delta). None if no snapshot exists yet. One multi-path parquet scan
    per table — the union is file listing, not a shuffle."""
    versions = _committed_versions(state_dir)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    return tuple(
        spark.read.parquet(
            *[
                os.path.join(state_dir, f"v{v}", t)
                for v in versions
            ]
        )
        for t in _STATE_TABLES
    )


def _empty_state(spark) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.createDataFrame([], ENT_SCHEMA),
        spark.createDataFrame([], REL_SCHEMA),
        spark.createDataFrame([], EDGE_SCHEMA),
    )


def ingest_pages_batch(
    pages: DataFrame, spark, state_dir: str, batch_id: int
) -> None:
    """The foreachBatch body: pages micro-batch -> triples -> incremental
    merge -> O(delta) versioned commit. Pure function of (parent deltas,
    batch rows), so a post-crash replay is idempotent. Only the NEW
    dictionary rows (id above the parent max — frozen-append makes that
    a range filter) and the NOVEL edges are written; the graph itself is
    never rewritten."""
    from ontoea_spark.pipeline.extract import extract_pages_text, extract_triples
    from ontoea_spark.pipeline.incremental import incremental_update
    from ontoea_spark.pipeline.kg_build import split_two_kgs

    tagged = split_two_kgs(extract_pages_text(pages))
    triples = extract_triples(tagged.select("kg", "text"), namespace_col="kg")
    state = read_kg_state(spark, state_dir, before=batch_id)
    ent, rel, edges = state if state is not None else _empty_state(spark)
    # parent max ids: tiny aggregates over the dictionary union — the
    # boundary between frozen rows and this batch's appended rows
    ent_max = ent.agg(F.coalesce(F.max("id"), F.lit(-1))).first()[0]
    rel_max = rel.agg(F.coalesce(F.max("id"), F.lit(-1))).first()[0]
    inc = incremental_update(
        ent,
        rel,
        edges,
        triples.select("s", "p", "o"),
        F.when(F.col("s").startswith("kg1:"), F.lit(1)).otherwise(F.lit(2)),
    )
    base = os.path.join(state_dir, f"v{batch_id}")
    for name, df in (
        ("ent_ids", inc.ent_ids.filter(F.col("id") > ent_max)),
        ("rel_ids", inc.rel_ids.filter(F.col("id") > rel_max)),
        ("edges", inc.novel_edges),
    ):
        df.write.mode("overwrite").parquet(os.path.join(base, name))


def streaming_kg_build(
    spark,
    pages_path: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
):
    """Run the incremental KG build over a stream of pages files with an
    availableNow trigger (drains everything currently present, then
    stops — the bounded-source test mode; a production crawl drops the
    trigger and runs forever). Returns the terminated query."""
    from ontoea_spark.streaming.ingest import read_pages_stream

    stream = read_pages_stream(
        spark, pages_path, max_files_per_trigger=max_files_per_trigger
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ingest_pages_batch(batch_df, spark, state_dir, batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_kg_state(spark, state_dir: str) -> int:
    """Offline maintenance (run while the stream is stopped — the
    Iceberg compaction analogue): merge all committed deltas into one
    delta dir under the CURRENT max version id, so reads scan one file
    set instead of one per micro-batch. Content is unchanged; version
    numbering is unchanged (the stream's next batch_id is tracked by its
    own Spark checkpoint and is strictly greater, so no collision).
    Returns the compacted version id.

    Crash-safety note, honestly: the sandbox's parquet layout swaps
    directories (write merged -> remove old -> rename), which is not
    atomic end-to-end; production Iceberg expresses this as a single
    snapshot commit. Run it as stop-the-world maintenance here."""
    import shutil

    versions = _committed_versions(state_dir)
    if not versions:
        raise ValueError(f"no committed state under {state_dir}")
    vmax = versions[-1]
    state = read_kg_state(spark, state_dir)
    tmp = os.path.join(state_dir, f"_compact_v{vmax}")
    for name, df in zip(_STATE_TABLES, state):
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
    for v in versions:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    os.rename(tmp, os.path.join(state_dir, f"v{vmax}"))
    return vmax


def decoded_edges(
    ent_ids: DataFrame, rel_ids: DataFrame, edges: DataFrame
) -> DataFrame:
    """Edge table decoded back to URIs: DataFrame[s, p, o, kg] — the
    id-assignment-independent view used to compare streaming and batch
    builds. The dictionaries are corpus-vocab-sized, so their broadcast
    hints are row-count-gated like every dictionary join (past the gate
    AQE plans the decode joins)."""
    from ontoea_spark.operators.dictionary import (
        BROADCAST_ROW_THRESHOLD,
        _gated_broadcast,
    )

    ent_m = ent_ids.select("kg", "elem", "id").localCheckpoint(eager=True)
    rel_m = rel_ids.select("kg", "elem", "id").localCheckpoint(eager=True)
    # independent gates: the relation vocab is typically tiny even when
    # the entity vocab is way past the threshold
    ent = _gated_broadcast(ent_m, ent_m.count() <= BROADCAST_ROW_THRESHOLD)
    rel = _gated_broadcast(rel_m, rel_m.count() <= BROADCAST_ROW_THRESHOLD)
    return (
        edges.join(
            ent.select(
                F.col("kg"), F.col("id").alias("s_id"), F.col("elem").alias("s")
            ),
            ["kg", "s_id"],
        )
        .join(
            rel.select(
                F.col("kg"), F.col("id").alias("p_id"), F.col("elem").alias("p")
            ),
            ["kg", "p_id"],
        )
        .join(
            ent.select(
                F.col("kg"), F.col("id").alias("o_id"), F.col("elem").alias("o")
            ),
            ["kg", "o_id"],
        )
        .select("s", "p", "o", "kg")
    )


# ---------------------------------------------------------------------------
# streaming host link graph (additive-state rollup)
# ---------------------------------------------------------------------------

_HOST_TABLES = ("host_edges",)


def ingest_links_batch(pages: DataFrame, state_dir: str, batch_id: int) -> None:
    """foreachBatch body for the streaming host link graph: this batch's
    pages -> href anchors -> host-edge PARTIAL counts, committed as the
    batch's own delta dir.

    Edge weight is a sum — a commutative-monoid state — so unlike the
    dictionary-bearing KG state this delta needs NO read of parent state
    at all: write cost is O(batch) with zero graph-sized scans, a
    crash-replay overwrites only its own version dir, and the merged
    view is a groupBy-sum over committed deltas at read time (the
    metrics-rollup pattern every streaming engine special-cases; here it
    falls out of the versioned-delta layout)."""
    from ontoea_spark.pipeline.weblinks import extract_links, host_link_graph

    g = host_link_graph(extract_links(pages))
    g.write.mode("overwrite").parquet(
        os.path.join(state_dir, f"v{batch_id}", "host_edges")
    )


def read_host_graph(
    spark, state_dir: str, before: int | None = None
) -> DataFrame | None:
    """Merged host graph = groupBy-sum over committed partial-count
    deltas (one multi-path scan). None if nothing is committed yet."""
    versions = _committed_versions(state_dir, tables=_HOST_TABLES)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    df = spark.read.parquet(
        *[os.path.join(state_dir, f"v{v}", "host_edges") for v in versions]
    )
    return df.groupBy("src_host", "dst_host").agg(
        F.sum("n_links").cast("long").alias("n_links")
    )


def streaming_host_graph(
    spark,
    pages_path: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
):
    """Incremental host-graph maintenance over a stream of pages files
    (availableNow drain for the bounded test mode; a production crawl
    runs unbounded). Converges to exactly the batch
    host_link_graph(extract_links(pages)) counts — addition is
    arrival-order-free, so there is no incremental deviation at all
    (asserted by tests/test_streaming.py)."""
    from ontoea_spark.streaming.ingest import read_pages_stream

    stream = read_pages_stream(
        spark, pages_path, max_files_per_trigger=max_files_per_trigger
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ingest_links_batch(batch_df, state_dir, batch_id)

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_host_graph(spark, state_dir: str) -> int:
    """Merge all committed host-edge deltas into one PRE-AGGREGATED
    delta under the current max version id (stop-the-world maintenance,
    same contract as compact_kg_state). The merged view is unchanged:
    read-time groupBy-sum over one pre-summed delta is the identity."""
    import shutil

    versions = _committed_versions(state_dir, tables=_HOST_TABLES)
    if not versions:
        raise ValueError(f"no committed host-graph state under {state_dir}")
    vmax = versions[-1]
    merged = read_host_graph(spark, state_dir)
    tmp = os.path.join(state_dir, f"_compact_v{vmax}")
    merged.write.mode("overwrite").parquet(os.path.join(tmp, "host_edges"))
    for v in versions:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    os.rename(tmp, os.path.join(state_dir, f"v{vmax}"))
    return vmax


# ---------------------------------------------------------------------------
# streaming canonical graph: merge-on-read insert/delete log
# ---------------------------------------------------------------------------
#
# Canonicalization state is NOT an additive monoid (a batch whose links
# dethrone a canonical RETRACTS previously-committed rows), so the
# host-graph partial-sum trick doesn't apply. The versioned-delta layout
# still does: each batch commits its CanonicalDelta change sets as an
# insert/delete log (``triple_log``: s,p,o,op,v) plus latest-wins map
# rows (``map_log``: entity,canonical,v) — exactly Iceberg's
# merge-on-read delete files. Commit cost is O(delta + affected); the
# merged view is ONE groupBy (max_by over the version) per table at read
# time; a crash-replay re-reads strictly below its own version and
# overwrites only its own dir, so replays are idempotent.

_CANON_TABLES = ("triple_log", "map_log")
TRIPLE_LOG_SCHEMA = "s string, p string, o string, op string, v long"
MAP_LOG_SCHEMA = "entity string, canonical string, v long"


def read_canonical_state(
    spark, state_dir: str, before: int | None = None
) -> tuple[DataFrame, DataFrame] | None:
    """(triples, mapping) from the log: the latest op per (s,p,o) wins
    (a delete tombstone drops the row), the latest canonical per entity
    wins. None before the first commit."""
    versions = _committed_versions(state_dir, tables=_CANON_TABLES)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    tl = spark.read.parquet(
        *[os.path.join(state_dir, f"v{v}", "triple_log") for v in versions]
    )
    ml = spark.read.parquet(
        *[os.path.join(state_dir, f"v{v}", "map_log") for v in versions]
    )
    triples = (
        tl.groupBy("s", "p", "o")
        .agg(F.max_by("op", "v").alias("op"))
        .filter(F.col("op") == "insert")
        .select("s", "p", "o")
    )
    mapping = ml.groupBy("entity").agg(
        F.max_by("canonical", "v").alias("canonical")
    )
    return triples, mapping


def ingest_canonical_stream_batch(
    spark,
    delta_triples: DataFrame,
    delta_links: DataFrame,
    state_dir: str,
    batch_id: int,
) -> None:
    """foreachBatch body for streaming canonicalization: fold this
    batch's (triples, links) into the canonical graph via
    ``pipeline.canonicalize.ingest_canonical_batch`` and commit ONLY the
    change sets. The first batch bootstraps with a plain canonical
    rewrite (everything inserts)."""
    from ontoea_spark.pipeline.canonicalize import (
        canonical_entity_map,
        ingest_canonical_batch,
        rewrite_triples,
    )

    state = read_canonical_state(spark, state_dir, before=batch_id)
    cur_t = None
    if state is None:
        mapping = canonical_entity_map(delta_links).localCheckpoint(eager=True)
        novel = rewrite_triples(delta_triples, mapping)
        retracted = spark.createDataFrame([], "s string, p string, o string")
        changed_map = mapping
    else:
        cur_t, cur_m = state
        # persist (NOT localCheckpoint) the merged corpus view: the
        # ingest probe-scans it 2-3x within this batch, but pinning an
        # O(corpus) checkpointed RDD per micro-batch would accumulate
        # until GC — persist is spill-safe and released in `finally`
        cur_t = cur_t.persist()
        d = ingest_canonical_batch(cur_t, cur_m, delta_triples, delta_links)
        novel, retracted, changed_map = (
            d.novel_triples,
            d.retracted_triples,
            d.changed_map_rows,
        )
    try:
        base = os.path.join(state_dir, f"v{batch_id}")
        log = novel.withColumn("op", F.lit("insert")).unionByName(
            retracted.withColumn("op", F.lit("delete"))
        )
        log.withColumn("v", F.lit(batch_id).cast("long")).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, "triple_log"))
        changed_map.withColumn("v", F.lit(batch_id).cast("long")).write.mode(
            "overwrite"
        ).parquet(os.path.join(base, "map_log"))
    finally:
        if cur_t is not None:
            cur_t.unpersist()


def compact_canonical_state(spark, state_dir: str) -> int:
    """Collapse the insert/delete log into one all-inserts base version
    (Iceberg's MoR compaction): read the merged view, rewrite it as a
    single delta under the current max version, drop the rest. The
    merged view is unchanged by construction."""
    import shutil

    versions = _committed_versions(state_dir, tables=_CANON_TABLES)
    if not versions:
        raise ValueError(f"no committed canonical state under {state_dir}")
    vmax = versions[-1]
    triples, mapping = read_canonical_state(spark, state_dir)
    tmp = os.path.join(state_dir, f"_compact_v{vmax}")
    triples.withColumn("op", F.lit("insert")).withColumn(
        "v", F.lit(vmax).cast("long")
    ).write.mode("overwrite").parquet(os.path.join(tmp, "triple_log"))
    mapping.withColumn("v", F.lit(vmax).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(tmp, "map_log"))
    for v in versions:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    os.rename(tmp, os.path.join(state_dir, f"v{vmax}"))
    return vmax


# ---------------------------------------------------------------------------
# streaming corpus profile: sketch state (additive CMS + semilattice KMV)
# ---------------------------------------------------------------------------
#
# The profiling sketches (operators/sketches.py) are the two easiest
# kinds of streaming state there are, and for opposite algebraic
# reasons: count-min cells are an additive monoid (the host-graph
# partial-sum shape — read = groupBy-sum over deltas) and KMV minima are
# a semilattice (merge = k-smallest-of-union — read = k-minima over the
# flattened deltas). Both mean a micro-batch commits ONLY its own
# batch-local sketch: zero parent reads, O(batch) write cost, and the
# merged view equals the one-shot sketch of all rows EXACTLY (monoid /
# semilattice laws — asserted by tests/test_streaming.py), so a crawl's
# running cardinality and hot-key profile stays current per micro-batch
# without ever rescanning the corpus.

_PROFILE_TABLES = ("kmv_minima", "cms_cells")


def ingest_profile_batch(
    df: DataFrame,
    state_dir: str,
    batch_id: int,
    key_cols: tuple[str, ...],
    value_col: str,
    k: int = 64,
    d: int = 4,
    w: int = 1024,
) -> None:
    """foreachBatch body: this batch's rows -> its OWN KMV + CMS sketches,
    committed as the batch's versioned delta dir (replay overwrites only
    its own version — idempotent)."""
    from ontoea_spark.operators.sketches import cms_sketch, kmv_sketch

    base = os.path.join(state_dir, f"v{batch_id}")
    kmv_sketch(df, list(key_cols), value_col, k).write.mode(
        "overwrite"
    ).parquet(os.path.join(base, "kmv_minima"))
    cms_sketch(df, value_col, d, w).write.mode("overwrite").parquet(
        os.path.join(base, "cms_cells")
    )


def read_profile(
    spark,
    state_dir: str,
    key_cols: tuple[str, ...],
    k: int = 64,
    before: int | None = None,
) -> tuple[DataFrame, DataFrame] | None:
    """(kmv_sketch, cms) merged over committed deltas: KMV per key is the
    k smallest of the union of the batch minima (collect_list state is
    bounded at k * n_versions per key; compaction resets it), CMS is the
    host-graph groupBy-sum. None if nothing committed yet."""
    versions = _committed_versions(state_dir, tables=_PROFILE_TABLES)
    if before is not None:
        versions = [v for v in versions if v < before]
    if not versions:
        return None
    kmv = (
        spark.read.parquet(
            *[os.path.join(state_dir, f"v{v}", "kmv_minima") for v in versions]
        )
        .groupBy(*key_cols)
        .agg(
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("minima")))
                ),
                1,
                k,
            ).alias("minima")
        )
    )
    cms = (
        spark.read.parquet(
            *[os.path.join(state_dir, f"v{v}", "cms_cells") for v in versions]
        )
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    return kmv, cms


def streaming_corpus_profile(
    spark,
    pages_path: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
    k: int = 64,
    d: int = 4,
    w: int = 1024,
):
    """Running crawl profile over a stream of pages files: per-lang
    distinct-URL KMV + URL-frequency CMS (recrawl hot-key detector),
    maintained per micro-batch at O(batch) cost. availableNow drain for
    the bounded test mode; a production crawl runs unbounded."""
    from ontoea_spark.streaming.ingest import read_pages_stream

    stream = read_pages_stream(
        spark, pages_path, max_files_per_trigger=max_files_per_trigger
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ingest_profile_batch(
            batch_df.select("lang", "url"),
            state_dir,
            batch_id,
            ("lang",),
            "url",
            k,
            d,
            w,
        )

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def compact_profile(
    spark, state_dir: str, key_cols: tuple[str, ...], k: int = 64
) -> int:
    """Merge all committed sketch deltas into one (stop-the-world
    maintenance, same contract as compact_host_graph): semilattice and
    monoid merges are idempotent/associative, so re-reading the single
    compacted delta reproduces the merged view exactly."""
    import shutil

    versions = _committed_versions(state_dir, tables=_PROFILE_TABLES)
    if not versions:
        raise ValueError(f"no committed profile state under {state_dir}")
    vmax = versions[-1]
    kmv, cms = read_profile(spark, state_dir, key_cols, k)
    tmp = os.path.join(state_dir, f"_compact_v{vmax}")
    kmv.write.mode("overwrite").parquet(os.path.join(tmp, "kmv_minima"))
    cms.write.mode("overwrite").parquet(os.path.join(tmp, "cms_cells"))
    for v in versions:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"))
    os.rename(tmp, os.path.join(state_dir, f"v{vmax}"))
    return vmax
