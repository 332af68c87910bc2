"""KMV / count-min sketch gates: estimator exactness below capacity,
estimation quality at scale, bit-exact semilattice merge, overestimate
invariant, and the single-exchange bounded-state plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontoea_spark.operators import sketches as SK


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _grouped_ids(spark, spec):
    """spec: {group: iterable of int values} -> DataFrame[g, v]."""
    rows = [(g, int(v)) for g, vals in spec.items() for v in vals]
    return spark.createDataFrame(rows, "g string, v long")


def test_kmv_exact_below_capacity(spark):
    # 30 distinct values, each duplicated 3x: the sketch is not full, so
    # the estimate IS the exact distinct count (dense_rank dedups).
    df = _grouped_ids(spark, {"a": list(range(30)) * 3})
    est = SK.kmv_estimate(SK.kmv_sketch(df, ["g"], "v", k=64), k=64).collect()
    assert len(est) == 1
    assert est[0].n_minima == 30
    assert est[0].est_distinct == 30


def test_kmv_estimator_full_sketch(spark):
    # 5000 distinct values, k=64: relative error should sit within a few
    # standard errors (1/sqrt(k-1) ~ 12.6%); deterministic hash -> the
    # assertion is a fixed fact, not a flaky sample.
    df = spark.range(5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    est = SK.kmv_estimate(SK.kmv_sketch(df, ["g"], "v", k=64), k=64).collect()
    assert est[0].n_minima == 64
    rel = abs(est[0].est_distinct / 5000.0 - 1.0)
    assert rel < 0.4, (est[0].est_distinct, rel)


def test_kmv_merge_is_sketch_of_union(spark):
    # Semilattice: merging shard sketches == sketching the concatenation,
    # bit for bit — the property that makes shard-level rollup exact.
    a = _grouped_ids(spark, {"x": range(0, 3000), "only_a": range(10)})
    b = _grouped_ids(spark, {"x": range(2000, 5000), "only_b": range(5)})
    k = 32
    merged = SK.kmv_merge(
        SK.kmv_sketch(a, ["g"], "v", k=k),
        SK.kmv_sketch(b, ["g"], "v", k=k),
        ["g"],
        k=k,
    )
    direct = SK.kmv_sketch(a.unionByName(b), ["g"], "v", k=k)
    got = {r.g: r.minima for r in merged.collect()}
    want = {r.g: r.minima for r in direct.collect()}
    assert got == want
    assert len(want["only_a"]) == 10 and len(want["only_b"]) == 5


def test_kmv_jaccard_exact_below_capacity(spark):
    # Sets smaller than k: the "estimate" is the exact Jaccard.
    df = _grouped_ids(spark, {"x": range(0, 10), "y": range(5, 15)})
    sk = SK.kmv_sketch(df, ["g"], "v", k=64)
    row = SK.kmv_pairwise_jaccard(sk, "g", k=64).collect()[0]
    assert (row.g_a, row.g_b) == ("x", "y")
    assert row.k_used == 15 and row.inter_k == 5
    assert abs(row.jaccard_est - 5 / 15) < 1e-6


def test_kmv_jaccard_estimator(spark):
    # |A|=|B|=3000, overlap 1000, union 5000 -> true J = 0.2; k=64.
    df = _grouped_ids(spark, {"x": range(0, 3000), "y": range(2000, 5000)})
    sk = SK.kmv_sketch(df, ["g"], "v", k=64)
    row = SK.kmv_pairwise_jaccard(sk, "g", k=64).collect()[0]
    assert row.k_used == 64
    assert abs(row.jaccard_est - 0.2) < 0.15, row.jaccard_est


def test_cms_never_underestimates(spark):
    # 50 keys with known skewed counts; wide sketch (d=4, w=4096).
    df = spark.range(50).select(
        F.col("id").alias("v"),
        F.explode(F.sequence(F.lit(1), F.col("id") % 7 + 1)).alias("rep"),
    ).select("v")
    exact = {r.v: r.cnt for r in df.groupBy("v").agg(F.count("*").alias("cnt")).collect()}
    cms = SK.cms_sketch(df, "v", d=4, w=4096)
    est = SK.cms_estimate(cms, df.select("v").distinct(), "v", d=4, w=4096)
    got = {r.v: r.est_count for r in est.collect()}
    assert set(got) == set(exact)
    assert all(got[v] >= exact[v] for v in exact)
    # wide sketch, 50 keys: the min-over-d rows resolves every collision
    assert got == exact


def test_cms_narrow_sketch_overestimates_but_bounded(spark):
    # w=4 forces collisions: estimates exceed truth somewhere, never under,
    # and each estimate is bounded by the total mass (the row sum).
    df = spark.range(200).select((F.col("id") % 50).alias("v"))
    cms = SK.cms_sketch(df, "v", d=4, w=4)
    est = SK.cms_estimate(cms, df.select("v").distinct(), "v", d=4, w=4)
    rows = est.collect()
    assert all(r.est_count >= 4 for r in rows)  # exact count is 4 each
    assert any(r.est_count > 4 for r in rows)
    assert all(r.est_count <= 200 for r in rows)


def test_kmv_sketch_plan_bounded_single_exchange(spark):
    # The scale contract: ONE exchange (the window's), with the
    # WindowGroupLimit rewrite bounding per-task state to k ranks before
    # it, and the collect_set groupBy reusing the window partitioning.
    df = spark.range(10000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("v")
    )
    sk = SK.kmv_sketch(df, ["g"], "v", k=16)
    plan = _plan(sk)
    assert "WindowGroupLimit" in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_cms_sketch_plan_single_exchange(spark):
    df = spark.range(10000).select(F.col("id").alias("v"))
    plan = _plan(SK.cms_sketch(df, "v", d=4, w=64))
    assert plan.count("Exchange") == 1, plan


def test_kmv_global_matches_keyed_constant(spark):
    # The two-level bucketed global sketch must equal the keyed sketch
    # under a constant key bit-for-bit (same minima set, different plan),
    # and its plan must window on the bucket column — never a single
    # corpus-wide window partition.
    from pyspark.sql import functions as F

    df = spark.range(5000).select(F.col("id").alias("v"))
    glob = SK.kmv_sketch_global(df, "v", k=64, n_buckets=32)
    keyed = SK.kmv_sketch(
        df.withColumn("g", F.lit("all")), ["g"], "v", k=64
    )
    assert glob.collect()[0].minima == keyed.collect()[0].minima
    est = SK.kmv_estimate(glob, k=64).collect()[0]
    assert est.n_minima == 64
    assert abs(est.est_distinct / 5000.0 - 1.0) < 0.4
    plan = _plan(glob)
    assert "WindowGroupLimit" in plan, plan
    assert "__b" in plan[plan.index("WindowGroupLimit") :][:200], plan


def test_kmv_pre_distinct_same_result_partial_agg_plan(spark):
    # Duplicate-heavy input: pre_distinct must give the identical sketch
    # while its plan dedups with a partial (map-side) aggregate BEFORE
    # the first exchange — the shape that stops a hot (key, value) pair
    # from flooding the shuffle through the shared dense_rank.
    df = spark.range(20000).select(
        F.lit("g").alias("g"), (F.col("id") % 40).alias("v")  # 500x dups
    )
    plain = SK.kmv_sketch(df, ["g"], "v", k=16)
    dedup = SK.kmv_sketch(df, ["g"], "v", k=16, pre_distinct=True)
    # plan BEFORE collect: the initial (non-AQE-rewritten) tree, printed once
    plan = _plan(dedup)
    assert plain.collect()[0].minima == dedup.collect()[0].minima
    # the dedup exchange partitions on (key, hash)...
    i = plan.index("Exchange hashpartitioning(g")
    assert "__h" in plan[i : i + 80], plan
    # ...and the plan prints root-first, so the map-side partial
    # aggregate (upstream of that exchange) is a HashAggregate BELOW it
    assert "HashAggregate" in plan[i:], plan
    # the plain shape never shuffles on (key, hash) — its one exchange
    # partitions on the key alone
    pplan = _plan(plain)
    starts = [
        j
        for j in range(len(pplan))
        if pplan.startswith("Exchange hashpartitioning(", j)
    ]
    assert all("__h" not in pplan[j : j + 80] for j in starts), pplan


def test_ams_f2_estimates_self_join_size(spark):
    # Skewed frequencies: value v appears v+1 times -> F2 = sum (v+1)^2.
    # AMS relative stderr ~ sqrt(2/d); one fixed hash family makes the
    # draw deterministic, so the band is a fixed fact.
    df = (
        spark.range(20)
        .select(
            F.col("id").alias("v"),
            F.explode(F.sequence(F.lit(0), F.col("id"))).alias("r"),
        )
        .select(F.lit("a").alias("g"), "v")
    )
    exact = sum((v + 1) ** 2 for v in range(20))
    est = SK.ams_f2_estimate(
        SK.ams_f2_sketch(df, ["g"], "v", d=16)
    ).collect()[0].f2_est
    assert abs(est / exact - 1.0) < 0.6, (est, exact)


def test_ams_sketch_is_additive(spark):
    # Monoid: sketch(A ∪ B) == elementwise sum of the shard sketches —
    # the property that makes map-side combine the merge.
    a = _grouped_ids(spark, {"x": [1, 2, 2, 3], "only_a": [5]})
    b = _grouped_ids(spark, {"x": [2, 3, 3, 9]})
    za = {r.g: r.z for r in SK.ams_f2_sketch(a, ["g"], "v", d=8).collect()}
    zb = {r.g: r.z for r in SK.ams_f2_sketch(b, ["g"], "v", d=8).collect()}
    zu = {
        r.g: r.z
        for r in SK.ams_f2_sketch(a.unionByName(b), ["g"], "v", d=8).collect()
    }
    assert zu["x"] == [za["x"][i] + zb["x"][i] for i in range(8)]
    assert zu["only_a"] == za["only_a"]


def test_ams_plan_single_exchange(spark):
    df = spark.range(10000).select(
        (F.col("id") % 3).cast("string").alias("g"), F.col("id").alias("v")
    )
    plan = _plan(SK.ams_f2_sketch(df, ["g"], "v", d=8))
    assert plan.count("Exchange") == 1, plan


def test_suggest_n_salts_hub_vs_uniform(spark):
    # The sketch-driven salting decision: uniform keys (K >> P^2) must
    # suggest no salting at all; a 50%-mass hub must suggest ~alpha*P.
    from ontoea_spark.operators.salting import suggest_n_salts

    P = 16
    uniform = spark.range(40000).select((F.col("id") % 4000).alias("k"))
    assert suggest_n_salts(uniform, "k", P) == 1

    hub = spark.range(40000).select(
        F.when(F.col("id") < 20000, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k")
    )
    s = suggest_n_salts(hub, "k", P)  # alpha*P = 8 +- estimator noise
    assert 4 <= s <= 16, s


def test_null_values_are_not_values(spark):
    # NULLs must not consume KMV rank slots, accumulate CMS mass in
    # unreachable cells, or null out AMS sums / the salting suggestion —
    # each sketch of data-with-NULLs equals the sketch of the non-null
    # rows (review findings: rank-slot truncation broke the estimator
    # AND cross-engine parity, Spark sorting NULLs first, DuckDB last).
    from ontoea_spark.operators.salting import suggest_n_salts

    rows = [("a", int(v)) for v in range(40)] + [("a", None)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    clean = df.filter(F.col("v").isNotNull())

    k = 32  # < 40 distinct, so a stolen rank slot would truncate
    got = SK.kmv_sketch(df, ["g"], "v", k=k).collect()[0].minima
    want = SK.kmv_sketch(clean, ["g"], "v", k=k).collect()[0].minima
    assert got == want and len(got) == k
    assert (
        SK.kmv_sketch_global(df, "v", k=k).collect()[0].minima == want
    )

    cms = SK.cms_sketch(df, "v", d=4, w=256)
    est = {
        r.v: r.est_count
        for r in SK.cms_estimate(
            cms, df.select("v").distinct(), "v", d=4, w=256
        ).collect()
    }
    assert est.pop(None, 0) == 0  # NULL row contributes/receives nothing
    assert all(c >= 1 for c in est.values()) and len(est) == 40

    za = SK.ams_f2_sketch(df, ["g"], "v", d=8).collect()[0].z
    zb = SK.ams_f2_sketch(clean, ["g"], "v", d=8).collect()[0].z
    assert za == zb

    all_null = spark.createDataFrame([("x", None)] * 10, "k string, v long")
    assert suggest_n_salts(all_null.select(F.col("v").alias("k")), "k", 8) == 1


def test_ams_estimate_survives_giant_counters(spark):
    # A hub past sqrt(2^63) rows makes |z| ~ 3e9; the squares must go
    # through DOUBLE, not wrap/throw in long arithmetic.
    big = 4_000_000_000
    z = [big, -big, big, -big, big, -big, big, -big]
    sk = spark.createDataFrame([("h", z)], "g string, z array<long>")
    est = SK.ams_f2_estimate(sk).collect()[0].f2_est
    assert est == float(big) ** 2, est
