"""Sketch laws: HLL merge-exactness, CMS decode vs JVM + one-sided error,
KMV estimate/union/intersection, murmur3 JVM-compatibility, rollup carrier."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators import sketches as sk
from transmogrifai_spark.operators.rollup import hierarchical_rollup
from transmogrifai_spark.serving import murmur3
from transmogrifai_spark.sources.tables import load_table


# ---------------------------------------------------------------- murmur3

def test_murmur3_matches_spark_hash(spark):
    strs = ["", "a", "abc", "abcd", "abcde", "héllo wörld", "x" * 100]
    rows = (spark.createDataFrame([(s,) for s in strs], ["s"])
            .select("s", F.hash("s").alias("h")).collect())
    for r in rows:
        assert murmur3.hash_string(r["s"], 42) == r["h"]


def test_murmur3_hash_long_matches_spark(spark):
    vals = [0, 1, -1, 42, 2**40, -(2**40), 2**62]
    rows = (spark.createDataFrame([(v,) for v in vals], "v long")
            .select("v", F.hash("v").alias("h")).collect())
    for r in rows:
        assert murmur3.hash_long(r["v"], 42) == r["h"]


# ---------------------------------------------------------------- HLL

def test_hll_merge_of_partials_equals_direct_sketch(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # partials at (event_type, user bucket), merged to event_type
    part = sk.hll_partial(
        ev.withColumn("b", F.col("user_id") % 7),
        ["event_type", "b"], "user_id")
    merged = (sk.hll_merge(part, ["event_type"])
              .select("event_type", sk.hll_estimate("hll").alias("est")))
    direct = (sk.hll_partial(ev, ["event_type"], "user_id")
              .select("event_type", sk.hll_estimate("hll").alias("est")))
    m = {r["event_type"]: r["est"] for r in merged.collect()}
    d = {r["event_type"]: r["est"] for r in direct.collect()}
    assert m == d  # register-max union == single-pass sketch, exactly


def test_hll_estimate_within_error(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    est = (sk.hll_partial(ev, ["event_type"], "user_id", lg_k=12)
           .select("event_type", sk.hll_estimate("hll").alias("est")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n"))
    joined = {r["event_type"]: (r["est"], r["n"])
              for r in est.join(exact, "event_type").collect()}
    assert joined
    for est_v, n in joined.values():
        assert abs(est_v - n) <= max(3, 0.05 * n)


# ---------------------------------------------------------------- CMS

def test_cms_decode_matches_true_counts_on_skewed_data(spark):
    # few heavy keys, sketch wide enough that estimates are exact
    df = spark.range(0, 5000).select(
        (F.col("id") % 8).alias("k_long"),
        F.concat(F.lit("key"), (F.col("id") % 8).cast("string")).alias("k_str"))
    for col, items in [("k_long", list(range(8))),
                       ("k_str", [f"key{i}" for i in range(8)])]:
        cms = sk.cms_collect(df, col, eps=0.001, confidence=0.99, seed=17)
        assert cms.total == 5000
        for it in items:
            true = 625
            assert true <= cms.estimate(it) <= true + 5  # one-sided
        assert cms.estimate(999999 if col == "k_long" else "nope") <= \
            0.001 * cms.total * 2


def test_cms_partial_merge_is_byte_identical_to_full(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 13).alias("v"), (F.col("id") % 2).alias("half"))
    parts = sk.cms_partial(df, ["half"], "v", eps=0.01, seed=5).collect()
    merged = sk.CountMinSketch.from_bytes(bytes(parts[0]["cms"])).merge(
        sk.CountMinSketch.from_bytes(bytes(parts[1]["cms"])))
    full = sk.cms_collect(df, "v", eps=0.01, seed=5)
    assert merged.to_bytes() == full.to_bytes()


def test_cms_merge_rejects_mismatched_seed(spark):
    df = spark.range(0, 100).select(F.col("id").alias("v"))
    a = sk.cms_collect(df, "v", eps=0.01, seed=1)
    b = sk.cms_collect(df, "v", eps=0.01, seed=2)
    with pytest.raises(ValueError):
        a.merge(b)


# ---------------------------------------------------------------- KMV

def test_kmv_exact_when_underfull_and_close_when_full(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    # k larger than any group's distinct count -> exact
    big = sk.kmv_partial(ev, ["event_type"], "user_id", k=100_000)
    est = {r["event_type"]: r["e"] for r in big.select(
        "event_type", sk.kmv_estimate("kmv", 100_000).alias("e")).collect()}
    assert {k: int(v) for k, v in est.items()} == exact
    # k = 256 -> within ~4 std errors (1/sqrt(k) ~ 6.3%)
    small = sk.kmv_partial(ev, ["event_type"], "user_id", k=256)
    est2 = {r["event_type"]: r["e"] for r in small.select(
        "event_type", sk.kmv_estimate("kmv", 256).alias("e")).collect()}
    for k, v in est2.items():
        assert abs(v - exact[k]) <= max(4, 0.25 * exact[k])


def test_kmv_merge_equals_direct_sketch(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    part = sk.kmv_partial(
        ev.withColumn("b", F.col("user_id") % 5),
        ["event_type", "b"], "user_id", k=128)
    merged = sk.kmv_merge(part, ["event_type"], k=128)
    direct = sk.kmv_partial(ev, ["event_type"], "user_id", k=128)
    m = {r["event_type"]: r["kmv"] for r in merged.collect()}
    d = {r["event_type"]: r["kmv"] for r in direct.collect()}
    assert m == d  # k-smallest-of-union is order/layout invariant


def test_kmv_overlap_estimates_intersection(spark):
    # A = 0..3999, B = 2000..5999 -> |A∩B| = 2000, |A∪B| = 6000, J = 1/3
    a = spark.range(0, 4000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    sks = sk.kmv_partial(a.union(b), ["g"], "v", k=512).collect()
    by = {r["g"]: r["kmv"] for r in sks}
    row = (a.sparkSession.createDataFrame([(by["a"], by["b"])],
                                          "a array<double>, b array<double>")
           .select(sk.kmv_overlap("a", "b", 512).alias("o"))
           .collect()[0]["o"])
    assert abs(row["jaccard"] - 1 / 3) < 0.1
    assert abs(row["union_est"] - 6000) < 600
    assert abs(row["intersection_est"] - 2000) < 450


# ---------------------------------------------------------------- theta

def test_theta_merge_matches_direct_and_overlap_algebra(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    part = sk.theta_partial(
        ev.withColumn("b", F.col("user_id") % 4), ["event_type", "b"],
        "user_id")
    merged = (sk.theta_merge(part, ["event_type"])
              .select("event_type", sk.theta_estimate("theta").alias("e")))
    exact = {r["event_type"]: r["n"] for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for r in merged.collect():
        assert abs(r["e"] - exact[r["event_type"]]) <= \
            max(3, 0.05 * exact[r["event_type"]])


def test_theta_overlap_intersection_difference(spark):
    # A = 0..3999, B = 2000..5999: ∩=2000, ∪=6000, A∖B=2000
    a = spark.range(0, 4000).select(F.lit("a").alias("g"), "id")
    b = spark.range(2000, 6000).select(F.lit("b").alias("g"), "id")
    sks = sk.theta_partial(a.union(b), ["g"], "id", lg_k=14).collect()
    by = {r["g"]: r["theta"] for r in sks}
    row = (spark.createDataFrame([(by["a"], by["b"])], "a binary, b binary")
           .select(sk.theta_overlap("a", "b").alias("o")).collect()[0]["o"])
    assert abs(row["union_est"] - 6000) <= 300
    assert abs(row["intersection_est"] - 2000) <= 300
    assert abs(row["a_not_b_est"] - 2000) <= 300


# ---------------------------------------------------------------- KLL

def test_kll_quantiles_merge_and_accuracy(spark):
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    part = sk.kll_partial(li, ["l_returnflag", "l_linestatus"],
                          "l_extendedprice")
    merged = sk.kll_merge(part, ["l_returnflag"])
    got = {r["l_returnflag"]: (r["p50"], r["n"]) for r in merged.select(
        "l_returnflag",
        sk.kll_quantile("kll", 0.5).alias("p50"),
        sk.kll_n("kll").alias("n")).collect()}
    exact = {r["l_returnflag"]: (r["p50"], r["n"]) for r in li.groupBy(
        "l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        F.count("l_extendedprice").alias("n")).collect()}
    assert set(got) == set(exact) and got
    for k, (p50, n) in got.items():
        assert n == exact[k][1]                      # n is exact
        # rank error ~1.65% at k=200 -> compare by rank, not value:
        # the sketch's p50 must sit within +-4% of the true rank
        total = exact[k][1]
        below = li.filter((F.col("l_returnflag") == k) &
                          (F.col("l_extendedprice") <= p50)).count()
        assert abs(below / total - 0.5) <= 0.04


def test_kll_rank_inverse_of_quantile(spark):
    df = spark.range(0, 10_000).select(F.col("id").cast("double").alias("v"))
    s = sk.kll_partial(df.withColumn("g", F.lit(1)), ["g"], "v")
    row = s.select(sk.kll_rank("kll", 2500.0).alias("r"),
                   sk.kll_quantile("kll", 0.25).alias("q")).collect()[0]
    assert abs(row["r"] - 0.25) <= 0.02
    assert abs(row["q"] - 2500.0) <= 10_000 * 0.02


def test_kll_rejects_unknown_type(spark):
    with pytest.raises(ValueError):
        sk.kll_partial(spark.range(1), [], "id", value_type="decimal")


# ---------------------------------------------------------------- rollup

def test_rollup_approx_distinct_carrier(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    hour, day = 3_600_000, 86_400_000
    out = hierarchical_rollup(
        ev, "ts_ms", [hour, day], ["event_type"],
        {"n": ("count", None), "u": ("approx_distinct", "user_id"),
         "p95": ("approx_quantile:0.95", "value")})
    daily = out[day]
    # daily HLL == direct daily sketch (partial-merge exactness)
    t = F.col("ts_ms")
    direct = (ev.groupBy((t - t % F.lit(day)).alias("bucket_start_ms"),
                         "event_type")
              .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
              .select("bucket_start_ms", "event_type",
                      F.hll_sketch_estimate("s").cast("long").alias("u")))
    got = {(r["bucket_start_ms"], r["event_type"]): r["u"]
           for r in daily.collect()}
    want = {(r["bucket_start_ms"], r["event_type"]): r["u"]
            for r in direct.collect()}
    assert got == want and got


def test_kmv_portable_mode_estimates(spark):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    port = sk.kmv_partial(docs, ["lang"], "text", k=64, portable=True)
    est = {r["lang"]: r["e"] for r in port.select(
        "lang", sk.kmv_estimate("kmv", 64).alias("e")).collect()}
    exact = {r["lang"]: r["n"] for r in docs.groupBy("lang")
             .agg(F.countDistinct("text").alias("n")).collect()}
    for lang, n in exact.items():
        if n < 64:
            assert est[lang] == float(n)        # underfull -> exact
        else:
            assert abs(est[lang] - n) <= 0.5 * n  # k=64 -> coarse but sane


# ---------------------------------------------------------------- top-k

def test_top_k_by_group_exact_and_min_count_invariant(spark):
    from transmogrifai_spark.util import top_k_by_group

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    top = top_k_by_group(ev, ["event_type"], "user_id", k=3)
    rows = top.collect()
    # python oracle
    import collections
    cnt = collections.Counter(
        (r["event_type"], r["user_id"]) for r in ev.collect())
    by_g = {}
    for (g, u), n in cnt.items():
        by_g.setdefault(g, []).append((-n, u))
    want = {g: sorted(v)[:3] for g, v in by_g.items()}
    got = {}
    for r in rows:
        got.setdefault(r["event_type"], []).append(
            (-r["item_count"], r["user_id"]))
    assert {g: sorted(v) for g, v in got.items()} == want
    # min_count prefilter cannot change the answer while k items survive
    pruned = top_k_by_group(ev, ["event_type"], "user_id", k=3, min_count=2)
    got2 = sorted(map(tuple, pruned.collect()))
    full_ge2 = sorted(t for t in map(tuple, rows) if t[2] >= 2)
    assert got2 == full_ge2


def test_murmur3_matches_spark_hash_randomized(spark):
    """Randomized JVM-parity: 300 random byte-mix strings (incl. non-ASCII
    and 1-3 byte tails) hashed in ONE Spark roundtrip vs the vendored
    murmur3."""
    import random
    rng = random.Random(99)
    pool = "abcXYZ 0123é中\U0001F600\n\t"
    strs = ["".join(rng.choice(pool) for _ in range(rng.randrange(0, 40)))
            for _ in range(300)]
    rows = (spark.createDataFrame([(s,) for s in strs], ["s"])
            .select("s", F.hash("s").alias("h")).collect())
    for r in rows:
        assert murmur3.hash_string(r["s"], 42) == r["h"], repr(r["s"])


# ---------------------------------------------------------------- profiler

def test_profile_one_pass_matches_direct(spark):
    from transmogrifai_spark.operators.profile import profile

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    p = profile(li, ["l_quantity", "l_returnflag", "l_shipdate"])
    n = li.count()
    assert p["l_quantity"]["count"] == n
    assert p["l_quantity"]["null_count"] == 0
    direct = li.agg(F.min("l_quantity"), F.max("l_quantity"),
                    F.avg("l_quantity")).collect()[0]
    assert p["l_quantity"]["min"] == direct[0]
    assert p["l_quantity"]["max"] == direct[1]
    assert abs(p["l_quantity"]["mean"] - direct[2]) < 1e-9
    true_p50 = li.selectExpr("percentile(l_quantity, 0.5) p").collect()[0]["p"]
    lo, hi = li.selectExpr("percentile(l_quantity, 0.46) p").collect()[0]["p"], \
        li.selectExpr("percentile(l_quantity, 0.54) p").collect()[0]["p"]
    assert lo <= p["l_quantity"]["p50"] <= hi or \
        p["l_quantity"]["p50"] == true_p50
    nd = li.select("l_returnflag").distinct().count()
    assert abs(p["l_returnflag"]["approx_distinct"] - nd) <= max(1, 0.05 * nd)
    assert p["l_returnflag"]["min_length"] == 1
    assert p["l_shipdate"]["min"] is not None
    # the whole profile is ONE job: re-profile everything and check it runs
    full = profile(li)
    assert set(full) == set(li.columns)


def test_stratified_fixed_sample(spark):
    from transmogrifai_spark.llm.curation import stratified_fixed_sample

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = stratified_fixed_sample(docs, "lang", "doc_id", 30)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {g: min(30, s) for g, s in sizes.items()}
    # deterministic across layouts
    again = stratified_fixed_sample(docs.repartition(13), "lang", "doc_id", 30)
    assert sorted(r["doc_id"] for r in again.collect()) == \
        sorted(r["doc_id"] for r in out.collect())


# ---------------------------------------------------------------- KLL decode

def test_kll_python_decode_matches_jvm(spark):
    from transmogrifai_spark.serving.kll import KllSketch

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    part = sk.kll_partial(li, ["l_returnflag"], "l_extendedprice")
    ranks = [0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    jvm = part.select(
        "l_returnflag", "kll",
        *[sk.kll_quantile("kll", q).alias(f"q{i}")
          for i, q in enumerate(ranks)],
        sk.kll_n("kll").alias("n")).collect()
    for r in jvm:
        s = KllSketch.from_bytes(bytes(r["kll"]))
        assert s.n == r["n"]
        for i, q in enumerate(ranks):
            assert s.quantile(q) == r[f"q{i}"], (r["l_returnflag"], q)


def test_kll_python_decode_edge_formats(spark):
    from transmogrifai_spark.serving.kll import KllSketch

    # single item
    one = spark.createDataFrame([(7.5,)], "v double").agg(
        F.kll_sketch_agg_double("v", F.lit(200)).alias("s")).collect()[0]["s"]
    s1 = KllSketch.from_bytes(bytes(one))
    assert s1.n == 1 and s1.quantile(0.5) == 7.5
    # bigint variant — query the SAME serialized sketch (construction is
    # randomized; a re-aggregation is a different sketch)
    big = spark.range(0, 5000).agg(
        F.kll_sketch_agg_bigint("id", F.lit(200)).alias("s")).collect()[0]["s"]
    sb = KllSketch.from_bytes(bytes(big), item_type="bigint")
    jvm = spark.createDataFrame([(bytes(big),)], "s binary").select(
        F.kll_sketch_get_quantile_bigint("s", F.lit(0.5)).alias("q")
    ).collect()[0]["q"]
    assert sb.quantile(0.5) == jvm


# ------------------------------------------------- frequent items (MG)

def _freq_truth(df, group_cols, item_col):
    rows = (df.groupBy(*group_cols, F.col(item_col).cast("string").alias("i"))
            .count().collect())
    truth = {}
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        truth.setdefault(g, {})[r["i"]] = r["count"]
    return truth


def test_freq_partial_bounds_law(spark):
    """MG invariant on a compressed partial (k << distinct): for every item,
    stored <= true <= stored + err; absent items have true <= err."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = ev.select((F.col("user_id") % 3).alias("g"),
                   (F.col("event_id") % 23).alias("item"))
    part = sk.freq_partial(df, ["g"], "item", k=5)
    truth = _freq_truth(df, ["g"], "item")
    got = {(r["g"],): (dict(r["items"]), r["err"], r["n"]) for r in part.collect()}
    assert set(got) == set(truth)
    for g, (items, err, n) in got.items():
        assert len(items) <= 5 and err > 0  # 23 distinct => genuinely compressed
        assert n == sum(truth[g].values())
        for i, true_c in truth[g].items():
            stored = items.get(i, 0)
            assert stored <= true_c <= stored + err, (g, i)


def test_freq_merge_bounds_and_capture(spark):
    """Merging per-slice partials keeps the MG bounds, and every item whose
    true count exceeds the merged err is guaranteed present."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # skew: event_type has few hot values; slice by day so merge is real
    df = ev.select((F.col("user_id") % 2).alias("g"),
                   F.to_date("ts").alias("slice"),
                   F.col("event_type").alias("item"),
                   (F.col("event_id") % 29).alias("noise"))
    mixed = df.select("g", "slice",
                      F.when(F.col("noise") < 8, F.concat(F.lit("n"), F.col("noise")))
                       .otherwise(F.col("item")).alias("item"))
    part = sk.freq_partial(mixed, ["g", "slice"], "item", k=4)
    merged = sk.freq_merge(part, ["g"], k=4)
    truth = _freq_truth(mixed, ["g"], "item")
    got = {(r["g"],): (dict(r["items"]), r["err"], r["n"]) for r in merged.collect()}
    assert set(got) == set(truth)
    for g, (items, err, n) in got.items():
        assert n == sum(truth[g].values())
        for i, true_c in truth[g].items():
            stored = items.get(i, 0)
            assert stored <= true_c <= stored + err, (g, i)
            if true_c > err:
                assert i in items, (g, i)  # capture guarantee


def test_freq_exact_regime_and_parquet_roundtrip(spark, tmp_path):
    """distinct <= k at every stage => err == 0 and counts EXACT, including
    a merge over parquet-persisted partials (the daily-partials shape)."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    part = sk.freq_partial(
        ev.select(F.to_date("ts").alias("slice"), "event_type"),
        ["slice"], "event_type", k=64)
    p = str(tmp_path / "freq_partials")
    part.write.mode("overwrite").parquet(p)
    merged = sk.freq_merge(spark.read.parquet(p).withColumn("all", F.lit(1)),
                           ["all"], k=64)
    row = merged.collect()[0]
    assert row["err"] == 0
    truth = {r["event_type"]: r["count"]
             for r in ev.groupBy("event_type").count().collect()}
    assert dict(row["items"]) == truth and row["n"] == sum(truth.values())


def test_freq_heavy_hitters_complete(spark):
    """Every true phi-heavy item is in the candidate set (no false
    negatives); candidates are bounded by the stored top-k."""
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    df = ev.select(F.lit(1).alias("g"), F.col("event_type").alias("item"),
                   F.to_date("ts").alias("slice"))
    part = sk.freq_partial(df, ["g", "slice"], "item", k=3)
    merged = sk.freq_merge(part, ["g"], k=3)
    phi = 0.2
    cands = {r["item"] for r in
             sk.freq_heavy_hitters(merged, ["g"], phi).collect()}
    truth = _freq_truth(df, ["g"], "item")[(1,)]
    n = sum(truth.values())
    err = merged.collect()[0]["err"]
    # the guarantee: an item can only be missed if its true count is within
    # the tracked error bound (absent => true <= err)
    hit = [i for i, c in truth.items() if c >= phi * n]
    assert hit  # the fixture has real heavies
    for i in hit:
        if truth[i] > err:
            assert i in cands, i
    # and with a summary wide enough that err < phi*n, completeness is total
    part_w = sk.freq_partial(df, ["g", "slice"], "item", k=16)
    merged_w = sk.freq_merge(part_w, ["g"], k=16)
    assert merged_w.collect()[0]["err"] < phi * n
    cands_w = {r["item"] for r in
               sk.freq_heavy_hitters(merged_w, ["g"], phi).collect()}
    assert set(hit) <= cands_w


def test_freq_estimate_expr(spark):
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    part = sk.freq_partial(ev.select(F.lit(1).alias("g"), "event_type"),
                           ["g"], "event_type", k=2)
    r = part.select(
        sk.freq_estimate("items", "err", F.lit("purchase")).alias("e"),
        sk.freq_estimate("items", "err", F.lit("__absent__")).alias("a"),
        "err").collect()[0]
    true_c = ev.where(F.col("event_type") == "purchase").count()
    assert r["e"]["lb"] <= true_c <= r["e"]["ub"]
    assert r["a"]["lb"] == 0 and r["a"]["ub"] == r["err"]


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def _bloom_py(values, m, k):
    """Pure-python mirror of the portable Bloom bit math."""
    import hashlib
    bits = set()
    for v in values:
        for i in range(k):
            h = int(hashlib.md5(f"{v}#{1000 + i}".encode()).hexdigest()[:15],
                    16)
            bits.add(h % m)
    return bits


def _bloom_py_contains(bits, v, m, k):
    import hashlib
    return all(
        int(hashlib.md5(f"{v}#{1000 + i}".encode()).hexdigest()[:15], 16) % m
        in bits for i in range(k))


def test_bloom_no_false_negatives_and_python_mirror(spark):
    from transmogrifai_spark.operators.sketches import (bloom_partial,
                                                        bloom_probe)
    m, k = 512, 3
    vals = [f"v{i}" for i in range(60)]
    probes = vals + [f"absent{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    pr = spark.createDataFrame([(v,) for v in probes], "value string")
    bloom = bloom_partial(df, [], "value", m, k, portable=True)
    got = {r["value"]: r["might_contain"]
           for r in bloom_probe(pr, bloom, "value", m, k,
                                portable=True).collect()}
    # members: never false
    assert all(got[v] for v in vals)
    # every probe (member or not) matches the pure-python bit math exactly
    bits = _bloom_py(vals, m, k)
    assert got == {p: _bloom_py_contains(bits, p, m, k) for p in probes}
    # false positives exist at this density but stay near the expected rate
    fps = sum(got[p] for p in probes if p.startswith("absent"))
    assert 0 < fps < 200 * 0.5


def test_bloom_merge_equals_oneshot_and_parquet_roundtrip(spark, tmp_path):
    from transmogrifai_spark.operators.sketches import (bloom_merge,
                                                        bloom_partial,
                                                        bloom_probe)
    from pyspark.sql import functions as F
    m, k = 1024, 4
    df = spark.range(300).select(
        F.concat(F.lit("x"), F.col("id")).alias("value"),
        (F.col("id") % 3).alias("slice"))
    parts = bloom_partial(df, ["slice"], "value", m, k)
    p = str(tmp_path / "bloom_parts")
    parts.write.mode("overwrite").parquet(p)
    merged = bloom_merge(
        spark.read.parquet(p).drop("slice").withColumn("g", F.lit(1)), ["g"]
    ).drop("g")
    oneshot = bloom_partial(df, [], "value", m, k)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, oneshot.collect()))
    # fast (xxhash) path: members never false through the merged bitmap
    got = bloom_probe(df.select("value"), merged, "value", m, k).collect()
    assert all(r["might_contain"] for r in got)


def test_bloom_fpp_bound(spark):
    from transmogrifai_spark.operators.sketches import (bloom_fpp,
                                                        bloom_partial,
                                                        bloom_probe)
    from pyspark.sql import functions as F
    m, k, n = 4096, 3, 400
    df = spark.range(n).select(F.concat(F.lit("m"), F.col("id")).alias("v"))
    absent = spark.range(2000).select(
        F.concat(F.lit("zz"), F.col("id")).alias("v"))
    bloom = bloom_partial(df, [], "v", m, k)
    got = bloom_probe(absent, bloom, "v", m, k).collect()
    rate = sum(r["might_contain"] for r in got) / len(got)
    expected = bloom_fpp(m, k, n)
    assert rate < 4 * expected and expected < 0.1


def test_stream_bloom_partials_equals_batch(spark, sf_dir, tmp_path):
    """Streaming bloom maintenance over a real multi-file split == the
    one-shot batch bitmap (bit_or idempotence makes append-only exact)."""
    from pyspark.sql import functions as F

    from transmogrifai_spark.operators.sketches import (bloom_merge,
                                                        bloom_partial)
    from transmogrifai_spark.streaming.windows import stream_bloom_partials
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source")
    src = str(tmp_path / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    store = str(tmp_path / "bloom")
    q = stream_bloom_partials(
        stream, store, "source", m=2048, k=3,
        checkpoint=str(tmp_path / "ck"))
    q.awaitTermination()
    folded = bloom_merge(
        spark.read.parquet(store).withColumn("g", F.lit(1)), ["g"]).drop("g")
    oneshot = bloom_partial(docs, [], "source", 2048, 3)
    assert sorted(map(tuple, folded.collect())) == \
        sorted(map(tuple, oneshot.collect()))


def test_bloom_probe_plan_is_broadcast_join(spark):
    """Scale law: the probe side never shuffles raw — the word table rides
    a BroadcastHashJoin and the per-value regroup partial-aggregates."""
    from pyspark.sql import functions as F

    from transmogrifai_spark.operators.sketches import (bloom_partial,
                                                        bloom_probe)
    df = spark.range(500).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    bloom = bloom_partial(df, [], "v", 4096, 3)
    plan = bloom_probe(df, bloom, "v", 4096, 3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_probe_duplicate_probe_rows_no_false_negative(spark):
    """Advisory r6: a probe frame with DUPLICATE (id, value) rows must not
    report false negatives — d duplicates yield d*k hit rows, which the old
    first(_npos)=k comparison rejected. Membership is now judged against
    the group's total row count, so duplicates are harmless."""
    from pyspark.sql import functions as F

    from transmogrifai_spark.operators.sketches import (bloom_partial,
                                                        bloom_probe)
    m, k = 512, 3
    vals = [f"v{i}" for i in range(40)]
    df = spark.createDataFrame([(v,) for v in vals], "value string")
    bloom = bloom_partial(df, [], "value", m, k, portable=True)
    # each member probed 3x, each absent value 2x
    pr = spark.createDataFrame(
        [(v,) for v in vals * 3] + [(f"absent{i}",) for i in range(80)] * 2,
        "value string")
    got = {r["value"]: r["might_contain"]
           for r in bloom_probe(pr, bloom, "value", m, k,
                                portable=True).collect()}
    assert all(got[v] for v in vals)           # NO false negatives
    assert len(got) == 40 + 80                 # one row per distinct value
    # duplicated probes agree with the single-probe run exactly
    single = {r["value"]: r["might_contain"]
              for r in bloom_probe(pr.distinct(), bloom, "value", m, k,
                                   portable=True).collect()}
    assert got == single
