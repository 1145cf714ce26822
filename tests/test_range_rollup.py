"""Bucketed range joins (sources/range_join.py) and hierarchical rollups
(operators/rollup.py): semantics vs direct SQL, plan laws for the scale
claims (hash join not nested-loop; coarse levels reuse finest partials)."""
import duckdb
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.operators.rollup import hierarchical_rollup
from transmogrifai_spark.sources.range_join import (interval_overlap_join,
                                                    point_in_interval_join)


@pytest.fixture(scope="module")
def ranges(spark):
    points = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(300)], "pid long, x long")
    intervals = spark.createDataFrame(
        [(j, (j * 91) % 900, (j * 91) % 900 + 5 + (j % 40)) for j in range(80)],
        "iid long, lo long, hi long")
    return points, intervals


def _duck(points, intervals, sql):
    con = duckdb.connect()
    con.execute("CREATE TABLE p(pid BIGINT, x BIGINT)")
    con.execute("CREATE TABLE iv(iid BIGINT, lo BIGINT, hi BIGINT)")
    con.executemany("INSERT INTO p VALUES (?,?)", points)
    con.executemany("INSERT INTO iv VALUES (?,?,?)", intervals)
    return sorted(con.execute(sql).fetchall())


def test_point_in_interval_matches_sql(spark, ranges):
    points, intervals = ranges
    for width in (8, 64, 1000):
        out = point_in_interval_join(points, intervals, "x", "lo", "hi",
                                     bucket_width=width)
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        want = _duck([tuple(r) for r in points.collect()],
                     [tuple(r) for r in intervals.collect()],
                     "SELECT pid, iid FROM p JOIN iv ON x BETWEEN lo AND hi")
        assert got == want, width


def test_point_in_interval_left_keeps_unmatched(spark, ranges):
    points, intervals = ranges
    out = point_in_interval_join(points, intervals, "x", "lo", "hi",
                                 bucket_width=32, how="left")
    matched = point_in_interval_join(points, intervals, "x", "lo", "hi",
                                     bucket_width=32).count()
    unmatched = out.where(F.col("iid").isNull()).count()
    assert out.count() == matched + unmatched
    assert out.select("pid").distinct().count() == 300


def test_interval_overlap_no_duplicate_pairs(spark, ranges):
    _, intervals = ranges
    a = intervals.toDF("aid", "alo", "ahi")
    b = intervals.toDF("bid", "blo", "bhi")
    out = interval_overlap_join(a, b, "alo", "ahi", "blo", "bhi",
                                bucket_width=16)
    got = sorted((r["aid"], r["bid"]) for r in out.collect())
    assert len(got) == len(set(got)), "multi-bucket pair double-counted"
    rows = [tuple(r) for r in intervals.collect()]
    want = sorted((x[0], y[0]) for x in rows for y in rows
                  if x[1] <= y[2] and y[1] <= x[2])
    assert got == want


def test_range_join_plan_is_hash_join(spark, ranges):
    """The bucketed plan must be an equi-join (hash/sort-merge), never the
    nested-loop the raw BETWEEN predicate produces."""
    points, intervals = ranges
    plan = point_in_interval_join(points, intervals, "x", "lo", "hi",
                                  bucket_width=32)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    naive = points.join(intervals, (F.col("x") >= F.col("lo")) &
                        (F.col("x") <= F.col("hi")))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" in naive or "CartesianProduct" in naive


def test_hierarchical_rollup_equals_direct(spark, sf_dir):
    """Every coarser level == a direct groupBy over the raw events at that
    resolution (the partial-merge law), on real testdata."""
    from transmogrifai_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    res = [3_600_000, 21_600_000, 86_400_000]          # 1h, 6h, 1d
    rolled = hierarchical_rollup(
        ev, "ts_ms", res, ["event_type"],
        {"n": ("count", None), "total": ("sum_exact", "value"),
         "vmin": ("min", "value"), "vmax": ("max", "value"),
         "vmean": ("mean", "value")})
    t = F.col("ts_ms")
    dec = F.col("value").cast("decimal(30,6)")
    for r in res:
        # direct single-pass with the SAME exact-decimal statistics: the law
        # under test is partial-merge correctness, so sums must be
        # order-independent on both sides
        direct = (ev.groupBy((t - (t % F.lit(r))).alias("bucket_start_ms"),
                             "event_type")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum(dec).alias("total"),
                       F.min("value").alias("vmin"),
                       F.max("value").alias("vmax"),
                       (F.sum(dec).cast("double") / F.count("value"))
                       .alias("vmean")))
        got = {(x["bucket_start_ms"], x["event_type"]):
               (x["n"], x["vmin"], x["vmax"], x["total"], x["vmean"])
               for x in rolled[r].collect()}
        want = {(x["bucket_start_ms"], x["event_type"]):
                (x["n"], x["vmin"], x["vmax"], x["total"], x["vmean"])
                for x in direct.collect()}
        assert got == want, r


def test_hierarchical_rollup_reuses_partials(spark, sf_dir):
    """Coarser levels read the persisted finest partials, not the events
    scan (InMemoryTableScan in the coarse plan once finest materialized)."""
    from transmogrifai_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rolled = hierarchical_rollup(ev, "ts_ms", [3_600_000, 86_400_000],
                                 ["event_type"], {"n": ("count", None)})
    rolled[3_600_000].count()   # materialize the persisted partials
    coarse_plan = rolled[86_400_000]._jdf.queryExecution() \
        .executedPlan().toString()
    # the executed access path is the cached partials (the lineage text in
    # AQE's "Initial Plan" section may still mention the original scan)
    assert "InMemoryTableScan" in coarse_plan


def test_hierarchical_rollup_validates_alignment(spark):
    df = spark.range(10).select(F.col("id").alias("t"),
                                F.lit("a").alias("k"))
    with pytest.raises(ValueError, match="multiple"):
        hierarchical_rollup(df, "t", [1000, 1500], ["k"],
                            {"n": ("count", None)})


def test_dimensional_rollup_levels_match_direct_and_native(spark, sf_dir):
    from pyspark.sql import functions as F

    from transmogrifai_spark.operators.rollup import dimensional_rollup
    from transmogrifai_spark.sources.tables import load_table

    cust = (load_table(spark, sf_dir, "customer")
            .join(load_table(spark, sf_dir, "nation"),
                  F.col("c_nationkey") == F.col("n_nationkey")))
    out = dimensional_rollup(
        cust, ["n_regionkey", "n_name", "c_mktsegment"],
        {"n": ("count", None), "bal": ("sum_exact", "c_acctbal"),
         "avg_bal": ("mean", "c_acctbal")})
    assert set(out) == {0, 1, 2, 3}
    # each level == direct groupBy on the raw frame
    for depth, cols in [(0, []), (1, ["n_regionkey"]),
                        (2, ["n_regionkey", "n_name"]),
                        (3, ["n_regionkey", "n_name", "c_mktsegment"])]:
        direct = cust.groupBy(*cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(30,6)")).alias("bal"),
            (F.sum(F.col("c_acctbal").cast("decimal(30,6)")).cast("double")
             / F.count("c_acctbal")).alias("avg_bal"))
        got = sorted(map(tuple, out[depth].collect()))
        want = sorted(map(tuple, direct.collect()))
        assert got == want, depth
    # and the union of levels == Spark's native rollup (modulo the level
    # marker): same grand total row count across grouping sets
    native_n = cust.rollup("n_regionkey", "n_name", "c_mktsegment") \
        .count().count()
    ours_n = sum(out[d].count() for d in out)
    assert ours_n == native_n


def test_incremental_rollup_partials_roundtrip(spark, sf_dir, tmp_path):
    """The continuous-aggregate law: persist per-day partials (parquet
    roundtrip included — sketch carriers are binary columns), merge across
    days + to a coarser resolution + to a coarser grouping, and the result
    equals a direct pass over all the raw events."""
    from pyspark.sql import functions as F

    from transmogrifai_spark.operators.rollup import (
        hierarchical_rollup, rollup_finalize, rollup_merge, rollup_partials)
    from transmogrifai_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hour, day = 3_600_000, 86_400_000
    stats = {"n": ("count", None), "total": ("sum_exact", "value"),
             "users": ("approx_distinct", "user_id"),
             "avg": ("mean", "value")}
    # split raw events into two halves (two "ingest batches")
    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    p = str(tmp_path / "partials")
    rollup_partials(h1, "ts_ms", hour, ["event_type"], stats) \
        .write.mode("append").parquet(p)
    rollup_partials(h2, "ts_ms", hour, ["event_type"], stats) \
        .write.mode("append").parquet(p)
    stored = spark.read.parquet(p)
    # merge across batches to daily, coarser grouping = [] (global)
    merged = rollup_merge(stored, day, [], stats)
    got = sorted(map(tuple, rollup_finalize(merged, [], stats).collect()))
    direct = hierarchical_rollup(ev, "ts_ms", [day], [], stats)[day]
    want = sorted(map(tuple, direct.collect()))
    assert got == want and got
