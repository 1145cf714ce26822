"""Loader contract for the driver testdata (TESTDATA.md), esp. the events
``ts`` column whose physical parquet type has changed across testdata
generations (TIMESTAMP(NANOS) → timestamp[us]). ``normalize_events`` must be
schema-driven so a re-spec fails loudly HERE, not as silent garbage in 11
downstream queries (the round-3 regression)."""
import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transmogrifai_spark.sources.tables import load_table, normalize_events

# the synthetic events table spans January 2024 (all scale factors)
LO_MS = int(datetime.datetime(2023, 12, 31, tzinfo=datetime.timezone.utc).timestamp() * 1000)
HI_MS = int(datetime.datetime(2024, 2, 2, tzinfo=datetime.timezone.utc).timestamp() * 1000)


def test_events_ts_ms_in_expected_epoch_range(spark, sf_dir):
    """If the driver re-specs the parquet encoding again, this is the one
    test that must fail first — exact epoch-ms bounds on the loaded table."""
    ev = load_table(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    assert dict(ev.dtypes)["ts_ms"] == "bigint"
    row = ev.agg(F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi"),
                 F.count(F.lit(1)).alias("n")).first()
    assert row["n"] > 0
    assert LO_MS < row["lo"] <= row["hi"] < HI_MS
    # ts and ts_ms must describe the same instant (ms truncation of micros)
    bad = ev.where(F.expr("unix_micros(ts) div 1000") != F.col("ts_ms")).count()
    assert bad == 0


def test_normalize_events_all_physical_forms(spark):
    """One wall-clock instant, three physical encodings, identical output."""
    micros = 1_704_067_200_123_456  # 2024-01-01T00:00:00.123456Z
    expect_ms = micros // 1000

    as_nanos = spark.range(1).select(F.lit(micros * 1000).alias("ts"))
    as_ts = spark.range(1).select(F.timestamp_micros(F.lit(micros)).alias("ts"))
    as_ntz = spark.range(1).select(
        F.to_timestamp_ntz(F.lit("2024-01-01 00:00:00.123456")).alias("ts"))

    for df in (as_nanos, as_ts, as_ntz):
        out = normalize_events(df).first()
        assert out["ts_ms"] == expect_ms
        assert out["ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)


def test_normalize_events_nanos_integer_exactness(spark):
    """Nanos beyond double's 2^53 exact range must not round-trip through a
    float: 1 µs deltas in the nanos must survive to the micros-truncated ts."""
    base_ns = 1_704_067_200_000_000_000
    rows = [(base_ns + 999_999_000,), (base_ns + 1_000_001_000,)]
    df = spark.createDataFrame(rows, "ts long")
    out = [r for r in normalize_events(df).orderBy("ts").collect()]
    assert out[0]["ts_ms"] == base_ns // 1_000_000 + 999
    assert out[1]["ts_ms"] == base_ns // 1_000_000 + 1000
    assert out[0]["ts"].microsecond == 999999
    assert out[1]["ts"] == datetime.datetime(2024, 1, 1, 0, 0, 1, 1)


def test_all_tables_expected_columns(spark, sf_dir):
    """Canary: the driver re-generates testdata between rounds and has
    re-specced physical types before (ts nanos -> micros). Pin the COLUMN
    CONTRACT (names + logical kind) for every table so any re-spec fails
    here, in one place, with a readable diff — not as 12 scattered red
    oracle rows."""
    from transmogrifai_spark.sources.tables import TABLES, load_table

    expected = {
        "region": {"r_regionkey": "int", "r_name": "str"},
        "nation": {"n_nationkey": "int", "n_name": "str",
                   "n_regionkey": "int"},
        "customer": {"c_custkey": "int", "c_name": "str",
                     "c_nationkey": "int", "c_acctbal": "num",
                     "c_mktsegment": "str"},
        "supplier": {"s_suppkey": "int", "s_name": "str",
                     "s_nationkey": "int", "s_acctbal": "num"},
        "part": {"p_partkey": "int", "p_name": "str", "p_brand": "str",
                 "p_type": "str", "p_size": "int", "p_retailprice": "num"},
        "orders": {"o_orderkey": "int", "o_custkey": "int",
                   "o_orderstatus": "str", "o_totalprice": "num",
                   "o_orderdate": "time", "o_orderpriority": "str"},
        "lineitem": {"l_orderkey": "int", "l_partkey": "int",
                     "l_suppkey": "int", "l_linenumber": "int",
                     "l_quantity": "num", "l_extendedprice": "num",
                     "l_discount": "num", "l_tax": "num",
                     "l_returnflag": "str", "l_linestatus": "str",
                     "l_shipdate": "time"},
        # events is loader-normalized: ts (instant) + derived ts_ms
        "events": {"event_id": "int", "ts": "time", "ts_ms": "int",
                   "user_id": "int", "event_type": "str", "value": "num",
                   "props": "str"},
        "documents": {"doc_id": "int", "text": "str", "lang": "str",
                      "source": "str", "n_chars": "int"},
        "embeddings": {"vec_id": "int", "embedding": "arr", "label": "int"},
    }

    def kind(dt):
        s = dt.simpleString()
        if s in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if s in ("float", "double") or s.startswith("decimal"):
            return "num"
        if s == "string":
            return "str"
        if s.startswith("timestamp") or s == "date":
            return "time"
        if s.startswith("array"):
            return "arr"
        return s

    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        got = {f.name: kind(f.dataType) for f in df.schema.fields}
        assert got == expected[t], f"{t} schema re-specced: {got}"
        assert df.count() > 0, t


def test_no_float_division_epoch_conversions_in_source():
    """Repo-wide invariant (ADVICE r4): epoch-unit conversions use integer
    `div`, never `/` — float division is exact only below 2^53 micros."""
    import pathlib
    import re
    root = pathlib.Path(__file__).resolve().parents[1] / "transmogrifai_spark"
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            if re.search(r"unix_(micros|millis)\([^)]*\)\s*/\s", line):
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert offenders == [], offenders
