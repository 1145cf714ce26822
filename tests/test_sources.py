"""Reader layer: CSV/JSON/parquet sources, extraction, aggregate readers over
non-parquet formats (CSVReaders.scala / CSVAutoReaders.scala parity)."""
import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources.readers import (AggSpec, AggregateDataReader,
                                                 CutOffTime, DataReader)


@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("csv")
    f = p / "events.csv"
    f.write_text(
        "key,ts,amount,category\n"
        "a,2024-01-01T00:00:00,10.5,x\n"
        "a,2024-01-02T00:00:00,20.0,y\n"
        "b,2024-01-03T00:00:00,5.25,x\n")
    return str(p)


def test_csv_auto_reader_infers_schema(spark, csv_dir):
    """CSVAutoReader: header-driven schema inference."""
    df = DataReader(path=csv_dir, fmt="csv").read(spark)
    assert set(df.columns) == {"key", "ts", "amount", "category"}
    assert dict(df.dtypes)["amount"] == "double"


def test_csv_reader_explicit_schema(spark, csv_dir):
    """CSVReader: fixed schema (no inference jobs — the at-scale path)."""
    df = DataReader(path=csv_dir, fmt="csv",
                    schema="key string, ts timestamp, amount double, category string",
                    options={"header": "true"}).read(spark)
    assert df.schema["ts"].dataType.typeName() in ("timestamp", "timestamp_ntz")
    assert df.count() == 3


def test_csv_generate_extract(spark, csv_dir):
    """generateDataFrame: key extraction + per-feature extract expressions
    (DataReader.scala:174-207)."""
    r = DataReader(path=csv_dir, fmt="csv", key_col="key")
    out = r.generate(spark, extract={"amount2": "amount * 2", "cat_up": "upper(category)"})
    rows = {r2["key"]: r2 for r2 in out.collect()}
    assert out.columns == ["key", "amount2", "cat_up"]
    assert rows["b"]["amount2"] == 10.5 and rows["b"]["cat_up"] == "X"


def test_aggregate_reader_over_csv(spark, csv_dir):
    """AggregateCSVReader: the aggregation planner is source-agnostic."""
    r = AggregateDataReader(
        reader=DataReader(path=csv_dir, fmt="csv"),
        key_col="key", time_col="ts",
        cutoff=CutOffTime(timestamp="2024-01-05 00:00:00"),
        specs=[AggSpec("total", "amount", "sum"),
               AggSpec("cats", "category", "set_union")])
    rows = {x["key"]: x for x in r.generate(spark).collect()}
    assert rows["a"]["total"] == 30.5
    assert rows["a"]["cats"] == ["x", "y"]


def test_json_reader(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}\n')
    df = DataReader(path=str(tmp_path), fmt="json").read(spark)
    assert df.count() == 2
    assert df.agg(F.sum("v")).first()[0] == 6.0


def test_repartition_param(spark, csv_dir):
    """maybeRepartition (DataReader.scala:147-164)."""
    df = DataReader(path=csv_dir, fmt="csv", repartition=4).read(spark)
    assert df.rdd.getNumPartitions() == 4
