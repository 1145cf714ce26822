"""Type system + feature lineage (SURVEY.md §1.1-1.3 parity).

Reference conformance targets: features/src/test type tests — the 45-type
registry, trait flags, subtype dispatch, schema inference with response
carve-out, and graph-construction-time wiring validation."""
import pytest
from pyspark.sql import types as T

from transmogrifai_spark.feature import Feature, FeatureCycleError, raw_feature
from transmogrifai_spark.types import REGISTRY, default_tag_for_dtype, is_subtype, tag


def test_registry_has_45_types():
    assert len(REGISTRY) >= 45


def test_physical_types_collapse():
    kinds = {t.spark_type.simpleString() for t in REGISTRY.values()}
    # the whole hierarchy must collapse onto a small physical set
    assert kinds <= {
        "double", "boolean", "bigint", "string", "array<double>",
        "array<string>", "array<bigint>", "map<string,string>",
        "map<string,boolean>", "map<string,bigint>", "map<string,double>",
        "map<string,array<string>>", "map<string,array<double>>",
    }


def test_subtype_chain():
    assert is_subtype("Email", "Text")
    assert is_subtype("Currency", "Real")
    assert is_subtype("DateTime", "Integral")  # DateTime -> Date -> Integral
    assert not is_subtype("Text", "Email")
    assert not is_subtype("Real", "Integral")


def test_traits():
    assert tag("RealNN").non_nullable
    assert tag("PickList").categorical
    assert tag("Geolocation").location
    assert tag("MultiPickList").multi_response


def test_default_aggregators_follow_reference():
    # MonoidAggregatorDefaults.scala:52-130 dispatch
    assert tag("Currency").default_aggregator == "sum"
    assert tag("Binary").default_aggregator == "logical_or"
    assert tag("PickList").default_aggregator == "mode"
    assert tag("MultiPickList").default_aggregator == "set_union"


def test_dtype_inference():
    assert default_tag_for_dtype(T.DoubleType()).name == "Real"
    assert default_tag_for_dtype(T.StringType()).name == "Text"
    assert default_tag_for_dtype(T.ArrayType(T.FloatType())).name == "OPVector"
    assert default_tag_for_dtype(T.MapType(T.StringType(), T.LongType())).name == "IntegralMap"


def test_unknown_type_suggests():
    with pytest.raises(KeyError, match="PickList"):
        tag("picklist")


def test_type_validation_at_graph_time():
    f = raw_feature("x", "Currency")
    with pytest.raises(TypeError, match="subtype of Text"):
        f.require("Text")
    assert f.require("Real") is f


def test_from_dataframe_response_carveout(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, bal double")
    from transmogrifai_spark.feature import from_dataframe
    feats = from_dataframe(df, response="bal", overrides={"name": "PickList"})
    assert feats["bal"].is_response
    assert feats["name"].type_tag.name == "PickList"
    assert feats["id"].type_tag.name == "Integral"


def test_lineage_walks():
    from transmogrifai_spark.stages.base import unary
    a = raw_feature("a", "Real")
    b = unary("inc", a, "b", "Real", lambda c: c + 1)
    c = unary("dec", b, "c", "Real", lambda col: col - 1)
    assert [f.name for f in c.raw_features()] == ["a"]
    assert len(c.parent_stages()) == 2
