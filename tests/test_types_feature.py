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


def test_all_types_constructible_and_mapped():
    """Every registered logical type builds a raw feature, maps to a physical
    Spark type, and has a coherent empty default (FeatureTypeDefaults
    parity)."""
    from transmogrifai_spark.types import empty_value
    for name, t in REGISTRY.items():
        f = raw_feature(f"col_{name}", name)
        assert f.type_tag is t
        assert t.spark_type.simpleString()  # physical mapping exists
        ev = empty_value(t)
        if t.is_map:
            assert ev == {}
        elif t.is_list:
            assert ev == []
        elif t.name == "RealNN" or (t.non_nullable and t.is_numeric):
            assert ev == 0.0
        else:
            assert ev is None
        assert isinstance(t.default_aggregator, str)


def test_scalar_types_transmogrify(spark):
    """Every scalar (non-collection) type dispatches through transmogrify."""
    from transmogrifai_spark.operators.vectorizers import transmogrify
    from transmogrifai_spark.workflow import Workflow
    scalar_types = [n for n, t in REGISTRY.items()
                    if not t.is_list and not t.is_map and n != "Prediction"]
    cols, overrides = [], {}
    for i, n in enumerate(scalar_types):
        t = REGISTRY[n]
        cols.append(f"c{i} {t.spark_type.simpleString()}")
        overrides[f"c{i}"] = n
    row = []
    for n in scalar_types:
        t = REGISTRY[n]
        st = t.spark_type.simpleString()
        row.append({"double": 1.5, "bigint": 3, "boolean": True,
                    "string": "v"}.get(st))
    df = spark.createDataFrame([tuple(row)] * 20, ", ".join(cols))
    from transmogrifai_spark.feature import from_dataframe
    feats = from_dataframe(df, overrides=overrides)
    vec = transmogrify(list(feats.values()), top_k=3, min_support=1)
    out = Workflow([vec]).fit(df).score(df, keep_intermediate=True)
    v = out.select("features").first()["features"]
    assert len(v) > len(scalar_types)  # every column contributed slots


def test_semantic_sniffing(spark):
    from transmogrifai_spark.feature import from_dataframe
    rows = [(f"user{i}@corp.io", f"https://x.io/{i}", "(415) 555-26%02d" % (i % 99),
             ["a", "b", "c"][i % 3], f"free text number {i} with words")
            for i in range(100)]
    df = spark.createDataFrame(rows, "email string, url string, phone string, "
                                     "seg string, note string")
    feats = from_dataframe(df, infer_semantic=True)
    assert feats["email"].type_tag.name == "Email"
    assert feats["url"].type_tag.name == "URL"
    assert feats["phone"].type_tag.name == "Phone"
    assert feats["seg"].type_tag.name == "PickList"
    assert feats["note"].type_tag.name == "Text"
    # explicit overrides still win
    feats2 = from_dataframe(df, infer_semantic=True, overrides={"email": "ID"})
    assert feats2["email"].type_tag.name == "ID"
