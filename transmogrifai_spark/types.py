"""Logical feature type system.

PySpark-native re-expression of the reference's 45-class feature type
hierarchy (reference: features/src/main/scala/com/salesforce/op/features/types/
FeatureType.scala:44, Numerics.scala, Text.scala, Maps.scala, Sets.scala,
Lists.scala, Geolocation.scala, OPVector.scala).

Design decision (SURVEY.md §1.2): the whole hierarchy collapses onto 8 physical
Spark SQL types; the *semantic* type only selects default operator behavior.
So here each logical type is a lightweight tag with:
  - its physical Spark DataType (the canonical mapping in the reference's
    FeatureSparkTypes.scala:55-117),
  - trait flags (NonNullable / Categorical / SingleResponse / MultiResponse /
    Location, cf. types/FeatureType.scala:122-155),
  - a default monoid aggregator name (MonoidAggregatorDefaults.scala:52-130),
consumed by transmogrify() dispatch and the reader aggregation planner.

The tag travels with the column via ``StructField.metadata['op_type']`` —
exactly the trick the reference uses for vector metadata
(FeatureSparkTypes.scala:569 ``toStructField``). No UDTs are needed; at 100 TB
the columns stay plain parquet-friendly primitives that Catalyst can prune and
push filters into.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass(frozen=True)
class FeatureTypeTag:
    """A logical feature type: semantic tag over a physical Spark type."""

    name: str
    spark_type: T.DataType
    parent: str | None = None  # semantic parent type (e.g. Email -> Text)
    non_nullable: bool = False
    categorical: bool = False
    location: bool = False
    multi_response: bool = False
    default_aggregator: str = "last"  # key into aggregators.MONOIDS

    @property
    def is_numeric(self) -> bool:
        return isinstance(self.spark_type, (T.DoubleType, T.LongType))

    @property
    def is_text(self) -> bool:
        return isinstance(self.spark_type, T.StringType)

    @property
    def is_map(self) -> bool:
        return isinstance(self.spark_type, T.MapType)

    @property
    def is_list(self) -> bool:
        return isinstance(self.spark_type, T.ArrayType)


_D = T.DoubleType()
_L = T.LongType()
_B = T.BooleanType()
_S = T.StringType()
_AS = T.ArrayType(T.StringType())
_AL = T.ArrayType(T.LongType())
_AD = T.ArrayType(T.DoubleType())


def _m(v: T.DataType) -> T.MapType:
    return T.MapType(T.StringType(), v)


# ---------------------------------------------------------------------------
# The 45 concrete types (reference file:line in SURVEY.md §1.2).
# ---------------------------------------------------------------------------
_TYPES: list[FeatureTypeTag] = [
    # numerics (types/Numerics.scala)
    FeatureTypeTag("Real", _D, default_aggregator="sum"),
    FeatureTypeTag("RealNN", _D, parent="Real", non_nullable=True, default_aggregator="sum"),
    FeatureTypeTag("Binary", _B, categorical=True, default_aggregator="logical_or"),
    FeatureTypeTag("Integral", _L, default_aggregator="sum"),
    FeatureTypeTag("Percent", _D, parent="Real", default_aggregator="mean"),
    FeatureTypeTag("Currency", _D, parent="Real", default_aggregator="sum"),
    FeatureTypeTag("Date", _L, parent="Integral", default_aggregator="max"),
    FeatureTypeTag("DateTime", _L, parent="Date", default_aggregator="max"),
    # text (types/Text.scala)
    FeatureTypeTag("Text", _S, default_aggregator="concat"),
    FeatureTypeTag("Email", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("Base64", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("Phone", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("ID", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("URL", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("TextArea", _S, parent="Text", default_aggregator="concat"),
    FeatureTypeTag("PickList", _S, parent="Text", categorical=True, default_aggregator="mode"),
    FeatureTypeTag("ComboBox", _S, parent="Text", categorical=True, default_aggregator="mode"),
    FeatureTypeTag("Country", _S, parent="Text", location=True, default_aggregator="mode"),
    FeatureTypeTag("State", _S, parent="Text", location=True, default_aggregator="mode"),
    FeatureTypeTag("PostalCode", _S, parent="Text", location=True, default_aggregator="mode"),
    FeatureTypeTag("City", _S, parent="Text", location=True, default_aggregator="mode"),
    FeatureTypeTag("Street", _S, parent="Text", location=True, default_aggregator="mode"),
    # collections
    FeatureTypeTag("OPVector", _AD, default_aggregator="vector_sum"),
    FeatureTypeTag("TextList", _AS, default_aggregator="concat_list"),
    FeatureTypeTag("DateList", _AL, default_aggregator="concat_list"),
    FeatureTypeTag("DateTimeList", _AL, parent="DateList", default_aggregator="concat_list"),
    FeatureTypeTag("MultiPickList", _AS, categorical=True, multi_response=True, default_aggregator="set_union"),
    FeatureTypeTag("Geolocation", _AD, location=True, default_aggregator="geo_midpoint"),
    # maps (types/Maps.scala)
    FeatureTypeTag("TextMap", _m(_S), default_aggregator="map_concat"),
    FeatureTypeTag("EmailMap", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("Base64Map", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("PhoneMap", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("IDMap", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("URLMap", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("TextAreaMap", _m(_S), parent="TextMap", default_aggregator="map_concat"),
    FeatureTypeTag("PickListMap", _m(_S), parent="TextMap", categorical=True, default_aggregator="map_mode"),
    FeatureTypeTag("ComboBoxMap", _m(_S), parent="TextMap", categorical=True, default_aggregator="map_mode"),
    FeatureTypeTag("BinaryMap", _m(_B), categorical=True, default_aggregator="map_logical_or"),
    FeatureTypeTag("IntegralMap", _m(_L), default_aggregator="map_sum"),
    FeatureTypeTag("RealMap", _m(_D), default_aggregator="map_sum"),
    FeatureTypeTag("PercentMap", _m(_D), parent="RealMap", default_aggregator="map_mean"),
    FeatureTypeTag("CurrencyMap", _m(_D), parent="RealMap", default_aggregator="map_sum"),
    FeatureTypeTag("DateMap", _m(_L), default_aggregator="map_max"),
    FeatureTypeTag("DateTimeMap", _m(_L), parent="DateMap", default_aggregator="map_max"),
    FeatureTypeTag("MultiPickListMap", _m(_AS), categorical=True, default_aggregator="map_set_union"),
    FeatureTypeTag("CountryMap", _m(_S), parent="TextMap", location=True, default_aggregator="map_concat"),
    FeatureTypeTag("StateMap", _m(_S), parent="TextMap", location=True, default_aggregator="map_concat"),
    FeatureTypeTag("CityMap", _m(_S), parent="TextMap", location=True, default_aggregator="map_concat"),
    FeatureTypeTag("PostalCodeMap", _m(_S), parent="TextMap", location=True, default_aggregator="map_concat"),
    FeatureTypeTag("StreetMap", _m(_S), parent="TextMap", location=True, default_aggregator="map_concat"),
    FeatureTypeTag("GeolocationMap", _m(_AD), location=True, default_aggregator="map_geo_midpoint"),
    FeatureTypeTag("NameStats", _m(_S), parent="TextMap"),
    FeatureTypeTag("Prediction", _m(_D), non_nullable=True),
]

REGISTRY: dict[str, FeatureTypeTag] = {t.name: t for t in _TYPES}


def tag(name: str) -> FeatureTypeTag:
    """Look up a logical type by name (raises KeyError with suggestions)."""
    try:
        return REGISTRY[name]
    except KeyError:
        close = [n for n in REGISTRY if n.lower() == name.lower()]
        raise KeyError(f"unknown feature type {name!r}" + (f"; did you mean {close[0]}?" if close else "")) from None


def empty_value(t: FeatureTypeTag | str):
    """Canonical empty value per type (types/FeatureTypeDefaults.scala):
    scalars -> None, collections -> empty list, maps -> empty dict,
    non-nullable numerics -> 0.0. Used by the local scoring path and the
    testkit's null-injection."""
    if isinstance(t, str):
        t = tag(t)
    if t.non_nullable and isinstance(t.spark_type, T.DoubleType):
        return 0.0
    if t.is_map:
        return {}
    if t.is_list:
        return []
    return None


def is_subtype(child: str, ancestor: str) -> bool:
    """Semantic subtype check along the `parent` chain (Email <: Text)."""
    cur: str | None = child
    while cur is not None:
        if cur == ancestor:
            return True
        cur = REGISTRY[cur].parent
    return False


# dtype -> default logical type, used by FeatureBuilder.from_dataframe
# (reference: FeatureBuilder.fromDataFrame, features/.../FeatureBuilder.scala:232).
_DTYPE_DEFAULTS: list[tuple[type, str]] = [
    (T.DoubleType, "Real"),
    (T.FloatType, "Real"),
    (T.DecimalType, "Real"),
    (T.BooleanType, "Binary"),
    (T.LongType, "Integral"),
    (T.IntegerType, "Integral"),
    (T.ShortType, "Integral"),
    (T.ByteType, "Integral"),
    (T.StringType, "Text"),
    (T.TimestampType, "DateTime"),
    (T.TimestampNTZType, "DateTime"),
    (T.DateType, "Date"),
]


def default_tag_for_dtype(dtype: T.DataType) -> FeatureTypeTag:
    for cls, name in _DTYPE_DEFAULTS:
        if isinstance(dtype, cls):
            return REGISTRY[name]
    if isinstance(dtype, T.ArrayType):
        el = dtype.elementType
        if isinstance(el, T.StringType):
            return REGISTRY["TextList"]
        if isinstance(el, (T.DoubleType, T.FloatType)):
            return REGISTRY["OPVector"]
        if isinstance(el, (T.LongType, T.IntegerType)):
            return REGISTRY["DateList"]
    if isinstance(dtype, T.MapType):
        v = dtype.valueType
        if isinstance(v, T.StringType):
            return REGISTRY["TextMap"]
        if isinstance(v, (T.DoubleType, T.FloatType)):
            return REGISTRY["RealMap"]
        if isinstance(v, (T.LongType, T.IntegerType)):
            return REGISTRY["IntegralMap"]
        if isinstance(v, T.BooleanType):
            return REGISTRY["BinaryMap"]
    raise ValueError(f"no default feature type for Spark dtype {dtype}")
