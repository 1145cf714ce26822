"""Fluent feature DSL — the reference's Rich*Feature surface
(core/src/main/scala/com/salesforce/op/dsl/RichFeature.scala:61-180,
RichNumericFeature.scala:70-165,377, RichTextFeature.scala, RichDateFeature.scala,
RichMapFeature.scala, RichSetFeature.scala, RichListFeature.scala — 3907 LoC of
sugar in the reference, SURVEY.md §2.10).

Wraps a Feature in ``F_(feat)`` (or use ``fluent(feats)`` over a whole
schema) and exposes chainable ops that build engine stages:

    feats = fluent(from_dataframe(df, overrides={...}))
    charge = (feats.price * (1 - feats.discount)).alias("charge")
    seg_vec = feats.segment.one_hot(top_k=10)
    label   = feats.status.exists(lambda c: c == "F")

Every method returns a new fluent wrapper; ``.f`` unwraps the Feature.
"""
from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as SF

from .feature import Feature
from .functions import math as X
from .functions import text as TX
from .functions.dates import time_period, unit_circle
from .stages.base import binary as _binary
from .stages.base import unary as _unary


class FluentFeature:
    __slots__ = ("f",)

    def __init__(self, f: Feature):
        self.f = f

    # -- generic row ops (RichFeature.scala:61-180) -------------------------
    def map(self, fn: Callable[[Column], Column], output: str | None = None,
            output_type: str | None = None) -> "FluentFeature":
        out = output or f"{self.f.name}_map"
        return FluentFeature(_unary("map", self.f, out,
                                    output_type or self.f.type_tag.name, fn))

    def replace_with(self, old, new, output: str | None = None) -> "FluentFeature":
        from .operators.filters import replace
        return FluentFeature(replace(self.f, old, new, output))

    def filter(self, pred: Callable[[Column], Column], default=None,
               output: str | None = None) -> "FluentFeature":
        from .operators.filters import filter_value
        return FluentFeature(filter_value(self.f, pred, default, output))

    def exists(self, pred: Callable[[Column], Column], output: str | None = None) -> "FluentFeature":
        from .operators.filters import exists
        return FluentFeature(exists(self.f, pred, output))

    def occurs(self, match=None, output: str | None = None) -> "FluentFeature":
        from .operators.filters import to_occur
        return FluentFeature(to_occur(self.f, match, output))

    def alias(self, name: str) -> "FluentFeature":
        from .operators.filters import alias
        return FluentFeature(alias(self.f, name))

    # -- numeric operators (RichNumericFeature.scala:70-165) ----------------
    def _arith(self, other, op_name, expr2, expr_scalar, out_suffix):
        if isinstance(other, FluentFeature):
            out = f"{self.f.name}_{out_suffix}_{other.f.name}"
            return FluentFeature(_binary(op_name, self.f, other.f, out, "Real", expr2))
        out = f"{self.f.name}_{out_suffix}"
        return FluentFeature(_unary(op_name, self.f, out, "Real",
                                    lambda c: expr_scalar(c, other)))

    def __add__(self, other):
        return self._arith(other, "add", X.add, lambda c, s: X.scalar_add(c, s), "plus")

    def __sub__(self, other):
        return self._arith(other, "subtract", X.subtract,
                           lambda c, s: X.scalar_subtract(c, s), "minus")

    def __mul__(self, other):
        return self._arith(other, "multiply", X.multiply,
                           lambda c, s: X.scalar_multiply(c, s), "times")

    def __truediv__(self, other):
        return self._arith(other, "divide", X.divide,
                           lambda c, s: X.scalar_divide(c, s), "div")

    def abs(self):
        return self.map(X.absolute, f"{self.f.name}_abs", "Real")

    def log(self, base: float = 2.718281828459045):
        return self.map(lambda c: X.log(c, base), f"{self.f.name}_log", "Real")

    def sqrt(self):
        return self.map(X.sqrt, f"{self.f.name}_sqrt", "Real")

    def z_normalize(self):
        """RichNumericFeature.scala:377 — fitted standard scaling."""
        from .operators.numeric import standard_scaler
        return FluentFeature(standard_scaler(self.f).output)

    def fill_missing_with_mean(self):
        from .operators.numeric import fill_missing_with_mean
        return FluentFeature(fill_missing_with_mean(self.f).output)

    def bucketize(self, splits: list[float], **kw):
        from .operators.numeric import numeric_bucketizer
        return FluentFeature(numeric_bucketizer(self.f, splits, **kw).output)

    # -- text (RichTextFeature.scala) ---------------------------------------
    def tokenize(self, **kw):
        out = f"{self.f.name}_tok"
        return FluentFeature(_unary("tokenize", self.f, out, "TextList",
                                    lambda c: TX.tokenize(c, **kw)))

    def to_email_domain(self):
        return self.map(TX.email_domain, f"{self.f.name}_domain", "Text")

    def to_email_prefix(self):
        return self.map(TX.email_prefix, f"{self.f.name}_prefix", "Text")

    def is_valid_email(self):
        return self.map(TX.is_valid_email, f"{self.f.name}_valid", "Binary")

    def to_url_domain(self):
        return self.map(TX.url_domain, f"{self.f.name}_domain", "Text")

    def indexed(self, **kw):
        from .operators.categorical import string_indexer
        return FluentFeature(string_indexer(self.f, **kw).output)

    def one_hot(self, **kw):
        from .operators.vectorizers import one_hot_estimator
        return FluentFeature(one_hot_estimator(self.f, **kw).output)

    # -- dates (RichDateFeature.scala:55-188) -------------------------------
    def to_time_period(self, period: str):
        out = f"{self.f.name}_{period.lower()}"
        return FluentFeature(_unary("timePeriod", self.f, out, "Integral",
                                    lambda c: time_period(c, period)))

    def to_unit_circle(self, period: str = "HourOfDay"):
        out = f"{self.f.name}_circle"
        return FluentFeature(_unary(
            "unitCircle", self.f, out, "OPVector",
            lambda c: SF.array(*unit_circle(c, period))))

    # -- maps (RichMapFeature.scala:91-1084) --------------------------------
    def map_get(self, key: str, output: str | None = None):
        from .functions.maps import map_get
        out = output or f"{self.f.name}_{key}"
        value_type = {"RealMap": "Real", "IntegralMap": "Integral",
                      "BinaryMap": "Binary"}.get(self.f.type_tag.name, "Text")
        return FluentFeature(_unary("mapGet", self.f, out, value_type,
                                    lambda c: map_get(c, key)))

    def filter_map(self, allow=None, block=None, clean_keys=False,
                   output: str | None = None):
        from .operators.filters import filter_map
        return FluentFeature(filter_map(self.f, allow, block, clean_keys, output))

    def map_values_set(self, output: str | None = None):
        from .functions.maps import map_to_multipicklist
        out = output or f"{self.f.name}_values"
        return FluentFeature(_unary("mapValues", self.f, out, "MultiPickList",
                                    map_to_multipicklist))

    def map_vectorize(self, **kw):
        from .operators.map_vectorizers import (real_map_vectorizer,
                                                text_map_pivot_vectorizer)
        if self.f.type_tag.name in ("RealMap", "IntegralMap", "CurrencyMap",
                                    "PercentMap"):
            return FluentFeature(real_map_vectorizer(self.f, **kw).output)
        return FluentFeature(text_map_pivot_vectorizer(self.f, **kw).output)

    # -- vectorization ------------------------------------------------------
    def vectorize(self, **kw):
        from .operators.vectorizers import transmogrify
        return FluentFeature(transmogrify([self.f], output_name=f"{self.f.name}_vec", **kw))


def F_(feat: Feature) -> FluentFeature:
    return FluentFeature(feat)


class FluentSchema:
    """Attribute access over a {name: Feature} dict: ``feats.price``."""

    def __init__(self, feats: dict[str, Feature]):
        self._feats = feats

    def __getattr__(self, name: str) -> FluentFeature:
        try:
            return FluentFeature(self._feats[name])
        except KeyError:
            raise AttributeError(f"no feature {name!r}; have {sorted(self._feats)}") from None

    def __getitem__(self, name: str) -> FluentFeature:
        return FluentFeature(self._feats[name])


def fluent(feats: dict[str, Feature]) -> FluentSchema:
    return FluentSchema(feats)
