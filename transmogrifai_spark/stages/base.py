"""Stage bases: the operator surface of the engine.

Re-expresses the reference's typed stage hierarchy
(features/src/main/scala/com/salesforce/op/stages/base/unary/UnaryTransformer.scala:104,
binary/BinaryTransformer.scala:54, ternary/, quaternary/, sequence/ — and the
estimator variants) with a crucial physical difference, per SURVEY.md §4:

  The reference applies row-level ops as ``Row => Any`` functions over
  ``df.rdd`` (core/.../utils/stages/FitStagesUtil.scala:96-119). We instead
  compile every transformer to a native Catalyst ``Column`` expression, so a
  whole DAG layer becomes ONE ``df.select`` that whole-stage codegen fuses
  into a single JVM pass — no Python round trip, no RDD, no serialization.
  Pandas UDFs are the fallback for library-bound ops; Python row UDFs never.

Arity (unary/binary/ternary/quaternary/sequence) is just ``len(inputs)`` here;
the type discipline lives in ``input_types`` validation at graph-construction
time.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..feature import Feature, _uid
from ..types import FeatureTypeTag, is_subtype, tag


class Stage:
    """Base: named unit of work with typed input features and one output."""

    def __init__(
        self,
        op_name: str,
        inputs: Sequence[Feature],
        output_name: str,
        output_type: str,
        input_types: Sequence[str] | None = None,
    ):
        self.uid = _uid(op_name)
        self.op_name = op_name
        self.inputs = tuple(inputs)
        # RawFeatureFilter hook (OpWorkflow.withRawFeatureFilter): a stage
        # that can be REGENERATED on a surviving subset of its inputs (e.g.
        # vector combiners) sets this to `lambda survivors: new_stage`;
        # stages without it are dropped whole when any input is excluded.
        self.rebuilder = None
        self.output_name = output_name
        self.output_type: FeatureTypeTag = tag(output_type)
        if input_types is not None:
            if len(input_types) not in (1, len(inputs)):
                raise ValueError(f"{op_name}: input_types arity mismatch")
            for feat, want in zip(inputs, input_types * len(inputs) if len(input_types) == 1 else input_types):
                feat.require(want)
        self._output: Feature | None = None

    @property
    def output(self) -> Feature:
        if self._output is None:
            self._output = Feature(
                name=self.output_name,
                type_tag=self.output_type,
                is_response=any(f.is_response for f in self.inputs),
                origin_stage=self,
                parents=self.inputs,
            )
        return self._output

    @property
    def is_estimator(self) -> bool:
        return False

    def __repr__(self) -> str:
        ins = ",".join(f.name for f in self.inputs)
        return f"{self.op_name}({ins} -> {self.output_name})"


class ColumnTransformer(Stage):
    """A transformer whose physical form is a Catalyst Column expression.

    ``make_expr(*cols)`` receives the resolved input columns and returns the
    output column. These fuse: the workflow applies every ColumnTransformer of
    a DAG layer in one ``select`` (reference fuses them into one RDD map pass,
    FitStagesUtil.applyOpTransformations:96-119 — codegen does it better).
    """

    def __init__(
        self,
        op_name: str,
        inputs: Sequence[Feature],
        output_name: str,
        output_type: str,
        make_expr: Callable[..., Column],
        input_types: Sequence[str] | None = None,
    ):
        super().__init__(op_name, inputs, output_name, output_type, input_types)
        self._make_expr = make_expr

    def expr(self) -> Column:
        cols = [F.col(f.name) for f in self.inputs]
        return self._make_expr(*cols).alias(self.output_name)


class DataFrameTransformer(Stage):
    """A transformer that needs df-level application (e.g. wrapped
    ``pyspark.ml`` Transformers — reference sparkwrappers/generic/Sw*.scala).

    Not fusable with column transformers; the workflow applies these
    sequentially after the fused select of its layer.
    """

    def __init__(self, op_name, inputs, output_name, output_type, transform_df, input_types=None):
        super().__init__(op_name, inputs, output_name, output_type, input_types)
        self._transform_df = transform_df

    def transform(self, df: DataFrame) -> DataFrame:
        return self._transform_df(df)


class Estimator(Stage):
    """A stage that must see data before it can transform
    (reference UnaryEstimator, features/.../base/unary/UnaryEstimator.scala:56).

    ``fit(df)`` computes whatever statistics it needs (always via ``df.agg`` /
    ``ml`` fits — distributed, never ``collect`` of raw rows) and returns the
    fitted ColumnTransformer/DataFrameTransformer.
    """

    def __init__(self, op_name, inputs, output_name, output_type, fit_fn, input_types=None):
        super().__init__(op_name, inputs, output_name, output_type, input_types)
        self._fit_fn = fit_fn
        self.fitted: Stage | None = None

    @property
    def is_estimator(self) -> bool:
        return True

    def fit(self, df: DataFrame) -> Stage:
        fitted = self._fit_fn(self, df)
        fitted._output = self._output  # fitted stage produces the same feature
        self.fitted = fitted
        return fitted


# -- convenience constructors (the reference's UnaryLambdaTransformer etc.) --

def unary(op_name: str, feat: Feature, output_name: str, output_type: str,
          make_expr: Callable[[Column], Column], input_type: str | None = None) -> Feature:
    st = ColumnTransformer(op_name, [feat], output_name, output_type, make_expr,
                           [input_type] if input_type else None)
    return st.output


def binary(op_name: str, a: Feature, b: Feature, output_name: str, output_type: str,
           make_expr: Callable[[Column, Column], Column]) -> Feature:
    return ColumnTransformer(op_name, [a, b], output_name, output_type, make_expr).output


def ternary(op_name: str, a: Feature, b: Feature, c: Feature, output_name: str,
            output_type: str, make_expr) -> Feature:
    return ColumnTransformer(op_name, [a, b, c], output_name, output_type, make_expr).output


def sequence(op_name: str, feats: Sequence[Feature], output_name: str, output_type: str,
             make_expr) -> Feature:
    return ColumnTransformer(op_name, feats, output_name, output_type, make_expr).output
