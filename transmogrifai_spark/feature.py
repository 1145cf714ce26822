"""Feature: a typed, lineage-carrying pointer to a DataFrame column.

Re-expression of the reference's ``Feature[O]`` / ``FeatureLike[O]``
(features/src/main/scala/com/salesforce/op/features/Feature.scala:55,
FeatureLike.scala:69): name, logical type, isResponse, originStage, parents.
Lineage is what lets the workflow reconstruct the stage DAG from result
features alone (OpWorkflow.setResultFeatures, core/.../OpWorkflow.scala:90-110)
and prune every raw column the results don't need — static column pruning that
at 100 TB composes with Catalyst's parquet column pruning: unused columns are
never read off disk.

Scala catches mis-typed stage wiring at compile time; here ``Stage`` inputs
validate feature types at graph-construction time (SURVEY.md §7 hard parts).
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Optional

from .types import FeatureTypeTag, is_subtype, tag

if TYPE_CHECKING:
    from .stages.base import Stage

_uid_counter = itertools.count()


def _uid(prefix: str) -> str:
    return f"{prefix}_{next(_uid_counter):06d}"


class FeatureCycleError(ValueError):
    """Raised when feature lineage contains a cycle
    (reference: features/FeatureCycleException.scala)."""


@dataclass(frozen=True, eq=False)
class Feature:
    """Typed pointer to a (future) DataFrame column.

    ``origin_stage is None`` means a *raw* feature extracted straight from a
    source column; otherwise the feature is the output of ``origin_stage``
    applied to ``parents``.
    """

    name: str
    type_tag: FeatureTypeTag
    is_response: bool = False
    origin_stage: Optional["Stage"] = None
    parents: tuple["Feature", ...] = ()
    # for raw features: the source-column expression (SQL string) to extract it
    source_expr: str | None = None

    def __post_init__(self):
        # cycle check along lineage (cheap DFS; graphs are small, driver-side)
        seen: set[int] = set()
        stack = [self]
        path: set[int] = {id(self)}
        for p in self.parents:
            self._check_cycle(p, path)

    def _check_cycle(self, node: "Feature", path: set[int]) -> None:
        if id(node) in path:
            raise FeatureCycleError(f"feature lineage cycle through {node.name!r}")
        for p in node.parents:
            self._check_cycle(p, path | {id(node)})

    # -- lineage walks ------------------------------------------------------
    def raw_features(self) -> list["Feature"]:
        """All raw ancestors (dedup'd, stable order)."""
        out: dict[int, Feature] = {}

        def walk(f: "Feature") -> None:
            if f.origin_stage is None:
                out.setdefault(id(f), f)
            for p in f.parents:
                walk(p)

        walk(self)
        return list(out.values())

    def parent_stages(self) -> list["Stage"]:
        """All ancestor stages, dedup'd (reference FeatureLike.parentStages:370)."""
        out: dict[int, "Stage"] = {}

        def walk(f: "Feature") -> None:
            if f.origin_stage is not None:
                out.setdefault(id(f.origin_stage), f.origin_stage)
                for p in f.parents:
                    walk(p)

        walk(self)
        return list(out.values())

    def require(self, ancestor_type: str) -> "Feature":
        """Graph-construction-time type validation."""
        if not is_subtype(self.type_tag.name, ancestor_type):
            raise TypeError(
                f"feature {self.name!r} has type {self.type_tag.name}, "
                f"expected a subtype of {ancestor_type}"
            )
        return self

    def with_response(self, is_response: bool = True) -> "Feature":
        return Feature(
            name=self.name, type_tag=self.type_tag, is_response=is_response,
            origin_stage=self.origin_stage, parents=self.parents,
            source_expr=self.source_expr,
        )

    def __repr__(self) -> str:  # keep dataclass noise out of error messages
        origin = self.origin_stage.uid if self.origin_stage else "raw"
        return f"Feature({self.name}: {self.type_tag.name} <- {origin})"


def raw_feature(
    name: str,
    type_name: str,
    *,
    is_response: bool = False,
    source_expr: str | None = None,
) -> Feature:
    """Declare a raw feature over a source column.

    ``source_expr`` is an optional SQL expression used to extract the feature
    from the source row (the reference's per-feature ``extractFn``,
    features/.../stages/FeatureGeneratorStage.scala:67); defaults to the
    column itself.
    """
    return Feature(
        name=name,
        type_tag=tag(type_name),
        is_response=is_response,
        source_expr=source_expr or name,
    )


def from_dataframe(
    df, response: str | None = None, overrides: dict[str, str] | None = None,
    infer_semantic: bool = False, sample_rows: int = 1000,
) -> dict[str, Feature]:
    """Infer raw features from a DataFrame schema
    (reference FeatureBuilder.fromDataFrame, features/.../FeatureBuilder.scala:232).

    Returns {column -> Feature} with the response carved out. ``overrides``
    maps column name -> logical type name for semantic refinement (e.g.
    'c_mktsegment' -> 'PickList'). ``infer_semantic=True`` additionally
    sniffs string columns on a bounded sample (emails / URLs / phones by
    regex hit-rate, low-cardinality -> PickList) — the optional semantic
    inference the reference performs when building features from raw frames.
    """
    from .types import default_tag_for_dtype

    overrides = dict(overrides or {})
    if infer_semantic:
        for col, t in sniff_semantic_types(df, sample_rows).items():
            overrides.setdefault(col, t)
    out: dict[str, Feature] = {}
    for f in df.schema.fields:
        t = tag(overrides[f.name]) if f.name in overrides else default_tag_for_dtype(f.dataType)
        out[f.name] = Feature(
            name=f.name, type_tag=t, is_response=(f.name == response), source_expr=f.name
        )
    return out


_SNIFF_PATTERNS = [
    # (type, regex, min hit rate among non-nulls)
    ("Email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$", 0.9),
    ("URL", r"^(https?|ftp)://\S+$", 0.9),
    ("Phone", r"^\+?[0-9 ().-]{7,20}$", 0.9),
]


def sniff_semantic_types(df, sample_rows: int = 1000,
                         picklist_max_card: int = 30) -> dict[str, str]:
    """One bounded-sample aggregation classifying string columns: regex
    hit-rates for Email/URL/Phone, approximate cardinality for PickList.
    Driver-side cost is O(string columns); the scan reads ``sample_rows``."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
    if not str_cols:
        return {}
    sample = df.select(*str_cols).limit(sample_rows)
    aggs = []
    for c in str_cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__n"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__card"))
        for t, pat, _ in _SNIFF_PATTERNS:
            aggs.append(F.sum(F.col(c).rlike(pat).cast("long")).alias(f"{c}__{t}"))
    row = sample.agg(*aggs).first()
    out: dict[str, str] = {}
    for c in str_cols:
        n = row[f"{c}__n"] or 0
        if n == 0:
            continue
        for t, _, min_rate in _SNIFF_PATTERNS:
            if (row[f"{c}__{t}"] or 0) / n >= min_rate:
                out[c] = t
                break
        else:
            if row[f"{c}__card"] <= picklist_max_card:
                out[c] = "PickList"
    return out
