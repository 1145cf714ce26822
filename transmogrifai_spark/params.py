"""External run configuration — the reference's OpParams surface.

Re-expression of features/.../OpParams.scala:81-226 and ReaderParams
(:231-252): a JSON (or YAML-shaped dict) document that overrides reader
locations, per-stage parameters, and model/write/metrics locations WITHOUT
touching pipeline code. The reference deserializes with Jackson
(OpParams.fromFile :300, fromString :308); here ``OpParams.from_file`` /
``from_string`` accept both the reference's camelCase keys and snake_case.

Reference semantics kept:
  * ``reader_params``: per-reader ``path`` / ``partitions`` / ``custom``
    overrides, applied by name (``reader_for`` or ``apply_to_reader``).
  * ``alternate_reader_params`` + ``switch_reader_params()``
    (OpParams.scala:203) — swap in e.g. a scoring dataset for a train one.
  * ``stage_params``: per-stage-name keyword overrides. The reference sets
    Spark Params on matching PipelineStages; our stages are constructed in
    the pipeline module, so the module pulls its constructor kwargs through
    ``stage_kwargs(stage_name, **defaults)`` — same JSON, same precedence
    (file wins over code defaults), applied at construction instead of by
    post-hoc mutation.
  * ``custom_tag_name``/``custom_tag_value`` (:92-93) stamp
    ``spark.sparkContext.setLocalProperty`` for lineage, and
    ``custom_params`` ride along opaquely (:96).

Example JSON (reference key spelling):

    {"readerParams": {"events": {"path": "/data/events", "partitions": 64}},
     "stageParams": {"one_hot": {"top_k": 25}},
     "modelLocation": "/models/churn",
     "writeLocation": "/scores/churn"}
"""
from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, replace
from typing import Any, Optional


def _snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


@dataclass(frozen=True)
class ReaderParams:
    """ReaderParams (OpParams.scala:231): per-reader overrides."""

    path: Optional[str] = None
    partitions: Optional[int] = None
    custom_params: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "ReaderParams":
        d = {_snake(k): v for k, v in d.items()}
        return cls(path=d.get("path"), partitions=d.get("partitions"),
                   custom_params=d.get("custom_params") or {})


@dataclass
class OpParams:
    """OpParams (OpParams.scala:81) — external overrides for a run."""

    stage_params: dict[str, dict[str, Any]] = field(default_factory=dict)
    reader_params: dict[str, ReaderParams] = field(default_factory=dict)
    alternate_reader_params: dict[str, ReaderParams] = field(default_factory=dict)
    model_location: Optional[str] = None
    write_location: Optional[str] = None
    metrics_location: Optional[str] = None
    custom_tag_name: Optional[str] = None
    custom_tag_value: Optional[str] = None
    custom_params: dict[str, Any] = field(default_factory=dict)

    # -- construction -------------------------------------------------------

    @classmethod
    def from_dict(cls, d: dict) -> "OpParams":
        d = {_snake(k): v for k, v in d.items()}
        readers = {k: ReaderParams.from_dict(v)
                   for k, v in (d.get("reader_params") or {}).items()}
        alts = {k: ReaderParams.from_dict(v)
                for k, v in (d.get("alternate_reader_params") or {}).items()}
        return cls(
            stage_params=d.get("stage_params") or {},
            reader_params=readers,
            alternate_reader_params=alts,
            model_location=d.get("model_location"),
            write_location=d.get("write_location"),
            metrics_location=d.get("metrics_location"),
            custom_tag_name=d.get("custom_tag_name"),
            custom_tag_value=d.get("custom_tag_value"),
            custom_params=d.get("custom_params") or {},
        )

    @classmethod
    def from_string(cls, s: str) -> "OpParams":
        """JSON or YAML text (the reference accepts both,
        OpParams.fromString :308 / toYamlString :316); JSON is a YAML
        subset, so one safe_load covers both when PyYAML is present."""
        try:
            return cls.from_dict(json.loads(s))
        except json.JSONDecodeError:
            import yaml  # in-env; gate stays soft for pure-JSON users
            d = yaml.safe_load(s)
            if not isinstance(d, dict):
                raise ValueError("params document must be a mapping")
            return cls.from_dict(d)

    @classmethod
    def from_file(cls, path: str) -> "OpParams":
        with open(path) as f:
            return cls.from_string(f.read())

    # -- reference operations ----------------------------------------------

    def switch_reader_params(self) -> "OpParams":
        """OpParams.scala:203 — swap main and alternate reader params (the
        train-vs-score dataset flip)."""
        return replace(self, reader_params=self.alternate_reader_params,
                       alternate_reader_params=self.reader_params)

    def stage_kwargs(self, stage_name: str, **defaults) -> dict[str, Any]:
        """Constructor kwargs for a named stage: code defaults overridden by
        the JSON's stageParams entry (file wins, reference precedence)."""
        return {**defaults, **self.stage_params.get(stage_name, {})}

    def apply_to_reader(self, name: str, reader):
        """Apply this params object's overrides for ``name`` to a DataReader
        (path / partitions / reader options), returning a new reader."""
        rp = self.reader_params.get(name)
        if rp is None:
            return reader
        out = replace(reader)
        if rp.path is not None:
            out.path = rp.path
        if rp.partitions is not None:
            out.repartition = rp.partitions
        if rp.custom_params:
            out.options = {**out.options, **rp.custom_params}
        return out

    def reader_for(self, name: str, path: str, **kwargs):
        """Build a DataReader for ``name`` with overrides applied (the usual
        pipeline-module entry: code supplies defaults, JSON wins)."""
        from .sources.readers import DataReader
        return self.apply_to_reader(name, DataReader(path=path, **kwargs))

    def stamp(self, spark) -> None:
        """Stamp the custom tag on the Spark context (the reference sets it
        on every tracked app for lineage, OpParams.scala:92)."""
        if self.custom_tag_name:
            spark.sparkContext.setLocalProperty(
                self.custom_tag_name, self.custom_tag_value or "")

    def to_dict(self) -> dict:
        return {
            "stageParams": self.stage_params,
            "readerParams": {
                k: {"path": v.path, "partitions": v.partitions,
                    "customParams": v.custom_params}
                for k, v in self.reader_params.items()},
            "alternateReaderParams": {
                k: {"path": v.path, "partitions": v.partitions,
                    "customParams": v.custom_params}
                for k, v in self.alternate_reader_params.items()},
            "modelLocation": self.model_location,
            "writeLocation": self.write_location,
            "metricsLocation": self.metrics_location,
            "customTagName": self.custom_tag_name,
            "customTagValue": self.custom_tag_value,
            "customParams": self.custom_params,
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)
