"""transmogrifai_spark — a PySpark-native feature-engineering / AutoML engine
with the query and data-processing capabilities of salesforce/TransmogrifAI,
re-expressed Spark-first (DataFrame/Catalyst; no RDD row maps, no Python row
UDFs), plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal columns).

Layout:
  types.py        45-type logical type system over 8 physical Spark types
  feature.py      lineage-carrying Feature + schema inference
  stages/         transformer/estimator bases (Column-expression compiled)
  workflow.py     DAG layering, layered fit, one-plan scoring
  functions/      math / text / date / map column-expression libraries
  aggregators.py  monoid aggregation vocabulary (keyed event aggregation)
  sources/        readers (simple/aggregate/conditional) and joined readers
  operators/      filters, vectorizers (one-hot/hashing/transmogrify),
                  preparators (sanity checker, variance filter, raw filter)
  llm/            dedup, similarity search, text quality, multimodal
  streaming/      structured-streaming scoring and windowed aggregation
"""
from .session import session
from .feature import Feature, from_dataframe, raw_feature
from .workflow import Workflow, WorkflowModel

__all__ = ["session", "Feature", "from_dataframe", "raw_feature", "Workflow", "WorkflowModel"]

__version__ = "0.1.0"
