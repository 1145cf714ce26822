"""serving subpackage: persistence, local (Spark-free) scoring."""
from . import ml_export  # noqa: F401  (registers the "mlPredictor" op)
