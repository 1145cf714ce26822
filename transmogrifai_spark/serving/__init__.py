"""serving subpackage: persistence, local (Spark-free) scoring."""
