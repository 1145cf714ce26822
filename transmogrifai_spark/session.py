"""SparkSession factory with the engine's scale-tuned defaults."""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def session(app: str = "transmogrifai-spark", cpus: int | None = None,
            shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a session with the settings every operator assumes:

    * AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
      the engine relies on it instead of hand-tuned partition counts.
    * Arrow on — every pandas-UDF boundary ships columnar batches.
    * UTC session timezone — determinism for the oracle gate; calendar
      functions must not depend on cluster locale.
    * shuffle partitions sized to the local test box; on a real cluster AQE
      coalesces from a higher initial value.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or cpus
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # semi-join reduction: build a bloom filter on the small side of a
        # selective join and push it into the big side's scan — at 100 TB
        # this keeps non-matching fact rows out of the shuffle entirely
        # (bloom_filter_agg/might_contain are optimizer-internal in Spark 4,
        # so this conf IS the public bloom-join surface)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
