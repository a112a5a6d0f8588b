"""SparkSession factory tuned for the engine.

Defaults are sized for local[32] testing but every knob is the one
you would set on a 1000-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), adaptive broadcast
thresholds, Arrow for the few Pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: re-plans shuffles at runtime, splits skewed
    # partitions, coalesces tiny ones — essential at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Local testing uses 32 shuffle partitions; on a real cluster AQE
    # coalesces from a high initial number, so this is safe to raise.
    "spark.sql.shuffle.partitions": "32",
    # Arrow makes pandas_udf / mapInPandas paths vectorized.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast joins for small dims (region/nation/supplier-sized).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Accept co-partitioning on a SUBSET of the join keys: a table
    # bucketed by k1 then joined on (k1, k2) keeps its bucketed scan
    # exchange-free (only the other side shuffles, on k1) — the
    # write-once/probe-many contract of write_bucketed_edges and
    # triangles_on_bucketed. Semantics are unchanged; the default
    # (true) merely refuses the optimization.
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
    # Read-side partition sizing: 128 MB splits keep executor memory bounded.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Zeta's TIME type (SqlType.TIME) maps to Spark 4.1's TIME, which
    # is still behind a flag; CAST(x AS TIME) / to_time need it.
    "spark.sql.timeType.enabled": "true",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas-written ts[ns]) is otherwise
    # unreadable (PARQUET_TYPE_ILLEGAL); read as long, convert at source.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "seatunnel-spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or get) the session. Honors $SPARK_GRAFT_CPUS for local parallelism."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
