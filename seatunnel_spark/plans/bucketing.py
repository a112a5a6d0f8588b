"""Bucketed-table helpers — co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact join is the exchange of
both sides. Writing each table bucketed (and sorted) by the join key
pre-partitions the data ON DISK: Spark then plans a sort-merge join
with NO Exchange on either side (verified in tests by plan
inspection). This is the durable analog of `repartition(col)` — pay
one shuffle at write time, reuse it for every later join/aggregation
on that key. The reference has no equivalent (its shuffle is a
per-job Hazelcast queue, ExecutionPlanGenerator.java:204-282).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist df as a bucketed (+sorted) managed table keyed for
    future co-located joins/aggregations on bucket_cols."""
    writer = df.write.mode(mode).format(file_format).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: list[str], how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with write_bucketed on the
    same keys/bucket count — planned without exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
