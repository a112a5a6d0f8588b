"""Sequence packing — map documents onto fixed-length training
sequences (the GPT-style concat-and-chunk step before pretraining).

Every doc gets its global token offset in a deterministic corpus
order; `pack_id = offset div seq_len` and `pack_offset = offset mod
seq_len` say which training sequence the doc starts in and where. A
doc may span packs (concat-and-chunk semantics); consumers slice
accordingly.

100 TB design — the naive global cumsum is a single-partition window
(Spark warns and serializes the whole corpus through one task). Here
it's the classic two-pass distributed prefix sum instead:
 1. range-partition by the order key; per-partition running totals via
    a window PARTITIONED by the partition id (parallel),
 2. per-partition totals (one row per partition) roll up on the driver
    into base offsets, broadcast-joined back.
Cost: one range shuffle + one tiny collect, regardless of corpus size.
The result is identical to the single-window answer, so the DuckDB
oracle replays it with a plain `sum() OVER (ORDER BY ...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from seatunnel_spark.dataops.text import token_count


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", seq_len: int = 512,
                   partitions: int | None = None) -> DataFrame:
    """-> (id, n_tokens, offset, pack_id, pack_offset), ordered by id.

    `offset` is the number of tokens before this doc in id order;
    deterministic for a given corpus regardless of cluster layout.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    toks = (df.select(F.col(id_col), token_count(F.col(text_col))
                      .cast("bigint").alias("n_tokens"))
            .repartitionByRange(partitions, F.col(id_col))
            .withColumn("_pid", F.spark_partition_id()))
    w = (Window.partitionBy("_pid").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = toks.withColumn("_run", F.sum("n_tokens").over(w))
    # one row per partition: tiny driver-side rollup into base offsets
    totals = (local.groupBy("_pid").agg(F.max("_run").alias("_tot"))
              .orderBy("_pid").collect())
    base, bases = 0, {}
    for r in totals:
        bases[r["_pid"]] = base
        base += r["_tot"]
    base_df = F.broadcast(spark.createDataFrame(
        [(int(p), int(b)) for p, b in bases.items()], "_pid int, _base bigint"))
    return (local.join(base_df, "_pid")
            .withColumn("offset",
                        F.col("_base") + F.col("_run") - F.col("n_tokens"))
            .select(
                F.col(id_col),
                F.col("n_tokens"),
                F.col("offset"),
                # integer division: exact at any corpus size (a float
                # floor would wobble past 2^53 tokens)
                F.expr(f"offset DIV {int(seq_len)}").alias("pack_id"),
                (F.col("offset") % seq_len).alias("pack_offset")))


__all__ = ["pack_sequences"]
