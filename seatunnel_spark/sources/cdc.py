"""CDC source orchestration — DBLog-style snapshot + changelog stitch.

Reference: connector-cdc-base (SURVEY.md §2.4 'CDC' row) — incremental
snapshot via PK chunk ranges (AbstractJdbcSourceChunkSplitter.java)
plus log tailing (IncrementalSplit), stitched with low/high watermarks
(split/wartermark/WatermarkEvent.java) so every row is emitted exactly
once with correct changelog semantics.

Spark-native decomposition (SURVEY.md §7 phase 6):
  phase 1 — SNAPSHOT: partitioned parallel read of the current table
            state (JDBC chunk predicates / parquet export), each row
            tagged +I, stamped with the snapshot watermark (the log
            offset/timestamp captured when the snapshot started).
  phase 2 — CHANGELOG: a debezium/canal-format stream (Kafka topic or
            file drop) decoded to __row_kind rows; events at-or-before
            the snapshot watermark are DROPPED (the snapshot already
            reflects them) — this is exactly the reference's watermark
            stitch, expressed as a filter instead of barrier events.
  phase 3 — APPLY: downstream sinks compact by primary key
            (sinks.jdbc.compact_changelog / streaming.changelog_apply).

The orchestrator is backend-agnostic: `snapshot_df` and `changelog_df`
are pluggable, so the same stitch logic serves MySQL-CDC (JDBC snapshot
+ debezium topic), file-based simulations (tests), or any pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.types import ROW_KIND_COL


def stitch_snapshot_and_changelog(
    snapshot: DataFrame,
    changelog: DataFrame,
    offset_col: str,
    snapshot_watermark,
) -> DataFrame:
    """Combine a snapshot (current state at `snapshot_watermark`) with a
    changelog stream so the union replays to exactly-once semantics.

    snapshot rows  -> +I, offset = watermark
    changelog rows -> kept only when offset > watermark (later changes)

    Works when `changelog` is streaming (the filter and union are
    stream-safe); the result is an append changelog ordered by offset
    per key — feed it to changelog-applying sinks.
    """
    snap = snapshot.withColumn(ROW_KIND_COL, F.lit("+I")).withColumn(
        offset_col, F.lit(snapshot_watermark).cast(dict(changelog.dtypes)[offset_col])
    )
    late = changelog.filter(F.col(offset_col) > F.lit(snapshot_watermark))
    return snap.unionByName(late, allowMissingColumns=True)


def stitch_chunked_snapshot(
    snapshot: DataFrame,
    changelog: DataFrame,
    chunks: list[tuple],
    primary_key: str,
    offset_col: str,
) -> DataFrame:
    """DBLog-style stitch for a snapshot read in PK CHUNKS under
    concurrent writes — the reference's incremental-snapshot algorithm
    (connector-cdc-base AbstractJdbcSourceChunkSplitter + low/high
    WatermarkEvent stitching), as a declarative DataFrame op.

    `chunks` = [(pk_lo, pk_hi, low_wm, high_wm), ...]: the chunk
    covering keys [pk_lo, pk_hi) was read between log offsets low_wm
    and high_wm, so each of its rows reflects SOME state inside that
    window. Normalization per chunk:

      * events with low_wm < offset <= high_wm for keys in the chunk
        range are applied ON TOP of the chunk rows (last-per-key wins,
        deletes drop) and the result re-emits as +I at high_wm — this
        removes the torn-read ambiguity;
      * events with offset > high_wm stream through unchanged;
      * events at or before low_wm are discarded (already reflected);
      * events for keys outside every chunk pass through (inserts past
        the snapshot key range).

    One broadcast range-join against the (tiny) chunk table + one
    per-key shuffle for the window merge — no driver loops, so a
    million-chunk snapshot behaves.
    """
    spark = snapshot.sparkSession
    chunk_df = spark.createDataFrame(
        [(lo, hi, low, high) for lo, hi, low, high in chunks],
        ["__pk_lo", "__pk_hi", "__low_wm", "__high_wm"],
    )
    key = F.col(primary_key)
    in_range = (key >= F.col("__pk_lo")) & (key < F.col("__pk_hi"))

    snap = snapshot.join(F.broadcast(chunk_df), in_range, "left")
    ev = changelog.join(F.broadcast(chunk_df), in_range, "left")

    window_ev = ev.filter(
        F.col("__high_wm").isNotNull()
        & (F.col(offset_col) > F.col("__low_wm"))
        & (F.col(offset_col) <= F.col("__high_wm"))
    )
    tail_ev = ev.filter(
        F.col("__high_wm").isNull() | (F.col(offset_col) > F.col("__high_wm"))
    )

    snap_tagged = snap.withColumn(ROW_KIND_COL, F.lit("+I")).withColumn(
        offset_col, F.col("__low_wm").cast(dict(changelog.dtypes)[offset_col])
    )
    from pyspark.sql import Window

    merged = final_state(
        snap_tagged.unionByName(window_ev, allowMissingColumns=True)
        .withColumn("__hi", F.max("__high_wm").over(
            Window.partitionBy(primary_key)))
        .drop("__pk_lo", "__pk_hi", "__low_wm", "__high_wm"),
        [primary_key],
        offset_col,
    )
    corrected = (
        merged.withColumn(ROW_KIND_COL, F.lit("+I"))
        .withColumn(offset_col,
                    F.col("__hi").cast(dict(changelog.dtypes)[offset_col]))
        .drop("__hi")
    )
    return corrected.unionByName(
        tail_ev.drop("__pk_lo", "__pk_hi", "__low_wm", "__high_wm"),
        allowMissingColumns=True,
    )


def final_state(
    stitched: DataFrame, primary_keys: list[str], offset_col: str
) -> DataFrame:
    """Batch materialization: reduce the stitched changelog to the
    current table state (last event per key by offset; deletes drop).
    One shuffle on the key — the 100 TB-safe shape. Columns beyond the
    event payload pass through (last row's values win)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*primary_keys).orderBy(
        F.col(offset_col).desc(), F.col(ROW_KIND_COL).desc()
    )
    return (
        stitched.filter(F.col(ROW_KIND_COL) != "-U")
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(ROW_KIND_COL) != "-D"))
        .drop("__rn", ROW_KIND_COL, offset_col)
    )


class CdcSource:
    """Config-driven CDC entry point (MySQL-CDC family analog).

    options:
      snapshot.path / snapshot.jdbc.*  — where the snapshot comes from
      changelog.path | changelog.kafka.* — debezium/canal feed
      changelog.format — DEBEZIUM_JSON (default) / CANAL_JSON / ...
      offset.column — monotonically increasing change position
      snapshot.watermark — offset at snapshot start
      schema — row schema for the changelog decoder
    """

    def __init__(self, options: dict):
        self.options = options

    def read(self, spark) -> DataFrame:
        from seatunnel_spark.formats import decode_payload

        o = self.options
        if "snapshot.path" in o:
            snapshot = spark.read.parquet(o["snapshot.path"])
        else:
            from seatunnel_spark.sources.jdbc import JdbcSource

            snapshot = JdbcSource(
                {k[len("snapshot.jdbc."):]: v for k, v in o.items()
                 if k.startswith("snapshot.jdbc.")}
            ).read(spark)

        fmt = o.get("changelog.format", "DEBEZIUM_JSON")
        offset_col = o.get("offset.column", "__offset")
        if "changelog.path" in o:
            raw = spark.read.text(o["changelog.path"]).withColumnRenamed(
                "value", "value"
            )
        else:
            raise NotImplementedError(
                "changelog.kafka.*: wire spark.readStream.format('kafka') here"
            )
        decoded = decode_payload(raw, fmt, o["schema"])
        # The payload must carry the change position (debezium ts_ms/lsn
        # analog) — positional line-order offsets don't survive
        # repartitioning, so we refuse to invent them.
        if offset_col not in decoded.columns:
            raise ValueError(
                f"CDC changelog must carry offset column {offset_col!r} "
                "in the payload schema"
            )
        return stitch_snapshot_and_changelog(
            snapshot, decoded, offset_col, o["snapshot.watermark"]
        )
