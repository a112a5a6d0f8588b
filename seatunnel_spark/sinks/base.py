from __future__ import annotations

import os

from pyspark.sql import DataFrame


class Sink:
    """A sink consumes a DataFrame.

    Batch mode calls `write(df)`. Streaming mode calls `write_stream(df)`
    which defaults to foreachBatch(write) — the same unification the
    reference gets from its batch/stream-dual SinkWriter
    (seatunnel-api/.../sink/SinkWriter.java:47-92).

    Exactly-once to non-transactional sinks: foreachBatch is
    at-least-once (a batch whose write finished but whose offset commit
    didn't is replayed on restart). The reference closes this with 2PC
    (SinkCommitter.java:33-51); here a batch-id LEDGER next to the
    checkpoint marks each batch after its write, so a replay becomes a
    no-op — the same effect as the reference's commit phase, keyed by
    the engine's own batchId. Marker creation is a directory create
    (atomic on local/HDFS-like filesystems).
    """

    NAME = "?"

    # Changelog POSITION metadata (__offset/__event_ts) is transport
    # detail, not payload: the engine strips it before write() unless a
    # sink opts in to consume it (lakehouse uses __offset as the merge
    # order, jdbc's compactor orders by it). __row_kind/__table_id stay
    # — every changelog-aware sink already handles those.
    WANTS_CHANGELOG_META = False

    def wants_observation(self) -> bool:
        """Whether the engine may wrap write() with an Observation for
        rows_written metrics. A sink whose write() acts on OTHER frames
        than the one handed in (e.g. Assert on per-table groups) must
        return False — the observed plan would never execute and
        Observation.get would block forever."""
        return True

    def __init__(self, options: dict | None = None):
        self.options = dict(options or {})
        self.plugin_name = self.NAME

    def opt(self, key: str, default=None):
        return self.options.get(key, default)

    def require(self, key: str):
        if key not in self.options:
            raise ValueError(f"sink {self.plugin_name}: missing option {key!r}")
        return self.options[key]

    def write(self, df: DataFrame) -> None:  # pragma: no cover
        raise NotImplementedError

    def _process_batch(self, batch: DataFrame, epoch: int,
                       ledger: str | None) -> None:
        marker = os.path.join(ledger, f"batch-{epoch}") if ledger else None
        if marker and os.path.isdir(marker):
            return  # replayed batch already committed — exactly-once
        self.write(batch)
        if marker:
            os.makedirs(marker, exist_ok=True)

    def write_stream(self, df: DataFrame, checkpoint: str | None = None):
        ledger = None
        if checkpoint and self.opt("exactly_once", True):
            ledger = os.path.join(checkpoint, "__st_commits")
            os.makedirs(ledger, exist_ok=True)
        writer = df.writeStream.foreachBatch(
            lambda batch, epoch: self._process_batch(batch, epoch, ledger)
        )
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        trigger = self.opt("trigger")
        if trigger == "availableNow":
            writer = writer.trigger(availableNow=True)
        elif trigger:
            writer = writer.trigger(processingTime=trigger)
        return writer.start()
