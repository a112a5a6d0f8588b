from __future__ import annotations

from pyspark.sql import DataFrame


class Sink:
    """A sink consumes a DataFrame.

    Batch mode calls `write(df)`. Streaming mode calls `write_stream(df)`
    which defaults to foreachBatch(write) — the same unification the
    reference gets from its batch/stream-dual SinkWriter
    (seatunnel-api/.../sink/SinkWriter.java:47-92).
    """

    NAME = "?"

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

    def write_stream(self, df: DataFrame, checkpoint: str | None = None):
        writer = df.writeStream.foreachBatch(lambda batch, epoch: self.write(batch))
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        trigger = self.opt("trigger")
        if trigger == "availableNow":
            writer = writer.trigger(availableNow=True)
        elif trigger:
            writer = writer.trigger(processingTime=trigger)
        return writer.start()
