"""Console sink (reference: connector-console)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink


class ConsoleSink(Sink):
    NAME = "Console"

    def write(self, df: DataFrame) -> None:
        df.show(int(self.opt("limit", 20)), truncate=not self.opt("full", False))

    def write_stream(self, df: DataFrame, checkpoint: str | None = None):
        writer = df.writeStream.format("console")
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        return writer.start()
