"""In-memory sink — test/driver handoff (analog of the reference's
e2e result capture). Stores the DataFrame and (optionally) collected
rows on the instance for assertions."""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink

_RESULTS: dict[str, DataFrame] = {}


class InMemorySink(Sink):
    NAME = "InMemory"

    def write(self, df: DataFrame) -> None:
        name = self.opt("name", "result")
        _RESULTS[name] = df
        if self.opt("materialize", True):
            df.cache().count()

    @staticmethod
    def get(name: str = "result") -> DataFrame:
        return _RESULTS[name]
