"""In-memory sink — test/driver handoff (analog of the reference's
e2e result capture). Stores the DataFrame and (optionally) collected
rows on the instance for assertions."""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink

_RESULTS: dict[str, DataFrame] = {}
# write-attempt counter per sink name — lets tests observe job.retry
# semantics (the reference's retry-times e2e counts restarts the same
# way, via its InMemory test sink).
_ATTEMPTS: dict[str, int] = {}


class InMemorySink(Sink):
    NAME = "InMemory"

    def write(self, df: DataFrame) -> None:
        name = self.opt("name", "result")
        _ATTEMPTS[name] = _ATTEMPTS.get(name, 0) + 1
        if str(self.opt("throw_exception", "false")).lower() == "true":
            # e2e error-injection option (InMemorySinkWriter.write
            # throws when throw_exception=true) — drives the
            # job.retry.times path.
            raise RuntimeError("InMemory sink throw_exception=true")
        _RESULTS[name] = df
        if self.opt("materialize", True):
            df.cache().count()

    @staticmethod
    def attempts(name: str = "result") -> int:
        return _ATTEMPTS.get(name, 0)

    @staticmethod
    def get(name: str = "result") -> DataFrame:
        return _RESULTS[name]
