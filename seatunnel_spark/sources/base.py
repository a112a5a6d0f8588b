from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Source:
    """A source produces one (or more, multi-table) DataFrames.

    Mirrors SeaTunnelSource's batch/stream duality
    (seatunnel-api/.../source/SeaTunnelSource.java:38-79,
    Boundedness.java:25-28): `read` = bounded, `read_stream` = unbounded.
    """

    NAME = "?"

    def __init__(self, options: dict | None = None):
        self.options = dict(options or {})
        self.plugin_name = self.NAME

    def opt(self, key: str, default=None):
        return self.options.get(key, default)

    def require(self, key: str):
        if key not in self.options:
            raise ValueError(f"source {self.plugin_name}: missing option {key!r}")
        return self.options[key]

    def table_id(self) -> str | None:
        """Catalog table id this source declares (schema.table), used
        for sink ${table_name} resolution — the reference resolves
        placeholders from the CatalogTable's TablePath, not the
        plugin_output name (sink-options-placeholders.md)."""
        schema_opt = self.opt("schema")
        if isinstance(schema_opt, dict):
            return schema_opt.get("table")
        return None

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def read_stream(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError(f"{self.plugin_name} has no streaming mode")
