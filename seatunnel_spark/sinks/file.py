"""File sinks — backends × formats, with SaveMode semantics.

Reference: connector-file-base sink write strategies
(sink/writer/{Parquet,Orc,Json,Text,Csv,Excel,Xml,Binary}WriteStrategy.java)
with transaction-dir + rename commit (writer/Transaction.java).

Spark-native: `df.write.<format>` — Spark's FileOutputCommitter IS the
transaction-dir + rename-commit protocol the reference hand-rolls, so
exactly-once batch file writes come free. partition_by maps to
partitionBy (dynamic partition writes).

SaveMode mapping (reference: seatunnel-api/.../sink/SchemaSaveMode.java:23-32,
DataSaveMode.java:26-35):
  DROP_DATA             -> mode("overwrite")
  APPEND_DATA           -> mode("append")
  ERROR_WHEN_DATA_EXISTS-> mode("errorifexists")
  IGNORE                -> mode("ignore")
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.sinks.base import Sink

FILE_SINK_NAMES = [
    "LocalFile", "HdfsFile", "S3File", "OssFile", "OssJindoFile",
    "CosFile", "ObsFile", "FtpFile", "SftpFile",
]

_DATA_SAVE_MODE = {
    "DROP_DATA": "overwrite",
    "APPEND_DATA": "append",
    "ERROR_WHEN_DATA_EXISTS": "errorifexists",
    "IGNORE": "ignore",
}


class FileSink(Sink):
    NAME = "LocalFile"

    def wants_observation(self) -> bool:
        # binary write goes through RDD foreachPartition, which doesn't
        # fire dataframe observation metrics — Observation.get would
        # block forever.
        return str(self.opt("file_format_type", "parquet")).lower() != "binary"

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.sources.file import resolve_path_aliases

        fmt = str(self.opt("file_format_type", "parquet")).lower()
        path = resolve_path_aliases(self.require("path"))
        mode = _DATA_SAVE_MODE.get(
            str(self.opt("data_save_mode", "APPEND_DATA")).upper(), "append"
        )
        if fmt == "binary":
            # Reference BinaryWriteStrategy: reassemble (data,
            # relativePath) rows into real files — the file-copy
            # pipeline. Partition-parallel; needs a shared filesystem
            # at cluster scale (as the reference's local/hdfs sinks do).
            base = path

            def write_rows(rows):
                import os

                for r in rows:
                    p = os.path.join(base, r["relativePath"])
                    os.makedirs(os.path.dirname(p) or base, exist_ok=True)
                    with open(p, "wb") as fh:
                        fh.write(bytes(r["data"]))

            df.foreachPartition(write_rows)
            return
        writer = df.write.mode(mode)
        if self.opt("partition_by"):
            writer = writer.partitionBy(*self.opt("partition_by"))
        if fmt == "csv":
            writer = writer.option("header", "true").option(
                "sep", self.opt("field_delimiter", ",")
            )
        if fmt == "text":
            fmt = "text"
        for k, v in (self.opt("options") or {}).items():
            writer = writer.option(k, v)
        if fmt == "excel":
            raise NotImplementedError("excel write not available in this container")
        writer.format({"binary": "parquet"}.get(fmt, fmt)).save(path)
