"""File sources — 10 filesystem backends × 8 read formats.

Reference: connector-file/connector-file-base read strategies
(ParquetReadStrategy.java, TextReadStrategy.java, ...; SURVEY.md §2.4):
LocalFile/HdfsFile/S3File/OssFile/OssJindoFile/CosFile/ObsFile/
FtpFile/SftpFile (+ Hive) each reading Text/Csv/Json/Orc/Parquet/
Excel/Xml/Binary.

Spark-native design: ONE source class; the backend only determines the
path scheme (file:// hdfs:// s3a:// oss:// cosn:// obs:// — hadoop
FileSystem handles each given the right jars), and the format maps to
a native DataFrameReader format. Predicate pushdown, column pruning,
partition discovery, and split planning all come from the Spark file
source — the parts the reference hand-rolls in *ReadStrategy.java.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import parse_schema

FILE_SOURCE_NAMES = [
    "LocalFile", "HdfsFile", "S3File", "OssFile", "OssJindoFile",
    "CosFile", "ObsFile", "FtpFile", "SftpFile", "Hive",
]

_SCHEMES = {
    "LocalFile": "", "HdfsFile": "", "S3File": "s3a://", "OssFile": "oss://",
    "OssJindoFile": "oss://", "CosFile": "cosn://", "ObsFile": "obs://",
    "FtpFile": "ftp://", "SftpFile": "sftp://", "Hive": "",
}

# file_format_type (docs/en/connector-v2/source/LocalFile.md) -> Spark format
_FORMATS = {
    "parquet": "parquet",
    "orc": "orc",
    "json": "json",
    "csv": "csv",
    "text": "text",
    "binary": "binaryFile",
    "xml": "xml",       # native in Spark 4
    "excel": None,      # no reader in this container — explicit error below
}


class FileSource(Source):
    NAME = "LocalFile"

    def _path(self) -> str:
        path = self.require("path")
        scheme = _SCHEMES.get(self.plugin_name, "")
        if scheme and "://" not in path:
            path = scheme + path.lstrip("/") if scheme.endswith("//") else scheme + path
        return path

    def _reader(self, reader):
        fmt = str(self.opt("file_format_type", "parquet")).lower()
        if fmt not in _FORMATS:
            raise ValueError(f"unknown file_format_type {fmt!r}")
        spark_fmt = _FORMATS[fmt]
        if spark_fmt is None:
            raise NotImplementedError(
                "excel read requires an excel datasource (not in this container); "
                "convert to csv/parquet or plug spark-excel"
            )
        schema_opt = self.opt("schema")
        if schema_opt:
            reader = reader.schema(parse_schema(schema_opt.get("fields", schema_opt)))
        if fmt == "csv":
            reader = reader.option("header", self.opt("skip_header_row_number", 0) != 0 or
                                   str(self.opt("header", "true")))
            reader = reader.option("sep", self.opt("field_delimiter", ","))
            if not schema_opt:
                reader = reader.option("inferSchema", "true")
        if fmt == "text" and self.opt("field_delimiter"):
            # Delimited text: read lines then split downstream; the engine's
            # Sql/Split transforms handle projection.
            pass
        if fmt == "xml":
            reader = reader.option("rowTag", self.opt("xml_row_tag", "row"))
        for k, v in (self.opt("options") or {}).items():
            reader = reader.option(k, v)
        return reader.format(spark_fmt)

    def read(self, spark: SparkSession) -> DataFrame:
        # Hive reads metastore tables (docs/en/connector-v2/source/Hive.md
        # `table_name = db.tbl`); file backends read paths.
        if self.plugin_name == "Hive" and self.opt("table_name"):
            df = spark.table(self.opt("table_name"))
        else:
            df = self._reader(spark.read).load(self._path())
        if self.opt("read_columns"):
            df = df.select(*self.opt("read_columns"))
        return df

    def read_stream(self, spark: SparkSession) -> DataFrame:
        # Spark file streaming needs an explicit schema; infer from a batch
        # read when not declared (driver-side, one-time).
        reader = self._reader(spark.readStream)
        if not self.opt("schema"):
            static = self._reader(spark.read).load(self._path())
            reader = reader.schema(static.schema)
        if self.opt("max_files_per_trigger"):
            reader = reader.option("maxFilesPerTrigger", self.opt("max_files_per_trigger"))
        return reader.load(self._path())
