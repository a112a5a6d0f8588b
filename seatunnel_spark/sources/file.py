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


def resolve_path_aliases(path: str) -> str:
    """$SEATUNNEL_SPARK_PATH_ALIASES="/seatunnel/read=/data/x,/tmp/a=/y"
    remaps path PREFIXES — the volume-mount analog, so job configs
    written for a container filesystem (the reference's e2e confs read
    /seatunnel/read/...) run unmodified outside it. Longest prefix
    wins; driver-side only (Spark resolves file paths on the driver)."""
    import os

    aliases = os.environ.get("SEATUNNEL_SPARK_PATH_ALIASES", "")
    if not aliases:
        return path
    pairs = sorted(
        (kv.split("=", 1) for kv in aliases.split(",") if "=" in kv),
        key=lambda kv: -len(kv[0]),
    )
    for prefix, target in pairs:
        if path == prefix or path.startswith(prefix.rstrip("/") + "/"):
            return target + path[len(prefix):]
    return path


# Hive-style nested separators (TextFormatConstant.SEPARATOR):
# level 0 = fields, 1 = array elements / map entries, 2 = map k/v, ...
_TEXT_SEPARATORS = ["\x01", "\x02", "\x03", "\x04", "\x05", "\x06", "\x07"]


def _text_decode(col, dt, level: int, null_format: str | None):
    """Declarative analog of TextDeserializationSchema.convert
    (seatunnel-format-text/.../TextDeserializationSchema.java:225-352):
    nested splits by level separators (REGEX, like Java String.split),
    blank -> null, bytes = UTF-8."""
    from pyspark.sql import functions as F, types as T

    if isinstance(dt, T.ArrayType):
        parts = F.split(col, _TEXT_SEPARATORS[level + 1], -1)
        return F.when(col.isNull() | (F.trim(col) == ""), F.lit(None)).otherwise(
            F.transform(
                parts, lambda e: _text_decode(e, dt.elementType, level + 1,
                                              null_format))
        )
    if isinstance(dt, T.MapType):
        entries = F.split(col, _TEXT_SEPARATORS[level + 1], -1)

        def entry(e):
            kv = F.split(e, _TEXT_SEPARATORS[level + 2], -1)
            return F.struct(
                _text_decode(F.get(kv, 0), dt.keyType, level + 1,
                             null_format).alias("key"),
                _text_decode(F.get(kv, 1), dt.valueType, level + 1,
                             null_format).alias("value"),
            )

        return F.when(col.isNull() | (F.trim(col) == ""), F.lit(None)).otherwise(
            F.map_from_entries(F.transform(entries, entry))
        )
    if isinstance(dt, T.StructType):
        parts = F.split(col, _TEXT_SEPARATORS[level + 1], -1)
        return F.when(col.isNull() | (F.trim(col) == ""), F.lit(None)).otherwise(
            F.struct(*[
                _text_decode(F.get(parts, i), f.dataType, level + 1,
                             null_format).alias(f.name)
                for i, f in enumerate(dt.fields)
            ])
        )
    is_null = col.isNull() | (F.trim(col) == "")
    if null_format is not None:
        is_null = is_null | (col == F.lit(null_format))
    if isinstance(dt, T.BinaryType):
        conv = F.encode(col, "UTF-8")  # :308 field.getBytes(UTF_8)
    else:
        conv = col.cast(dt)
    return F.when(is_null, F.lit(None)).otherwise(conv)


class FileSource(Source):
    NAME = "LocalFile"

    def _path(self) -> str:
        path = resolve_path_aliases(self.require("path"))
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
        fmt = str(self.opt("file_format_type", "parquet")).lower()
        schema_opt = self.opt("schema")
        if self.plugin_name == "Hive" and self.opt("table_name"):
            df = spark.table(self.opt("table_name"))
        elif fmt == "text" and schema_opt:
            # The reference's TEXT format: one line per row, fields
            # joined by field_delimiter (default \x01), nested types by
            # the deeper Hive separators (TextReadStrategy).
            from pyspark.sql import functions as F

            from seatunnel_spark.types import parse_schema as _ps

            schema = _ps(schema_opt.get("fields", schema_opt))
            delim = str(self.opt("field_delimiter",
                                 self.opt("delimiter", _TEXT_SEPARATORS[0])))
            null_format = self.opt("null_format")
            raw = spark.read.text(self._path())
            # field_delimiter is a Java regex (the reference does
            # String.split(delimiter) — delimiter "\\|" means a
            # literal pipe, local_file_delimiter_assert.conf:70).
            cols = F.split(F.col("value"), delim, -1)
            # Hive-style partition dirs (name=x/hobby=y) surface as
            # row fields, like the reference's parse_partition_from_path
            partition_cols = [c for c in raw.columns if c != "value"]
            df = raw.select(*[
                _text_decode(F.get(cols, i), f.dataType, 0,
                             null_format).alias(f.name)
                for i, f in enumerate(schema.fields)
            ], *partition_cols)
        elif fmt == "xml" and schema_opt:
            # Reference XML rows carry values as attributes
            # (xml_use_attr_format) with maps/arrays JSON-encoded
            # (XmlReadStrategy): read every declared field as STRING,
            # then cast / from_json to the declared types (TIME
            # included — Spark's XML reader can't take TimeType).
            from pyspark.sql import functions as F, types as T

            from seatunnel_spark.types import parse_schema as _ps

            schema = _ps(schema_opt.get("fields", schema_opt))
            str_schema = T.StructType(
                [T.StructField(f.name, T.StringType()) for f in schema.fields])
            reader = spark.read.schema(str_schema) \
                .option("rowTag", self.opt("xml_row_tag", "RECORD"))
            if self.opt("xml_use_attr_format"):
                reader = reader.option("attributePrefix", "")
            for k, v in (self.opt("options") or {}).items():
                reader = reader.option(k, v)
            raw = reader.format("xml").load(self._path())
            df = raw.select(*[
                (F.from_json(F.col(f.name), f.dataType)
                 if isinstance(f.dataType, (T.MapType, T.ArrayType,
                                            T.StructType))
                 else F.col(f.name).cast(f.dataType)).alias(f.name)
                for f in schema.fields
            ])
        elif fmt == "binary":
            # Reference binary rows: data/relativePath/partIndex
            # (BinaryReadStrategy.java:40) — whole-file fragments for
            # file-copy pipelines.
            from pyspark.sql import functions as F

            base = self._path().rstrip("/") + "/"
            df = spark.read.format("binaryFile").load(self._path()).select(
                F.col("content").alias("data"),
                F.regexp_replace("path", f"^file:{base}", "").alias(
                    "relativePath"),
                F.lit(0).cast("long").alias("partIndex"),
            )
        else:
            df = self._reader(spark.read).load(self._path())
        if self.opt("read_columns"):
            # Projection applies to FILE columns; partition-path fields
            # (name=x/hobby=y dirs) stay appended, as the reference's
            # parse_partition_from_path does.
            declared = set((schema_opt or {}).get("fields", schema_opt or {}))
            keep = [c for c in df.columns
                    if c not in declared and c not in self.opt("read_columns")]
            df = df.select(*self.opt("read_columns"), *keep)
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
