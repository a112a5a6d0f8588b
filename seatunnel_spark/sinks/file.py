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

def _lzo_post_compress(path: str) -> None:
    """compress_codec=lzo on text/json writes: Hadoop has no builtin
    lzo codec either — each part file is lzop-framed post-write with
    the CompressFormat.LZO `.lzo` suffix (formats/lzo.py)."""
    import os

    from seatunnel_spark.formats.lzo import lzop_compress

    for root, _d, names in os.walk(path):
        for name in names:
            if not name.startswith("part-") or name.endswith(".lzo") \
                    or name.endswith(".crc"):
                continue
            full = os.path.join(root, name)
            with open(full, "rb") as fh:
                blob = lzop_compress(fh.read())
            with open(full + ".lzo", "wb") as fh:
                fh.write(blob)
            os.remove(full)
            crc = os.path.join(root, "." + name + ".crc")
            if os.path.exists(crc):
                os.remove(crc)


# sink compress_codec (BaseSinkConfig) -> Spark writer compression.
# lzo maps to None here because it is post-compressed by
# _lzo_post_compress (the stdlib codec), not by a Hadoop codec.
_COMPRESSION = {"gzip": "gzip", "gz": "gzip", "bzip2": "bzip2",
                "lzo": None, "snappy": "snappy", "zstd": "zstd",
                "none": None}


def _text_encode(col, dt, level: int, fmts: dict | None = None):
    """Inverse of sources.file._text_decode — the reference's
    TextSerializationSchema / CsvSerializationSchema.convert
    (seatunnel-format-csv/.../CsvSerializationSchema.java:158-225):
    nested types join by the Hive separator ladder, dates/timestamps
    format with the configured patterns, bytes are UTF-8 strings,
    null -> "". Pure Column expressions — stays in codegen."""
    from pyspark.sql import functions as F, types as T

    from seatunnel_spark.sources.file import _TEXT_SEPARATORS as seps

    fmts = fmts or {}

    def enc_or_empty(c, d, lv):
        return F.coalesce(_text_encode(c, d, lv, fmts), F.lit(""))

    if isinstance(dt, T.ArrayType):
        joined = F.concat_ws(
            seps[level + 1],
            F.transform(col, lambda e: enc_or_empty(e, dt.elementType,
                                                    level + 1)))
        return F.when(col.isNull(), F.lit(None)).otherwise(joined)
    if isinstance(dt, T.MapType):
        joined = F.concat_ws(
            seps[level + 1],
            F.transform(
                F.map_entries(col),
                lambda e: F.concat_ws(
                    seps[level + 2],
                    enc_or_empty(e["key"], dt.keyType, level + 1),
                    enc_or_empty(e["value"], dt.valueType, level + 1))))
        return F.when(col.isNull(), F.lit(None)).otherwise(joined)
    if isinstance(dt, T.StructType):
        joined = F.concat_ws(seps[level + 1], *[
            enc_or_empty(col[f.name], f.dataType, level + 1)
            for f in dt.fields])
        return F.when(col.isNull(), F.lit(None)).otherwise(joined)
    if isinstance(dt, T.DateType):
        return F.date_format(col, fmts.get("date") or "yyyy-MM-dd")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(col,
                             fmts.get("datetime") or "yyyy-MM-dd HH:mm:ss")
    if isinstance(dt, T.BinaryType):
        # cast, not decode(): invalid UTF-8 becomes U+FFFD like the
        # reference's new String(bytes, UTF_8); decode() throws under
        # ANSI mode.
        return col.cast("string")
    return col.cast("string")


def _csv_quote(col):
    """commons-csv MINIMAL quoting as the reference applies it to
    top-level strings (CsvSerializationSchema.addQuotesUsingCSVFormat:
    CSVFormat.DEFAULT — quote when the value contains a comma, quote,
    or newline; inner quotes double)."""
    from pyspark.sql import functions as F

    needs = col.rlike('[",\n\r]')
    return F.when(
        needs,
        F.concat(F.lit('"'), F.regexp_replace(col, '"', '""'), F.lit('"')),
    ).otherwise(col)


def _sub_placeholders(path: str, table_id: str) -> str:
    """Sink-path placeholders (docs/en/concept/sink-options-placeholders
    .md): ${database_name}/${schema_name}/${table_name} resolve from the
    upstream table id."""
    parts = table_id.split(".")
    table = parts[-1]
    database = parts[0] if len(parts) > 1 else table_id
    schema = parts[1] if len(parts) == 3 else ""
    return (path.replace("${table_name}", table)
            .replace("${database_name}", database)
            .replace("${schema_name}", schema))


class FileSink(Sink):
    NAME = "LocalFile"

    def wants_observation(self) -> bool:
        # binary write goes through RDD foreachPartition, which doesn't
        # fire dataframe observation metrics, and multi-table mode
        # writes the per-table group frames instead of the handed-in
        # merged frame — in both cases Observation.get would block.
        if getattr(self, "table_groups", None):
            return False
        from seatunnel_spark.sources.file import _JVM_CHARSETS

        if (str(self.opt("encoding", "utf-8")).replace("-", "").lower()
                not in _JVM_CHARSETS):
            return False  # foreachPartition charset path
        if str(self.opt("enable_header_write", "false")).lower() == "true":
            return False  # foreachPartition header path
        fmt = str(self.opt("file_format_type", "parquet")).lower()
        return fmt not in ("binary", "excel")

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.sources.file import resolve_path_aliases
        from seatunnel_spark.types import TABLE_ID_COL

        raw_path = self.require("path")
        groups = getattr(self, "table_groups", None)
        if groups:
            # Multi-table write: each table to its placeholder-resolved
            # path with its own clean schema (the reference's
            # MultiTableSink fan-out + sink-options-placeholders).
            for tid, tdf in groups.items():
                self._write_one(
                    tdf.drop(TABLE_ID_COL),
                    resolve_path_aliases(_sub_placeholders(raw_path, tid)))
            return
        tid = getattr(self, "input_name", None) or "default"
        self._write_one(df, resolve_path_aliases(
            _sub_placeholders(raw_path, tid)))

    def _delimited_line(self, df: DataFrame, fmt: str):
        """One string Column per row: the reference's Text/Csv write
        strategies — nested types via the separator ladder, CSV with
        MINIMAL-quoted strings. Pure Column expressions (codegen)."""
        from pyspark.sql import functions as F, types as T

        delim = str(self.opt("field_delimiter",
                             "," if fmt == "csv" else "\x01"))
        fmts = {"date": self.opt("date_format"),
                "datetime": self.opt("datetime_format"),
                "time": self.opt("time_format")}
        cols = []
        for f in df.schema.fields:
            c = _text_encode(F.col(f.name), f.dataType, 0, fmts)
            if fmt == "csv" and isinstance(f.dataType, T.StringType):
                c = _csv_quote(c)
            cols.append(F.coalesce(c, F.lit("")))
        return F.concat_ws(delim, *cols)

    def _write_one(self, df: DataFrame, path: str) -> None:
        if self.plugin_name == "CosFile" and self.opt("secret_id") \
                and self.opt("region"):
            import shutil
            import tempfile

            from seatunnel_spark import cos_fs

            spool = tempfile.mkdtemp(prefix="st_cos_sink_")
            try:
                self._write_one_local(df, spool)
                cos_fs.upload_tree(self.options, spool, path)
            finally:
                shutil.rmtree(spool, ignore_errors=True)
            return
        if self.plugin_name in ("OssFile", "OssJindoFile", "ObsFile") \
                and self.opt("access_key") is not None \
                and (self.opt("endpoint") or self.opt("fs.oss.endpoint")):
            import shutil
            import tempfile

            from seatunnel_spark import oss_fs

            spool = tempfile.mkdtemp(prefix="st_oss_sink_")
            prefix = "OBS" if self.plugin_name == "ObsFile" else "OSS"
            try:
                self._write_one_local(df, spool)
                oss_fs.upload_tree(self.options, spool, path,
                                   auth_prefix=prefix)
            finally:
                shutil.rmtree(spool, ignore_errors=True)
            return
        if self.plugin_name == "S3File" and self.opt("access_key") \
                and (self.opt("fs.s3a.endpoint") or self.opt("endpoint")):
            # local write pipeline into a spool, then SigV4 PutObject
            # uploads preserving layout (see s3_fs module doc)
            import shutil
            import tempfile

            from seatunnel_spark import s3_fs

            spool = tempfile.mkdtemp(prefix="st_s3_sink_")
            try:
                self._write_one_local(df, spool)
                s3_fs.upload_tree(self.options, spool, path)
            finally:
                shutil.rmtree(spool, ignore_errors=True)
            return
        if self.plugin_name in ("FtpFile", "SftpFile") and self.opt("host"):
            # FTP/SFTP write = the full local write pipeline (formats,
            # partition dirs, file_name_expression, transactions) into
            # a spool dir, then a wire upload preserving layout —
            # mirroring the reference's commit-then-transfer
            # FtpFileSinkWriter / SftpFileSinkWriter. Single-server
            # protocol; see ftp_fs / sftp_fs.
            import shutil
            import tempfile

            if self.plugin_name == "SftpFile":
                from seatunnel_spark import sftp_fs as remote_fs
            else:
                from seatunnel_spark import ftp_fs as remote_fs

            spool = tempfile.mkdtemp(prefix="st_ftp_sink_")
            try:
                self._write_one_local(df, spool)
                remote_fs.upload_tree(self.options, spool, path)
            finally:
                shutil.rmtree(spool, ignore_errors=True)
            return
        self._write_one_local(df, path)

    def _write_one_local(self, df: DataFrame, path: str) -> None:
        from pyspark.sql import functions as F

        fmt = str(self.opt("file_format_type", "parquet")).lower()
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
        if fmt == "excel":
            # ExcelWriteStrategy: one workbook per writer (the format is
            # not appendable/splittable) — foreachPartition emits one
            # xlsx per non-empty partition, header row included
            # (ExcelGenerator writes field names at row 0).
            schema = df.schema
            sheet = str(self.opt("sheet_name", "Sheet1"))
            delim = str(self.opt("field_delimiter", ","))
            fmts = {"date": self.opt("date_format"),
                    "datetime": self.opt("datetime_format"),
                    "time": self.opt("time_format")}
            if mode == "overwrite":
                import shutil as _sh

                _sh.rmtree(path, ignore_errors=True)

            def write_xlsx_part(rows):
                import os
                import uuid

                from seatunnel_spark.formats.excel import write_xlsx

                rows = list(rows)
                if not rows:
                    return
                blob = write_xlsx(rows, schema, sheet_name=sheet,
                                  delimiter=delim, fmts=fmts)
                os.makedirs(path, exist_ok=True)
                p = os.path.join(path, f"part-{uuid.uuid4().hex}.xlsx")
                with open(p, "wb") as fh:
                    fh.write(blob)

            df.foreachPartition(write_xlsx_part)
            return
        enc = str(self.opt("encoding", "utf-8"))
        from seatunnel_spark.sources.file import _JVM_CHARSETS

        if (fmt in ("text", "csv", "json")
                and enc.replace("-", "").lower() not in _JVM_CHARSETS):
            # Charsets Spark's writers reject (gbk): encode each row to
            # one line JVM-side, then write the raw bytes per partition
            # (the reference's own writer model — one file per writer,
            # no committer; fine for the small exotic-charset case).
            if fmt == "json":
                line = F.to_json(F.struct(*df.columns))
            else:
                line = self._delimited_line(df, fmt)
            out = df.select(line.alias("value"))
            if mode == "overwrite":
                import shutil as _sh

                _sh.rmtree(path, ignore_errors=True)

            def write_part(rows):
                import os
                import uuid

                data = "".join(r["value"] + "\n" for r in rows)
                if not data:
                    return
                os.makedirs(path, exist_ok=True)
                p = os.path.join(path, f"part-{uuid.uuid4().hex}.{fmt}")
                with open(p, "wb") as fh:
                    fh.write(data.encode(enc))

            out.foreachPartition(write_part)
            return
        if fmt in ("text", "csv"):
            if str(self.opt("enable_header_write", "false")).lower() == "true":
                # BaseSinkConfig.ENABLE_HEADER_WRITE: every output file
                # starts with the field names joined by the delimiter
                # (TextWriteStrategy; TextHeaderIT asserts the first
                # line). Spark's text writer has no header hook, so this
                # mirrors the reference's one-file-per-writer model:
                # foreachPartition, header first.
                delim = str(self.opt("field_delimiter",
                                     "," if fmt == "csv" else "\x01"))
                header = delim.join(df.columns)
                out = df.select(self._delimited_line(df, fmt).alias("value"))
                if mode == "overwrite":
                    import shutil as _sh

                    _sh.rmtree(path, ignore_errors=True)

                def write_headered(rows):
                    import os
                    import uuid

                    data = "".join(r["value"] + "\n" for r in rows)
                    if not data:
                        return
                    os.makedirs(path, exist_ok=True)
                    p = os.path.join(path, f"part-{uuid.uuid4().hex}.{fmt}")
                    with open(p, "w", encoding=enc) as fh:
                        fh.write(header + "\n" + data)

                out.foreachPartition(write_headered)
                return
            out = df.select(self._delimited_line(df, fmt).alias("value"))
            writer = out.write.mode(mode)
            codec = _COMPRESSION.get(
                str(self.opt("compress_codec", "none")).lower())
            if codec:
                writer = writer.option("compression", codec)
            if self.opt("row_delimiter") not in (None, "\n"):
                writer = writer.option("lineSep", self.opt("row_delimiter"))
            writer.text(path)
            if str(self.opt("compress_codec", "")).lower() == "lzo":
                _lzo_post_compress(path)
            return
        xml_opts = {}
        if fmt == "xml":
            # XmlWriteStrategy: rowTag/rootTag from conf; with
            # xml_use_attr_format values ride as ATTRIBUTES of the row
            # element (complex types JSON-encoded) — Spark's xml writer
            # emits attributes for columns named with attributePrefix,
            # so stringify + prefix every column
            xml_opts = {"rowTag": self.opt("xml_row_tag", "RECORD"),
                        "rootTag": self.opt("xml_root_tag", "RECORDS")}
            if self.opt("xml_use_attr_format"):
                from pyspark.sql import types as T

                df = df.select(*[
                    (F.to_json(F.col(f.name))
                     if isinstance(f.dataType, (T.MapType, T.ArrayType,
                                                T.StructType))
                     else F.col(f.name).cast("string"))
                    .alias(f"_{f.name}") for f in df.schema.fields])
        writer = df.write.mode(mode)
        for k, v in xml_opts.items():
            writer = writer.option(k, v)
        if self.opt("partition_by"):
            writer = writer.partitionBy(*self.opt("partition_by"))
        codec = _COMPRESSION.get(
            str(self.opt("compress_codec", "none")).lower())
        if codec:
            writer = writer.option("compression", codec)
        if self.opt("encoding"):
            writer = writer.option("encoding", self.opt("encoding"))
        for k, v in (self.opt("options") or {}).items():
            writer = writer.option(k, v)
        writer.format({"binary": "parquet"}.get(fmt, fmt)).save(path)
        if fmt in ("json", "text") \
                and str(self.opt("compress_codec", "")).lower() == "lzo":
            _lzo_post_compress(path)
