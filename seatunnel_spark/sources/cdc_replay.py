"""MySQL-CDC (and family) — incremental snapshot + debezium log tail.

Reference semantics (connector-cdc-mysql/.../source/
MySqlIncrementalSource.java + connector-cdc-base):
  * snapshot phase: parallel chunked read of current table state;
  * log phase: binlog tail decoded to a changelog, handed off at the
    snapshot watermark (split/wartermark/WatermarkEvent.java);
  * options: base-url, table-names, table-names-config (primaryKeys),
    startup.mode, schema-changes.enabled, server-id
    (config/MySqlSourceOptions.java).

Spark-native decomposition: the log tail is a debezium-json event
feed. Debezium itself represents the snapshot as op='r' (read) events
in the same stream, so BOTH phases are one `readStream` + decode +
filter — the watermark stitch (sources/cdc.py) handles the
torn-snapshot case when a separate snapshot frame is supplied.

There is no binlog client in this sandbox, so the event feed comes
from a REPLAY DIRECTORY (option `replay.dir` or
$SEATUNNEL_SPARK_CDC_REPLAY): one subdir per table id holding
  changelog.jsonl   debezium envelopes ({before,after,op,ts_ms,
                    source:{db,table,pos}}, one per line; op=r rows
                    are the snapshot)
  snapshot.parquet  (optional) snapshot frame stitched in batch mode
  watermark         (optional) log offset at snapshot start
  schema.json       (optional) {field: type} decl; else inferred from
                    the first events/snapshot
Pointing the feed at a Kafka topic instead (spark.readStream.format
("kafka") + the same decode) is the production deployment; the replay
dir exists so the reference's cdc e2e confs run unmodified here.

schema-changes.enabled: ALTER TABLE ADD/DROP/CHANGE COLUMN DDL events
in the feed adjust the decode schema (applied in file order before the
read starts — older events read the new columns as null). Downstream,
schemaless sinks (ES dynamic mapping) evolve naturally; typed sinks
use plans/catalog.py drift DDL.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import (
    EVENT_TS_COL,
    ROW_KIND_COL,
    TABLE_ID_COL,
    parse_schema,
)

_OFFSET_COL = "__offset"


def _infer_field_type(values) -> str:
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            return "boolean"
        if isinstance(v, int):
            return "bigint"
        if isinstance(v, float):
            return "double"
        if isinstance(v, dict):
            return "string"
    return "string"


_DDL_ADD = re.compile(
    r"ADD\s+(?:COLUMN\s+)?`?(\w+)`?\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)", re.I)
_DDL_DROP = re.compile(r"DROP\s+(?:COLUMN\s+)?`?(\w+)`?", re.I)
_DDL_CHANGE = re.compile(
    r"CHANGE\s+(?:COLUMN\s+)?`?(\w+)`?\s+`?(\w+)`?\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)",
    re.I)
_DDL_MODIFY = re.compile(
    r"MODIFY\s+(?:COLUMN\s+)?`?(\w+)`?\s+(\w+(?:\(\d+(?:,\s*\d+)?\))?)", re.I)

_MYSQL_TO_DSL = {
    "tinyint": "tinyint", "smallint": "smallint", "int": "int",
    "integer": "int", "bigint": "bigint", "float": "float",
    "double": "double", "boolean": "boolean", "date": "date",
    "datetime": "timestamp", "timestamp": "timestamp",
}


def _mysql_type_to_dsl(decl: str) -> str:
    base = decl.split("(")[0].lower()
    if base == "decimal":
        return decl.lower()
    return _MYSQL_TO_DSL.get(base, "string")


def apply_ddl(fields: dict, ddl: str) -> dict:
    """Evolve a {field: type} schema dict by a MySQL DDL statement —
    the reference's SchemaChangeEvent application
    (connector-cdc-mysql schema-change support; e2e
    mysqlcdc_to_mysql_with_schema_change.conf)."""
    out = dict(fields)
    for m in _DDL_ADD.finditer(ddl):
        out[m.group(1)] = _mysql_type_to_dsl(m.group(2))
    for m in _DDL_CHANGE.finditer(ddl):
        old, new, typ = m.groups()
        out.pop(old, None)
        out[new] = _mysql_type_to_dsl(typ)
    for m in _DDL_MODIFY.finditer(ddl):
        out[m.group(1)] = _mysql_type_to_dsl(m.group(2))
    if re.search(r"^\s*ALTER\b", ddl, re.I):
        for m in _DDL_DROP.finditer(ddl):
            if not _DDL_ADD.search(ddl) or m.group(1) not in (
                    a.group(1) for a in _DDL_ADD.finditer(ddl)):
                out.pop(m.group(1), None)
    return out


class CdcReplaySource(Source):
    """MySQL-CDC / Postgres-CDC / ... over a debezium replay feed."""

    NAME = "MySQL-CDC"

    def _replay_dir(self) -> str | None:
        return self.opt("replay.dir") or os.environ.get(
            "SEATUNNEL_SPARK_CDC_REPLAY")

    def _tables(self) -> list[str]:
        names = self.opt("table-names") or self.opt("table_names")
        if not names:
            cfg = self.opt("table-names-config") or []
            names = [c["table"] for c in cfg]
        if not names:
            raise ValueError(f"{self.plugin_name}: table-names required")
        return list(names)

    def _pk_of(self, table: str) -> list[str] | None:
        for c in self.opt("table-names-config") or []:
            if c.get("table") == table:
                return c.get("primaryKeys")
        return None

    # ------------------------------------------------------------------
    def _require_replay(self) -> str:
        replay = self._replay_dir()
        if not replay:
            raise NotImplementedError(
                f"source {self.plugin_name}: no binlog client in this "
                "environment. Production path: debezium->Kafka topic + "
                "spark.readStream.format('kafka') into the same decode; "
                "replay path: set replay.dir / $SEATUNNEL_SPARK_CDC_REPLAY "
                "to a directory of debezium-json feeds (see module doc)."
            )
        return replay

    def _table_dir(self, replay: str, table: str) -> str:
        d = os.path.join(replay, table)
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"{self.plugin_name}: replay dir {d!r} missing for table "
                f"{table!r}")
        return d

    def _decode_schema(self, tdir: str, spark: SparkSession) -> T.StructType:
        """schema.json, evolved by DDL events when
        schema-changes.enabled (decode uses the FINAL schema; earlier
        events surface new columns as null)."""
        sfile = os.path.join(tdir, "schema.json")
        if os.path.exists(sfile):
            with open(sfile) as f:
                fields = json.load(f)
        else:
            fields = self._infer_fields(tdir, spark)
        if self.opt("schema-changes.enabled") or self.opt("schema-changes_enabled"):
            log = os.path.join(tdir, "changelog.jsonl")
            if os.path.exists(log):
                with open(log) as f:
                    for line in f:
                        try:
                            ev = json.loads(line)
                        except json.JSONDecodeError:
                            continue
                        if ev.get("ddl"):
                            fields = apply_ddl(fields, ev["ddl"])
        return parse_schema(fields)

    def _infer_fields(self, tdir: str, spark: SparkSession) -> dict:
        snap = os.path.join(tdir, "snapshot.parquet")
        if os.path.exists(snap):
            from seatunnel_spark.types import spark_type_to_dsl

            df = spark.read.parquet(snap)
            return {f.name: spark_type_to_dsl(f.dataType)
                    for f in df.schema.fields}
        log = os.path.join(tdir, "changelog.jsonl")
        cols: dict[str, list] = {}
        with open(log) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                for side in ("after", "before"):
                    for k, v in (ev.get(side) or {}).items():
                        cols.setdefault(k, []).append(v)
        return {k: _infer_field_type(vs) for k, vs in cols.items()}

    def _decode(self, raw: DataFrame, schema: T.StructType,
                table: str) -> DataFrame:
        """Debezium envelope -> changelog rows with ROW_KIND, offset
        (source.pos, falling back to ts_ms), event time, table id.
        Updates expand to -U/+U pairs (DebeziumRowConverter.java)."""
        env = T.StructType([
            T.StructField("before", schema),
            T.StructField("after", schema),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("ddl", T.StringType()),
            T.StructField("source", T.StructType([
                T.StructField("db", T.StringType()),
                T.StructField("table", T.StringType()),
                T.StructField("pos", T.LongType()),
            ])),
        ])
        v = F.from_json(F.col("value").cast("string"), env)
        p = raw.select(v.alias("v")).filter(
            F.col("v.op").isNotNull())  # DDL/heartbeat lines drop here
        op = F.col("v.op")
        rows = F.filter(
            F.array(
                F.struct(
                    F.when(op.isin("d", "u"), F.col("v.before"))
                    .otherwise(F.col("v.after")).alias("payload"),
                    F.when(op.isin("c", "r"), F.lit("+I"))
                    .when(op == "u", F.lit("-U"))
                    .when(op == "d", F.lit("-D")).alias("kind"),
                ),
                F.struct(
                    F.col("v.after").alias("payload"),
                    F.when(op == "u", F.lit("+U")).alias("kind"),
                ),
            ),
            lambda s: s["kind"].isNotNull(),
        )
        e = p.select(
            F.coalesce(F.col("v.source.pos"), F.col("v.ts_ms"))
            .alias(_OFFSET_COL),
            F.col("v.ts_ms").alias(EVENT_TS_COL),
            F.explode(rows).alias("e"),
        )
        return e.select(
            *[F.col("e.payload")[f.name].alias(f.name) for f in schema.fields],
            F.col("e.kind").alias(ROW_KIND_COL),
            F.col(_OFFSET_COL), F.col(EVENT_TS_COL),
            F.lit(table).alias(TABLE_ID_COL),
        )

    # ------------------------------------------------------------------
    def _read_table(self, spark: SparkSession, replay: str, table: str,
                    streaming: bool) -> DataFrame:
        tdir = self._table_dir(replay, table)
        schema = self._decode_schema(tdir, spark)
        log = os.path.join(tdir, "changelog.jsonl")
        if streaming:
            raw = (spark.readStream.format("text")
                   .load(tdir + "/*.jsonl").withColumnRenamed("value", "value"))
        else:
            raw = spark.read.text(log)
        decoded = self._decode(raw, schema, table)

        snap_path = os.path.join(tdir, "snapshot.parquet")
        if not streaming and os.path.exists(snap_path):
            from seatunnel_spark.sources.cdc import stitch_snapshot_and_changelog

            wm_file = os.path.join(tdir, "watermark")
            watermark = 0
            if os.path.exists(wm_file):
                with open(wm_file) as f:
                    watermark = int(f.read().strip())
            snapshot = spark.read.parquet(snap_path).withColumns({
                EVENT_TS_COL: F.lit(watermark).cast("long"),
                TABLE_ID_COL: F.lit(table),
            })
            return stitch_snapshot_and_changelog(
                snapshot, decoded, _OFFSET_COL, watermark)
        return decoded

    def read(self, spark: SparkSession):
        replay = self._require_replay()
        tables = self._tables()
        if len(tables) == 1:
            return self._read_table(spark, replay, tables[0], False)
        return {t: self._read_table(spark, replay, t, False) for t in tables}

    def read_stream(self, spark: SparkSession):
        replay = self._require_replay()
        tables = self._tables()
        if len(tables) == 1:
            return self._read_table(spark, replay, tables[0], True)
        return {t: self._read_table(spark, replay, t, True) for t in tables}


CDC_SOURCE_NAMES = [
    "MySQL-CDC", "Postgres-CDC", "Oracle-CDC", "SqlServer-CDC",
    "MongoDB-CDC", "TiDB-CDC", "Opengauss-CDC",
]

__all__ = ["CdcReplaySource", "CDC_SOURCE_NAMES", "apply_ddl"]
