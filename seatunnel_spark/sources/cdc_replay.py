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


_DDL_NON_COLUMN = {"TABLE", "INDEX", "KEY", "PRIMARY", "FOREIGN",
                   "CONSTRAINT", "PARTITION"}


def parse_ddl_ops(ddl: str) -> list[tuple]:
    """Structured schema-change ops from an ALTER TABLE statement, in
    statement order — the reference's AlterTableColumnsEvent family
    (AlterTableAddColumnEvent / DropColumnEvent / ChangeColumnEvent /
    ModifyColumnEvent, api/.../schema/event/). Frame-diffing alone
    cannot distinguish RENAME from DROP+ADD (which would lose sink
    data), so sinks replay these ops as dialect DDL.

    Returns tuples: ('add', col, dsl_type) | ('drop', col) |
    ('rename', old, new, dsl_type) | ('modify', col, dsl_type).
    """
    if not re.search(r"^\s*ALTER\b", ddl, re.I):
        return []
    ops: list[tuple[int, tuple]] = []
    for m in _DDL_ADD.finditer(ddl):
        ops.append((m.start(), ("add", m.group(1),
                                _mysql_type_to_dsl(m.group(2)))))
    for m in _DDL_CHANGE.finditer(ddl):
        old, new, typ = m.groups()
        ops.append((m.start(), ("rename", old, new,
                                _mysql_type_to_dsl(typ))))
    for m in _DDL_MODIFY.finditer(ddl):
        ops.append((m.start(), ("modify", m.group(1),
                                _mysql_type_to_dsl(m.group(2)))))
    add_cols = {a.group(1) for a in _DDL_ADD.finditer(ddl)}
    for m in _DDL_DROP.finditer(ddl):
        col = m.group(1)
        if col.upper() in _DDL_NON_COLUMN or col in add_cols:
            continue
        ops.append((m.start(), ("drop", col)))
    return [op for _, op in sorted(ops, key=lambda x: x[0])]


def evolve_frame(df: DataFrame, ops: list) -> DataFrame:
    """Apply parse_ddl_ops results to a DataFrame: after ALTER, the
    table's EXISTING rows live under the new schema (renamed columns
    keep their values, dropped ones vanish) — so a snapshot taken
    before a post-watermark DDL must be remapped the same way."""
    for op in ops:
        kind = op[0]
        if kind == "drop" and op[1] in df.columns:
            df = df.drop(op[1])
        elif kind == "rename" and op[1] in df.columns:
            df = df.withColumnRenamed(op[1], op[2])
        elif kind == "modify" and op[1] in df.columns:
            dt = parse_schema({op[1]: op[2]}).fields[0].dataType
            if dict(df.dtypes)[op[1]] != dt.simpleString():
                df = df.withColumn(op[1], F.col(op[1]).cast(dt))
    return df


def ddl_for_table(ddl_map: dict, *names) -> list:
    """Resolve the DDL list a sink should replay for its table: exact
    name match first (full or short id), else the single distinct list
    when the source only evolved one table (ddl_events stores one
    shared list under both the full and short ids)."""
    for n in names:
        if n and ddl_map.get(n):
            return ddl_map[n]
    distinct = {id(v): v for v in ddl_map.values()}
    return next(iter(distinct.values())) if len(distinct) == 1 else []


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
        if old in out:
            # rename IN PLACE: MySQL CHANGE keeps the column position,
            # and binlog row images zip against this dict's order
            out = {(new if k == old else k):
                   (_mysql_type_to_dsl(typ) if k == old else v)
                   for k, v in out.items()}
        else:
            out[new] = _mysql_type_to_dsl(typ)
    for m in _DDL_MODIFY.finditer(ddl):
        out[m.group(1)] = _mysql_type_to_dsl(m.group(2))
    if re.search(r"^\s*ALTER\b", ddl, re.I):
        for m in _DDL_DROP.finditer(ddl):
            if not _DDL_ADD.search(ddl) or m.group(1) not in (
                    a.group(1) for a in _DDL_ADD.finditer(ddl)):
                out.pop(m.group(1), None)
    return out


# pg type oid -> schema DSL type
_OID_TO_DSL = {
    16: "boolean", 21: "smallint", 23: "int", 20: "bigint",
    700: "float", 701: "double", 1700: "decimal(38,10)",
    1082: "date", 1114: "timestamp", 1184: "timestamp",
}

# text-protocol column type code -> schema DSL type (enum_field_types)
_CODE_TO_DSL = {
    1: "tinyint", 2: "smallint", 3: "int", 9: "int", 13: "int",
    8: "bigint", 16: "bigint", 4: "float", 5: "double",
    0: "decimal(38,10)", 246: "decimal(38,10)",
    7: "timestamp", 12: "timestamp", 17: "timestamp", 18: "timestamp",
    10: "date",
}


def _jsonable_cell(v):
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, _dec.Decimal):
        return str(v)
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f") if v.microsecond \
            else v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        total = int(v.total_seconds())
        h, rem = divmod(abs(total), 3600)
        m, s = divmod(rem, 60)
        return f"{'-' if total < 0 else ''}{h:02d}:{m:02d}:{s:02d}"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", errors="replace")
    return v


class CdcReplaySource(Source):
    """MySQL-CDC / Postgres-CDC / ... — LIVE binlog tail against a
    MySQL-wire server (snapshot SELECT + SHOW MASTER STATUS watermark +
    COM_BINLOG_DUMP via mysql_binlog.BinlogClient, stitched per
    sources/cdc.py), or a debezium replay feed when `replay.dir` /
    $SEATUNNEL_SPARK_CDC_REPLAY points at one. Reference:
    connector-cdc-mysql MySqlIncrementalSource (snapshot phase +
    BinlogSplitReader log phase, watermark handoff)."""

    NAME = "MySQL-CDC"

    def table_id(self) -> str | None:
        """Catalog table id: the declared schema table if any, else the
        single table-names entry — a one-table CDC job's ${table_name}
        placeholder must resolve to the SOURCE table (the reference
        builds CatalogTable from it), not the DAG plugin_output name
        (opengausscdc_to_opengauss_with_multi_table_mode_one_table.conf:
        plugin_output is customers_opengauss_cdc but the sink writes
        sink_opengauss_cdc_table_1)."""
        base = super().table_id()
        if base:
            return base
        try:
            tables = self._tables()
        except Exception:  # noqa: BLE001 - placeholder nicety only
            return None
        return tables[0] if len(tables) == 1 else None

    def _replay_dir(self) -> str | None:
        return self.opt("replay.dir") or os.environ.get(
            "SEATUNNEL_SPARK_CDC_REPLAY")

    def _tables(self) -> list[str]:
        names = self.opt("table-names") or self.opt("table_names") \
            or self.opt("collection")  # MongoDB-CDC collection list
        if isinstance(names, str):
            names = [names]
        if not names:
            cfg = self.opt("table-names-config") or []
            names = [c["table"] for c in cfg]
        if not names:
            # TiDB-CDC's singular database-name/table-name pair
            db1 = self.opt("database-name") or self.opt("database_name")
            t1 = self.opt("table-name") or self.opt("table_name")
            if db1 and t1:
                names = [f"{db1}.{t1}"]
        if not names and (self.opt("table-pattern")
                          or self.opt("table_pattern")):
            names = self._discover_tables()
        if not names:
            raise ValueError(f"{self.plugin_name}: table-names required")
        return list(names)

    def _discover_tables(self) -> list[str]:
        """table-pattern discovery (mysqlcdc_wildcards_to_mysql.conf):
        regex over `db.table` across SHOW DATABASES / SHOW TABLES —
        the reference's TableDiscoveryUtils sweep."""
        import re as _re

        from seatunnel_spark.mysql_wire import MySqlClient

        pattern = _re.compile(str(self.opt("table-pattern")
                                  or self.opt("table_pattern")))
        host, port, _ = self._base_url_parts()
        user = str(self.opt("username") or self.opt("user") or "root")
        pw = str(self.opt("password") or "")
        cl = MySqlClient(host, port, user, pw)
        try:
            _, _, dbs = cl.query("SHOW DATABASES")
            out: list[str] = []
            skip = {"information_schema", "mysql", "performance_schema",
                    "sys"}
            for (db,) in dbs:
                if str(db).lower() in skip:
                    continue
                _, _, ts = cl.query(f"SHOW TABLES FROM {db}")
                out += [f"{db}.{t}" for (t,) in ts
                        if pattern.fullmatch(f"{db}.{t}")
                        or pattern.match(f"{db}.{t}")]
            return sorted(out)
        finally:
            cl.close()

    def _record_ddl(self, table: str, ddl: str) -> None:
        """Remember decoded schema-change DDL (in stream order) so the
        engine can hand it to evolution-capable sinks — the reference
        pipes SchemaChangeEvents through the DAG to the sink
        (docs/en/concept/schema-evolution.md sink matrix)."""
        if not hasattr(self, "ddl_events"):
            self.ddl_events = {}
        short = table.split(".")[-1]
        lst = self.ddl_events.get(table) or self.ddl_events.get(short) \
            or []
        lst.append(ddl)
        self.ddl_events[table] = lst    # one shared list under both
        self.ddl_events[short] = lst    # the full and the short id

    def _pk_of(self, table: str) -> list[str] | None:
        for c in self.opt("table-names-config") or []:
            if c.get("table") == table:
                return c.get("primaryKeys")
        return None

    # -- LIVE binlog mode ----------------------------------------------
    def _base_url_parts(self) -> tuple[str, int, str]:
        import re as _re

        url = str(self.opt("base-url") or self.opt("base_url") or "")
        m = _re.match(r"jdbc:mysql://([^:/]+)(?::(\d+))?(?:/([\w$-]+))?", url)
        if not m:
            raise ValueError(f"{self.plugin_name}: bad base-url {url!r}")
        return m.group(1), int(m.group(2) or 3306), m.group(3) or ""

    def _live_read_table(self, spark: SparkSession, table_full: str
                         ) -> DataFrame:
        """Snapshot + binlog stitch against a live MySQL-wire server.

        1. SHOW MASTER STATUS -> (file, pos): the snapshot watermark
           (MySqlSnapshotSplitReader captures the same low watermark).
        2. SELECT * snapshot of current state (chunked at scale; the
           chunk stitch lives in sources/cdc.stitch_chunked_snapshot).
        3. COM_BINLOG_DUMP from the log start, row events for this
           table re-shaped into debezium envelopes (op c/u/d,
           source.pos = event end position) and fed through the SAME
           envelope decode the replay path uses — one oracle-tested
           code path for both feeds.
        4. stitch: events at-or-before the watermark drop (the
           snapshot already reflects them); later events replay on top.

        The dump is bounded (BINLOG_DUMP_NON_BLOCK) for batch jobs;
        a production streaming deployment tails with non_block=False
        into foreachBatch of the same decode."""
        from seatunnel_spark.mysql_binlog import BinlogClient
        from seatunnel_spark.mysql_wire import MySqlClient
        from seatunnel_spark.sources.cdc import stitch_snapshot_and_changelog

        host, port, default_db = self._base_url_parts()
        user = str(self.opt("username") or self.opt("user") or "root")
        pw = str(self.opt("password") or "")
        db, _, tbl = table_full.rpartition(".")
        db = db or default_db
        # server-id accepts a single id or a range "5652-5657" (one id
        # per parallel reader in the reference); the dump uses the first
        sid_raw = str(self.opt("server-id") or self.opt("server_id") or 1)
        server_id = int(sid_raw.split("-")[0].split(",")[0])

        cl = MySqlClient(host, port, user, pw)
        try:
            # Pin the snapshot to the watermark: START TRANSACTION WITH
            # CONSISTENT SNAPSHOT freezes the read view so rows committed
            # between SHOW MASTER STATUS and the SELECT can't appear both
            # in the snapshot and as >watermark changelog events
            # (Debezium's MySqlSnapshotChangeEventSource uses FTWRL /
            # consistent-snapshot the same way). Older/mini servers that
            # reject the syntax fall back to the plain read.
            try:
                cl.query("SET SESSION TRANSACTION ISOLATION LEVEL "
                         "REPEATABLE READ")
                cl.query("START TRANSACTION WITH CONSISTENT SNAPSHOT")
            except Exception:  # noqa: BLE001
                pass
            _, _, wm_rows = cl.query("SHOW MASTER STATUS")
            binfile, watermark = str(wm_rows[0][0]), int(wm_rows[0][1])
            cols, codes, srows = cl.query(f"SELECT * FROM {db}.{tbl}")
            try:
                cl.query("COMMIT")
            except Exception:  # noqa: BLE001
                pass
            # primary-key discovery (the reference builds CatalogTable
            # from the MySQL table's PK; keyed sinks inherit it):
            # table-names-config wins, else SHOW INDEX
            pk = self._pk_of(table_full) or self._pk_of(tbl)
            if not pk:
                try:
                    icols, _, irows = cl.query(
                        f"SHOW INDEX FROM {db}.{tbl}")
                    if icols:
                        ki = icols.index("Key_name")
                        ci = icols.index("Column_name")
                        pk = [str(r[ci]) for r in irows
                              if str(r[ki]).upper() == "PRIMARY"] or None
                except Exception:  # noqa: BLE001
                    pk = None
            if pk:
                if not hasattr(self, "discovered_keys"):
                    self.discovered_keys = {}
                self.discovered_keys[table_full] = pk
                self.discovered_keys[tbl] = pk
        finally:
            cl.close()
        snap_cols, snap_codes = list(cols), list(codes)
        fields = {c: _CODE_TO_DSL.get(t, "string")
                  for c, t in zip(cols, codes)}
        schema = parse_schema(fields)

        bc = BinlogClient(host, port, user, pw)
        evolve = bool(self.opt("schema-changes.enabled")
                      or self.opt("schema-changes_enabled"))
        cur_fields = dict(fields)  # evolves as DDL events stream past
        try:
            lines = []
            for ev in bc.dump(server_id=server_id, filename=binfile, pos=4):
                kind = ev["event"]
                cols = list(cur_fields)
                if kind == "query" and re.search(r"^\s*(ALTER|CREATE|DROP)\b",
                                                 ev.get("sql", ""), re.I):
                    lines.append(json.dumps({
                        "ddl": ev["sql"],
                        "source": {"db": ev.get("db"), "table": tbl,
                                   "pos": ev["log_pos"]},
                        "ts_ms": ev["ts"] * 1000}))
                    if evolve:
                        # row events after this DDL carry the evolved
                        # column set — zip them against it
                        cur_fields = apply_ddl(cur_fields, ev["sql"])
                        self._record_ddl(table_full, ev["sql"])
                    continue
                if kind not in ("insert", "update", "delete") or \
                        ev["db"] != db or ev["table"] != tbl:
                    continue
                for row in ev["rows"]:
                    if kind == "update":
                        before, after = row
                        env = {"before": dict(zip(cols, map(_jsonable_cell,
                                                            before))),
                               "after": dict(zip(cols, map(_jsonable_cell,
                                                           after))),
                               "op": "u"}
                    elif kind == "insert":
                        env = {"after": dict(zip(cols, map(_jsonable_cell,
                                                           row))),
                               "op": "c"}
                    else:
                        env = {"before": dict(zip(cols, map(_jsonable_cell,
                                                            row))),
                               "op": "d"}
                    env["ts_ms"] = ev["ts"] * 1000
                    env["source"] = {"db": db, "table": tbl,
                                     "pos": ev["log_pos"]}
                    lines.append(json.dumps(env))
        finally:
            bc.close()

        ops: list = []
        if (self.opt("schema-changes.enabled")
                or self.opt("schema-changes_enabled")):
            for line in lines:
                ev = json.loads(line)
                if ev.get("ddl"):
                    fields = apply_ddl(fields, ev["ddl"])
                    ops += parse_ddl_ops(ev["ddl"])
            schema = parse_schema(fields)

        raw = spark.createDataFrame([(ln,) for ln in lines] or
                                    [(None,)], "value string") \
            .filter(F.col("value").isNotNull())
        renames = [(op[1], op[2]) for op in ops if op[0] == "rename"]
        decoded = self._decode(raw, schema, table_full, renames=renames)
        snapshot = spark.createDataFrame(
            [tuple(r) for r in srows], parse_schema(
                {c: _CODE_TO_DSL.get(t, "string")
                 for c, t in zip(snap_cols, snap_codes)}))
        # post-watermark DDL re-shapes the whole table, snapshot rows
        # included (values ride renames; dropped columns vanish)
        snapshot = evolve_frame(snapshot, ops).withColumns({
            EVENT_TS_COL: F.lit(watermark).cast("long"),
            TABLE_ID_COL: F.lit(table_full),
        })
        for name in fields:
            if name not in snapshot.columns:
                snapshot = snapshot.withColumn(
                    name, F.lit(None).cast(dict(
                        (f.name, f.dataType) for f in schema.fields)[name]))
        return stitch_snapshot_and_changelog(
            snapshot, decoded, _OFFSET_COL, watermark)

    _MSSQL_TO_DSL = {
        "tinyint": "smallint", "smallint": "smallint", "int": "int",
        "bigint": "bigint", "real": "float", "float": "double",
        "bit": "boolean", "decimal": "decimal(38,10)",
        "numeric": "decimal(38,10)", "money": "decimal(19,4)",
        "smallmoney": "decimal(10,4)", "date": "date",
        "datetime": "timestamp", "smalldatetime": "timestamp",
        "datetime2": "timestamp", "datetimeoffset": "timestamp",
    }

    def _live_read_sqlserver_table(self, spark: SparkSession,
                                   table_full: str) -> DataFrame:
        """SqlServer-CDC live: snapshot + CT-table poll over the TDS
        wire client (reference: connector-cdc-sqlserver via Debezium's
        SqlServerConnection — GET_MAX_LSN / GET_ALL_CHANGES_FOR_TABLE,
        SqlServerConnection.java:80,92).

        1. SELECT sys.fn_cdc_get_max_lsn() -> the snapshot watermark
           (Debezium's snapshot offset; LsnOffset semantics).
        2. SELECT * snapshot of current state.
        3. Poll cdc.fn_cdc_get_all_changes_<schema>_<table> over the
           full LSN range ordered by (__$start_lsn, __$seqval,
           __$operation) — operation 1=delete 2=insert 3=update-before
           4=update-after (the documented CT-table codes); rows at or
           before the watermark drop client-side (bytes compare — the
           10-byte LSN is big-endian ordered), the rest become debezium
           envelopes through the SAME decode/stitch path the
           mysql/pg/replay feeds use.
        """
        import datetime as _dt
        import re as _re

        from seatunnel_spark.tds_wire import TdsClient

        url = str(self.opt("base-url") or self.opt("base_url") or "")
        m = _re.match(r"jdbc:sqlserver://([^:;/]+)(?::(\d+))?", url)
        if not m:
            raise ValueError(f"{self.plugin_name}: bad base-url {url!r}")
        host, port = m.group(1), int(m.group(2) or 1433)
        parts = table_full.split(".")
        if len(parts) >= 3:
            db, schema_name, tbl = parts[-3], parts[-2], parts[-1]
        else:
            dbs = self.opt("database-names") or self.opt("database_names") \
                or [""]
            db = dbs[0] if isinstance(dbs, list) else str(dbs)
            schema_name, tbl = (parts[-2], parts[-1]) if len(parts) == 2 \
                else ("dbo", parts[-1])
        user = str(self.opt("username") or self.opt("user") or "sa")
        pw = str(self.opt("password") or "")

        cl = TdsClient(host, port, user, pw, db)
        try:
            # watermark and snapshot must be mutually consistent
            # (Debezium SqlServerSnapshotChangeEventSource: read
            # max_lsn INSIDE an isolation-pinned transaction, then
            # select within the same transaction) — a watermark taken
            # outside would double-apply changes committed between the
            # two statements. REPEATABLE READ, not SNAPSHOT: snapshot
            # isolation requires ALLOW_SNAPSHOT_ISOLATION=ON (off by
            # default), which is why Debezium's
            # snapshot.isolation.mode also defaults to repeatable_read
            cl.execute(
                "SET TRANSACTION ISOLATION LEVEL REPEATABLE READ")
            cl.execute("BEGIN TRANSACTION")
            _, _, wm = cl.query("SELECT sys.fn_cdc_get_max_lsn() AS max_lsn")
            watermark_lsn = bytes(wm[0][0] or b"\x00" * 10)
            cols, tnames, srows = cl.query(
                f"SELECT * FROM [{db}].[{schema_name}].[{tbl}]")
            cl.execute("COMMIT TRANSACTION")
            pk = self._pk_of(table_full) or self._pk_of(tbl)
            if not pk:
                try:
                    _, _, pkr = cl.query(
                        "SELECT kcu.COLUMN_NAME "
                        "FROM INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc "
                        "JOIN INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu "
                        "ON tc.CONSTRAINT_NAME = kcu.CONSTRAINT_NAME "
                        "WHERE tc.CONSTRAINT_TYPE = 'PRIMARY KEY' "
                        f"AND kcu.TABLE_NAME = N'{tbl}' "
                        "ORDER BY kcu.ORDINAL_POSITION")
                    pk = [str(r[0]) for r in pkr] or None
                except Exception:  # noqa: BLE001
                    pk = None
            if pk:
                if not hasattr(self, "discovered_keys"):
                    self.discovered_keys = {}
                self.discovered_keys[table_full] = pk
                self.discovered_keys[tbl] = pk
            # full-range poll; NO_STOPPING upper bound (LsnOffset)
            capture = f"{schema_name}_{tbl}"
            _, _, crows = cl.query(
                f"SELECT * FROM [{db}].cdc.[fn_cdc_get_all_changes_"
                f"{capture}](0x{'00' * 9}01, 0x7f{'ff' * 9}, "
                "N'all update old') ORDER BY [__$start_lsn] ASC, "
                "[__$seqval] ASC, [__$operation] ASC")
        finally:
            cl.close()

        fields = {c: self._MSSQL_TO_DSL.get(t, "string")
                  for c, t in zip(cols, tnames)}
        schema = parse_schema(fields)

        def cell(v):
            if isinstance(v, _dt.datetime) and v.tzinfo is not None:
                return v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            if isinstance(v, _dt.time):
                return v.isoformat()
            if isinstance(v, (bytes, bytearray)):
                return bytes(v).decode("utf-8", errors="replace")
            return v

        lines = []
        pos = 0
        pending_before = None
        for crow in crows:
            start_lsn, _seq, op = bytes(crow[0]), crow[1], int(crow[2])
            vals = [_jsonable_cell(cell(v)) for v in crow[4:]]
            if start_lsn <= watermark_lsn:
                continue  # the snapshot already reflects it
            data = dict(zip(cols, vals))
            if op == 3:
                pending_before = data
                continue
            if op == 4:
                env = {"before": pending_before, "after": data, "op": "u"}
                pending_before = None
            elif op == 2:
                env = {"after": data, "op": "c"}
            else:
                env = {"before": data, "op": "d"}
            pos += 1
            env["ts_ms"] = 0
            env["source"] = {"db": db, "table": tbl, "pos": pos}
            lines.append(json.dumps(env))
        if pending_before is not None:
            # an op-3 (update-before) with no op-4 partner means a
            # truncated/corrupt CT feed; dropping it silently would
            # lose an update
            raise ValueError(
                f"{self.plugin_name}: dangling update-before row at end "
                f"of CT poll for {table_full} (op-3 without op-4)")

        raw = spark.createDataFrame([(ln,) for ln in lines] or
                                    [(None,)], "value string") \
            .filter(F.col("value").isNotNull())
        decoded = self._decode(raw, schema, table_full)
        snapshot = spark.createDataFrame(
            [tuple(cell(v) for v in r) for r in srows],
            schema).withColumns({
                EVENT_TS_COL: F.lit(0).cast("long"),
                TABLE_ID_COL: F.lit(table_full),
            })
        from seatunnel_spark.sources.cdc import stitch_snapshot_and_changelog

        return stitch_snapshot_and_changelog(snapshot, decoded,
                                             _OFFSET_COL, 0)

    def _live_read_pg_table(self, spark: SparkSession, table_full: str
                            ) -> DataFrame:
        """Postgres-CDC live: snapshot + pgoutput logical-replication
        stitch (the pg analog of _live_read_table; reference:
        connector-cdc-postgres via Debezium's
        PostgresReplicationConnection).

        1. SELECT pg_current_wal_lsn() -> the snapshot watermark.
        2. SELECT * snapshot of current state.
        3. CREATE_REPLICATION_SLOT (idempotent) + START_REPLICATION
           with the pgoutput plugin; row events for this table become
           debezium envelopes (source.pos = event LSN) through the
           SAME decode/stitch path as the replay and mysql feeds.

        Schema evolution rides pgoutput's own Relation messages — each
        event is zipped against ITS relation's column list, so
        mid-stream ADD COLUMN needs no DDL parsing here."""
        import re as _re

        from seatunnel_spark.pg_logical import (
            LogicalReplicationClient, lsn_int)
        from seatunnel_spark.pg_wire import PgClient

        url = str(self.opt("base-url") or self.opt("base_url") or "")
        m = _re.match(r"jdbc:(?:postgresql|opengauss)://([^:/]+)"
                      r"(?::(\d+))?(?:/([\w$-]+))?", url)
        if not m:
            raise ValueError(f"{self.plugin_name}: bad base-url {url!r}")
        host, port = m.group(1), int(m.group(2) or 5432)
        db = m.group(3) or "postgres"
        user = str(self.opt("username") or self.opt("user") or "postgres")
        pw = str(self.opt("password") or "")
        parts = table_full.split(".")
        schema_name, tbl = (parts[-2], parts[-1]) if len(parts) >= 2 \
            else ("public", parts[-1])
        slot = str(self.opt("slot.name") or self.opt("slot_name")
                   or "seatunnel")

        # Create the replication slot BEFORE snapshotting: the slot only
        # retains WAL from its creation point, so a slot created after the
        # snapshot SELECT would permanently lose rows committed in between
        # (Debezium PostgresReplicationConnection orders it the same way).
        # The slot's consistent_point doubles as the stitch watermark.
        rc = LogicalReplicationClient(host, port, user, pw, db)
        try:
            watermark = rc.create_slot(slot)

            cl = PgClient(host, port, user, pw, db)
            try:
                if watermark is None:  # pre-existing slot reused
                    _, _, wm = cl.query("SELECT pg_current_wal_lsn()")
                    watermark = lsn_int(wm[0][0])
                cols, oids, srows = cl.query(
                    f"SELECT * FROM {schema_name}.{tbl}")
                pk = self._pk_of(table_full) or self._pk_of(tbl)
                if not pk:
                    try:
                        _, _, pkr = cl.query(
                            "SELECT a.attname FROM pg_index i JOIN "
                            "pg_attribute a ON a.attrelid = i.indrelid AND "
                            "a.attnum = ANY(i.indkey) WHERE i.indrelid = "
                            f"'{schema_name}.{tbl}'::regclass "
                            "AND i.indisprimary")
                        pk = [str(r[0]) for r in pkr] or None
                    except Exception:  # noqa: BLE001
                        pk = None
                if pk:
                    if not hasattr(self, "discovered_keys"):
                        self.discovered_keys = {}
                    self.discovered_keys[table_full] = pk
                    self.discovered_keys[tbl] = pk
            finally:
                cl.close()
            fields = {c: _OID_TO_DSL.get(t, "string")
                      for c, t in zip(cols, oids)}

            lines = []
            for ev in rc.stream(slot, publication=str(
                    self.opt("publication.name") or "seatunnel")):
                if ev["namespace"] != schema_name or ev["table"] != tbl:
                    continue
                ecols = ev["cols"]
                for c in ecols:  # Relation-message schema evolution
                    fields.setdefault(c, "string")

                def d(vals):
                    return None if vals is None else dict(
                        zip(ecols, map(_jsonable_cell, vals)))

                env = {"before": d(ev["before"]), "after": d(ev["after"]),
                       "op": {"insert": "c", "update": "u",
                              "delete": "d"}[ev["event"]],
                       "ts_ms": 0,
                       "source": {"db": db, "table": tbl,
                                  "pos": ev["lsn"]}}
                lines.append(json.dumps(env))
        finally:
            rc.close()

        schema = parse_schema(fields)
        raw = spark.createDataFrame([(ln,) for ln in lines] or
                                    [(None,)], "value string") \
            .filter(F.col("value").isNotNull())
        decoded = self._decode(raw, schema, table_full)
        snapshot = spark.createDataFrame(
            [tuple(r) for r in srows], parse_schema(
                {c: _OID_TO_DSL.get(t, "string")
                 for c, t in zip(cols, oids)})).withColumns({
            EVENT_TS_COL: F.lit(watermark).cast("long"),
            TABLE_ID_COL: F.lit(table_full),
        })
        for name in fields:
            if name not in snapshot.columns:
                snapshot = snapshot.withColumn(
                    name, F.lit(None).cast(dict(
                        (f.name, f.dataType)
                        for f in schema.fields)[name]))
        from seatunnel_spark.sources.cdc import stitch_snapshot_and_changelog

        return stitch_snapshot_and_changelog(
            snapshot, decoded, _OFFSET_COL, watermark)

    # -- LIVE change-stream mode (MongoDB-CDC) --------------------------
    def _mongo_schema_for(self, table_full: str) -> dict:
        """Declared schema for a collection: per-table tables_configs
        entry wins, else the single `schema` block (the reference's
        MongodbSourceOptions requires a declared schema — Mongo has no
        catalog to discover one from)."""
        for c in self.opt("tables_configs") or []:
            sch = c.get("schema") or {}
            if sch.get("table") == table_full:
                return sch
        sch = self.opt("schema")
        return sch if isinstance(sch, dict) else {}

    def _live_read_mongo_table(self, spark: SparkSession,
                               table_full: str) -> DataFrame:
        """MongoDB-CDC live: snapshot + `$changeStream` tail over the
        OP_MSG client, stitched like the MySQL/PG live paths.

        Reference: connector-cdc-mongodb MongodbScanFetchTask (snapshot
        split) + MongodbStreamFetchTask ($changeStream cursor,
        fullDocument=updateLookup per MongodbSourceConfig) with
        ChangeStreamOffset as the watermark. The stream opens BEFORE the
        snapshot read — its operationTime is the stitch watermark, so
        writes landing mid-snapshot replay on top (same
        slot-before-snapshot ordering as the Postgres path)."""
        from seatunnel_spark.sources.cdc import stitch_snapshot_and_changelog
        from seatunnel_spark.sources.mongodb import (MongoClientLite,
                                                     _doc_to_row)

        hosts = str(self.opt("hosts") or "127.0.0.1:27017")
        user = self.opt("username") or self.opt("user")
        pw = self.opt("password")
        cred = f"{user}:{pw}@" if user else ""
        uri = f"mongodb://{cred}{hosts.split(',')[0].strip()}"
        db, _, coll = table_full.rpartition(".")
        sch = self._mongo_schema_for(table_full)
        fields = dict(sch.get("fields") or {"_id": "string"})
        schema = parse_schema(fields)
        pk = list((sch.get("primaryKey") or {}).get("columnNames")
                  or ["_id"])
        if not hasattr(self, "discovered_keys"):
            self.discovered_keys = {}
        self.discovered_keys[table_full] = pk
        self.discovered_keys[coll] = pk

        cl = MongoClientLite(uri)
        try:
            watermark, events = cl.change_stream(db, coll)
            docs = list(cl.find_all(db, coll))
        finally:
            cl.close()

        def payload(doc):
            if doc is None:
                return None
            return {f.name: _jsonable_cell(v) for f, v in
                    zip(schema.fields, _doc_to_row(doc, schema))}

        lines = []
        for ev in events:
            op = {"insert": "c", "replace": "u", "update": "u",
                  "delete": "d"}.get(str(ev.get("operationType")))
            if op is None:  # drop/rename/invalidate: no row effect here
                continue
            pos = int(ev.get("clusterTime") or 0)
            after = None if op == "d" else payload(ev.get("fullDocument"))
            # change streams carry no pre-image: deletes expose only the
            # documentKey; updates reuse the updateLookup post-image so
            # the -U retraction carries the key fields
            before = payload(ev.get("documentKey")) if op == "d" \
                else (after if op == "u" else None)
            lines.append(json.dumps({
                "before": before, "after": after, "op": op,
                "ts_ms": pos,
                "source": {"db": db, "table": coll, "pos": pos}}))

        raw = spark.createDataFrame([(ln,) for ln in lines] or
                                    [(None,)], "value string") \
            .filter(F.col("value").isNotNull())
        decoded = self._decode(raw, schema, table_full)
        snapshot = spark.createDataFrame(
            [_doc_to_row(d, schema) for d in docs], schema).withColumns({
                EVENT_TS_COL: F.lit(watermark).cast("long"),
                TABLE_ID_COL: F.lit(table_full),
            })
        return stitch_snapshot_and_changelog(
            snapshot, decoded, _OFFSET_COL, watermark)

    # ------------------------------------------------------------------
    def _require_replay(self) -> str:
        replay = self._replay_dir()
        if not replay:
            raise NotImplementedError(
                f"source {self.plugin_name}: no replay dir and no live "
                "base-url. Production paths: base-url to a MySQL-wire "
                "server (binlog dump) or a debezium Kafka topic; replay "
                "path: set replay.dir / $SEATUNNEL_SPARK_CDC_REPLAY "
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
                            self._record_ddl(
                                os.path.basename(tdir), ev["ddl"])
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
                table: str, renames: list | None = None) -> DataFrame:
        """Debezium envelope -> changelog rows with ROW_KIND, offset
        (source.pos, falling back to ts_ms), event time, table id.
        Updates expand to -U/+U pairs (DebeziumRowConverter.java).

        `renames` ((old, new) pairs from mid-stream CHANGE COLUMN DDL):
        events emitted BEFORE the rename carry the old field name in
        their payload JSON — the decode schema admits both names and
        the projection coalesces new-name-first, so those rows keep
        their values under the final schema."""
        dec_schema = schema
        old_for: dict[str, str] = {}
        if renames:
            tmap = {f.name: f.dataType for f in schema.fields}
            extra = []
            for old, new in renames:
                if old not in tmap and new in tmap:
                    extra.append(T.StructField(old, tmap[new]))
                    old_for[new] = old
            if extra:
                dec_schema = T.StructType(list(schema.fields) + extra)
        env = T.StructType([
            T.StructField("before", dec_schema),
            T.StructField("after", dec_schema),
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
        def _field(f):
            c = F.col("e.payload")[f.name]
            if f.name in old_for:
                c = F.coalesce(c, F.col("e.payload")[old_for[f.name]])
            return c.alias(f.name)

        return e.select(
            *[_field(f) for f in schema.fields],
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

    def _live_mode(self) -> bool:
        if self._replay_dir():
            return False
        if self.opt("base-url") or self.opt("base_url"):
            return True
        # MongoDB-CDC declares `hosts`, not a jdbc base-url
        return self.plugin_name == "MongoDB-CDC" and bool(
            self.opt("hosts"))

    def _live_one(self, spark: SparkSession, table: str) -> DataFrame:
        if self.plugin_name == "MongoDB-CDC":
            return self._live_read_mongo_table(spark, table)
        url = str(self.opt("base-url") or self.opt("base_url") or "")
        if url.startswith(("jdbc:postgresql", "jdbc:opengauss")):
            return self._live_read_pg_table(spark, table)
        if url.startswith("jdbc:sqlserver"):
            return self._live_read_sqlserver_table(spark, table)
        return self._live_read_table(spark, table)

    def read(self, spark: SparkSession):
        tables = self._tables()
        if self._live_mode():
            if len(tables) == 1:
                return self._live_one(spark, tables[0])
            return {t: self._live_one(spark, t) for t in tables}
        replay = self._require_replay()
        if len(tables) == 1:
            return self._read_table(spark, replay, tables[0], False)
        return {t: self._read_table(spark, replay, t, False) for t in tables}

    def read_stream(self, spark: SparkSession):
        tables = self._tables()
        if self._live_mode():
            # bounded live tail (NON_BLOCK dump / CopyDone-terminated
            # replication stream) -> batch frame; the engine writes a
            # non-streaming frame once per run
            if len(tables) == 1:
                return self._live_one(spark, tables[0])
            return {t: self._live_one(spark, t) for t in tables}
        replay = self._require_replay()
        if len(tables) == 1:
            return self._read_table(spark, replay, tables[0], True)
        return {t: self._read_table(spark, replay, t, True) for t in tables}


CDC_SOURCE_NAMES = [
    "MySQL-CDC", "Postgres-CDC", "Oracle-CDC", "SqlServer-CDC",
    "MongoDB-CDC", "TiDB-CDC", "Opengauss-CDC",
]

__all__ = ["CdcReplaySource", "CDC_SOURCE_NAMES", "apply_ddl"]
