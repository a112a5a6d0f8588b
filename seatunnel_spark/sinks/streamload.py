"""Doris / StarRocks sinks via the public Stream Load HTTP protocol.

Reference: connector-doris (sink/writer/DorisStreamLoad.java — PUT
/api/{db}/{table}/_stream_load, label header, json+read_json_by_line,
__DORIS_DELETE_SIGN__ hidden column for deletes, sink.label-prefix,
schema/data savemodes) and connector-starrocks (StarRocksStreamLoad-
Visitor — nodeUrls, strip_outer_array JSON batches, __op column: 0
upsert / 1 delete on primary-key models).

Spark shape: one HTTP load per partition batch (batch_max_rows /
doris.batch.size), labels derived from label-prefix + uuid so retried
batches dedupe server-side (the same idempotence story the reference's
2pc labels provide).
"""

from __future__ import annotations

import base64
import json
import time
import uuid

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _jsonable(v):
    import datetime as _dt
    import decimal

    if isinstance(v, (_dt.datetime,)):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3]
    if isinstance(v, (_dt.date, _dt.time)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    return v


def stream_load(base_url: str, db: str, table: str, rows_json: list[str],
                username: str, password: str, label: str,
                extra_headers: dict | None = None,
                max_retries: int = 3) -> dict:
    """One Stream Load transaction (PUT ..._stream_load)."""
    import urllib.request

    url = f"{base_url}/api/{db}/{table}/_stream_load"
    body = ("[" + ",".join(rows_json) + "]").encode()
    tok = base64.b64encode(f"{username}:{password}".encode()).decode()
    headers = {
        "Authorization": f"Basic {tok}",
        "Content-Type": "application/json",
        "format": "json",
        "strip_outer_array": "true",
        "label": label,
        **(extra_headers or {}),
    }
    last = None
    for attempt in range(max_retries):
        req = urllib.request.Request(url, data=body, headers=headers,
                                     method="PUT")
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                out = json.loads(resp.read() or b"{}")
            if out.get("Status") in ("Success", "Publish Timeout", "OK",
                                     None):
                return out
            last = RuntimeError(f"stream load failed: {out}")
        except Exception as e:  # noqa: BLE001
            last = e
        time.sleep(min(2 ** attempt, 5))
    raise last  # type: ignore[misc]


class _StreamLoadSink(Sink):
    table_groups = None
    input_name = "sink"

    DELETE_COL = "__op"           # StarRocks primary-key model
    DELETE_VALUES = ("0", "1")    # upsert, delete

    def wants_observation(self) -> bool:
        return False

    def _endpoints(self) -> list[str]:
        raise NotImplementedError

    def _db_table(self) -> tuple[str, str]:
        raise NotImplementedError

    _SPARK_TO_OLAP = {
        "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INT",
        "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
        "boolean": "BOOLEAN", "date": "DATE", "timestamp": "DATETIME",
        "string": "STRING", "binary": "STRING",
    }

    def _fe_sql_host(self) -> tuple[str, int]:
        """FE SQL (mysql-protocol) endpoint: fenodes host + query-port
        (Doris FE 9030 / StarRocks 9030 by default)."""
        from urllib.parse import urlsplit

        first = self._endpoints()[0]
        host = urlsplit(first).hostname
        return host, int(self.opt("query-port") or self.opt("query_port")
                         or 9030)

    def _handle_save_mode(self, df: DataFrame, db: str, table: str,
                          username: str, password: str) -> None:
        """SupportSaveMode over the FE SQL port (the reference's
        DorisSaveModeHandler: DDL from save_mode_create_template with
        the SaveModePlaceHolder vocabulary, RECREATE_SCHEMA drop,
        DROP_DATA truncate, CUSTOM_PROCESSING custom_sql —
        connector-doris/.../catalog/DorisCatalog.java). No-op when the
        conf requests nothing (plain stream load)."""
        schema_mode = str(self.opt("schema_save_mode") or "").upper()
        data_mode = str(self.opt("data_save_mode") or "").upper()
        template = self.opt("save_mode_create_template")
        custom = self.opt("custom_sql")
        if not (schema_mode or template
                or data_mode in ("DROP_DATA", "CUSTOM_PROCESSING")):
            return
        from seatunnel_spark.mysql_wire import MySqlClient

        fields = [f for f in df.schema.fields
                  if f.name not in (ROW_KIND_COL, TABLE_ID_COL)]

        def olap_type(dt):
            s = dt.simpleString()
            return s.upper() if s.startswith("decimal") else \
                self._SPARK_TO_OLAP.get(s, "STRING")

        cols_ddl = ", ".join(f"`{f.name}` {olap_type(f.dataType)}"
                             for f in fields)
        first_key = f"`{fields[0].name}`" if fields else "`id`"
        ddl = template or (
            f"CREATE TABLE IF NOT EXISTS `{db}`.`{table}` ({cols_ddl}) "
            f"ENGINE=OLAP DUPLICATE KEY ({first_key}) "
            f"DISTRIBUTED BY HASH ({first_key})")
        for ph, val in (("${database}", db), ("${table}", table),
                        ("${table_name}", table),
                        ("${rowtype_fields}", cols_ddl),
                        ("${rowtype_duplicate_key}", first_key),
                        ("${rowtype_unique_key}", first_key),
                        ("${rowtype_primary_key}", first_key),
                        ("${comment}", str(self.opt("comment", "")))):
            ddl = str(ddl).replace(ph, str(val))
        host, port = self._fe_sql_host()
        cl = MySqlClient(host, port, username, password)
        try:
            if schema_mode == "RECREATE_SCHEMA":
                cl.execute(f"DROP TABLE IF EXISTS `{db}`.`{table}`")
            if schema_mode in ("", "CREATE_SCHEMA_WHEN_NOT_EXIST",
                               "RECREATE_SCHEMA",
                               "CREATE_SCHEMA_WHEN_NOT_EXIST_AND_DROP_DATA"):
                cl.execute(ddl)
            if data_mode == "DROP_DATA" or schema_mode == \
                    "CREATE_SCHEMA_WHEN_NOT_EXIST_AND_DROP_DATA":
                cl.execute(f"TRUNCATE TABLE `{db}`.`{table}`")
            elif data_mode == "CUSTOM_PROCESSING" and custom:
                for stmt in ([custom] if isinstance(custom, str)
                             else list(custom)):
                    cl.execute(str(stmt))
        finally:
            cl.close()

    def write(self, df: DataFrame) -> None:
        if self.table_groups:
            for tid, tdf in self.table_groups.items():
                sub = type(self)(self.options)
                sub.plugin_name = self.plugin_name
                sub.input_name = tid
                sub.write(tdf)
            return
        endpoints = [apply_host_aliases(e) for e in self._endpoints()]
        db, table = self._db_table()
        table = table.replace("${table_name}", self.input_name.split(".")[-1])
        username = str(self.opt("username", "root"))
        password = str(self.opt("password", ""))
        self._handle_save_mode(df, db, table, username, password)
        prefix = (self.opt("sink.label-prefix")
                  or self.opt("sink.label.prefix") or "seatunnel")
        batch_rows = int(self.opt("batch_max_rows")
                         or self.opt("doris.batch.size") or 1024)
        retries = int(self.opt("max_retries", 3))
        has_kind = ROW_KIND_COL in df.columns
        del_col, (up_v, del_v) = self.DELETE_COL, self.DELETE_VALUES
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            buf: list[str] = []

            def flush():
                if not buf:
                    return
                label = f"{prefix}_{uuid.uuid4().hex}"
                stream_load(endpoints[0], db, table, list(buf), username,
                            password, label, max_retries=retries)
                buf.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                kind = d.get(ROW_KIND_COL, "+I") if has_kind else "+I"
                for c in meta:
                    d.pop(c, None)
                doc = {k: _jsonable(v) for k, v in d.items()}
                if has_kind:
                    if kind == "-U":
                        continue  # superseded by the +U that follows
                    doc[del_col] = del_v if kind == "-D" else up_v
                buf.append(json.dumps(doc))
                if len(buf) >= batch_rows:
                    flush()
            flush()

        df.foreachPartition(write_partition)


class DorisSink(_StreamLoadSink):
    NAME = "Doris"

    # sink/writer/serializer: hidden delete-sign column
    DELETE_COL = "__DORIS_DELETE_SIGN__"
    DELETE_VALUES = ("0", "1")

    def _endpoints(self) -> list[str]:
        fe = self.require("fenodes")
        nodes = fe if isinstance(fe, list) else str(fe).split(",")
        return [n if "://" in n else f"http://{n.strip()}" for n in nodes]

    def _db_table(self) -> tuple[str, str]:
        ident = self.opt("table.identifier")
        if ident:
            db, _, table = str(ident).partition(".")
            return db, table
        return self.require("database"), self.require("table")


class StarRocksSink(_StreamLoadSink):
    NAME = "StarRocks"

    def _endpoints(self) -> list[str]:
        nodes = self.require("nodeUrls")
        nodes = nodes if isinstance(nodes, list) else [nodes]
        return [n if "://" in n else f"http://{n.strip()}" for n in nodes]

    def _db_table(self) -> tuple[str, str]:
        return self.require("database"), self.require("table")


__all__ = ["DorisSink", "StarRocksSink", "stream_load"]
