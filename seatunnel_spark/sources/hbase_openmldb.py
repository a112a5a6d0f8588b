"""HBase source (REST gateway scanner) and OpenMldb source (APIServer
HTTP SQL) — stdlib HTTP.

Reference parity: connector-hbase source (table, family/qualifier
decode, caching/batch) via the standard REST gateway's stateful
scanner (PUT /{table}/scanner -> Location, GET drains cell batches);
connector-openmldb (host/port/database/sql, online/offline mode) via
the APIServer's POST /dbs/{db}/sql endpoint.
"""

from __future__ import annotations

import base64
import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import parse_schema


class HbaseRestSource(Source):
    """HBase read via the REST gateway's stateful scanner. The conf
    declares columns either as plain qualifiers or family-qualified
    "info:age" names (HbaseParameters.queryColumns — a `rowkey` column
    carries the key); `zookeeper_quorum` resolves the gateway like the
    sink. query_columns is the declared projection (the schema's
    columns are exactly that list in the reference confs)."""

    NAME = "Hbase"

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.sources.mongodb import _convert
        from pyspark.sql import types as T

        url = self.opt("rest_url")
        if not url:
            first = str(self.require("zookeeper_quorum")) \
                .split(",")[0].strip()
            url = f"http://{first}"
        base = apply_host_aliases(str(url).rstrip("/"))
        table = self.require("table")
        batch = int(self.opt("caching", 1000))
        schema_opt = self.opt("schema") or {}
        fields = schema_opt.get("fields")
        if not fields and "columns" in schema_opt:
            fields = {c["name"]: c["type"]
                      for c in schema_opt["columns"]}
        if not fields:
            raise ValueError("Hbase source: schema.fields required "
                             "(rowkey + qualifier columns)")
        schema = parse_schema(fields)
        rowkey_col = self.opt("rowkey_column") or ["rowkey"]
        if isinstance(rowkey_col, str):
            rowkey_col = [rowkey_col]

        # stateful scanner: create, then drain batches
        req = urllib.request.Request(
            f"{base}/{table}/scanner",
            data=json.dumps({"batch": batch}).encode(),
            headers={"Content-Type": "application/json",
                     "Accept": "application/json"}, method="PUT")
        with urllib.request.urlopen(req, timeout=60) as resp:
            scanner = resp.headers.get("Location")
        rows: dict[str, dict] = {}
        while True:
            g = urllib.request.Request(
                scanner, headers={"Accept": "application/json"})
            try:
                with urllib.request.urlopen(g, timeout=60) as resp:
                    if resp.status == 204:
                        break
                    payload = json.loads(resp.read() or b"{}")
            except urllib.error.HTTPError as e:
                if e.code in (204, 404):
                    break
                raise
            got = payload.get("Row") or []
            if not got:
                break
            for r in got:
                key = base64.b64decode(r["key"]).decode()
                doc = rows.setdefault(key, {})
                for cell in r.get("Cell", []):
                    col = base64.b64decode(cell["column"]).decode()
                    val = base64.b64decode(cell["$"]).decode()
                    # addressable by bare qualifier AND "family:qual"
                    doc[col.split(":", 1)[-1]] = val
                    doc[col] = val
        urllib.request.urlopen(urllib.request.Request(
            scanner, method="DELETE"), timeout=30)

        data = []
        for key, doc in sorted(rows.items()):
            for rc in rowkey_col:
                doc.setdefault(rc, key)
            data.append(tuple(_convert(doc.get(f.name), f.dataType)
                              for f in schema.fields))
        return spark.createDataFrame(data, schema)


class OpenMldbSource(Source):
    NAME = "OpenMldb"

    def read(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.sources.mongodb import _convert

        host = self.opt("host", "127.0.0.1")
        port = int(self.opt("port", 9080))
        base = apply_host_aliases(f"http://{host}:{port}")
        db = self.require("database")
        sql = self.require("sql")
        online = bool(self.opt("online_mode", True))
        fields = (self.opt("schema") or {}).get("fields")
        if not fields:
            raise ValueError("OpenMldb source: schema.fields required")
        schema = parse_schema(fields)

        req = urllib.request.Request(
            f"{base}/dbs/{db}/sql",
            data=json.dumps({"sql": sql, "mode": "online" if online
                             else "offsync"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read() or b"{}")
        if out.get("code") not in (0, None):
            raise RuntimeError(f"openmldb sql failed: {out}")
        data = (out.get("data") or {})
        cols = [c.get("name") if isinstance(c, dict) else c
                for c in data.get("schema") or []]
        idx = {c: i for i, c in enumerate(cols)}
        recs = [tuple(_convert(r[idx[f.name]] if f.name in idx else None,
                               f.dataType) for f in schema.fields)
                for r in data.get("rows") or []]
        return spark.createDataFrame(recs, schema)


__all__ = ["HbaseRestSource", "OpenMldbSource"]
