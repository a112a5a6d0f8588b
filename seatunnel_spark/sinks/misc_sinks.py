"""Druid, Aliyun DataHub, and HBase (REST gateway) sinks — stdlib HTTP.

Reference parity:
  * connector-druid DruidWriter.java — POST an `index_parallel` task
    with INLINE data to /druid/indexer/v1/task (coordinatorUrl,
    datasource, batchSize; rows serialized tsv/json with an implicit
    __time primary timestamp).
  * connector-datahub (Aliyun) — PUT records to
    /projects/{p}/topics/{t}/shards with the DataHub JSON body and
    HMAC-SHA1 `DATAHUB` authorization (endpoint, project, topic,
    accessId/accessKey, retryTimes).
  * connector-hbase — rowkey_column(s) + rowkey_delimiter +
    family_name mapping; here via the standard HBase REST gateway
    (PUT /{table}/{rowkey} with base64 cells), the documented
    no-native-client path.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.request

from pyspark.sql import DataFrame

from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _post_json(url: str, payload, headers: dict | None = None,
               method: str = "POST", timeout: float = 60.0) -> dict:
    data = json.dumps(payload, default=str).encode()
    req = urllib.request.Request(
        url, data=data, method=method,
        headers={"Content-Type": "application/json", **(headers or {})})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        body = resp.read()
        return json.loads(body) if body else {}


class DruidSink(Sink):
    NAME = "Druid"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        groups = getattr(self, "table_groups", None)
        if groups:
            # multi-table fan-out with ${table_name} datasources
            # (fakesource_to_druid_with_multi.conf)
            for tid, tdf in groups.items():
                sub = DruidSink(self.options)
                sub.plugin_name = self.plugin_name
                sub.input_name = tid
                sub.write(tdf)
            return
        raw = str(self.require("coordinatorUrl")).rstrip("/")
        if "://" not in raw:  # conf writes bare host:port
            raw = f"http://{raw}"
        base = apply_host_aliases(raw)
        datasource = str(self.require("datasource"))
        if "${table_name}" in datasource:
            datasource = datasource.replace(
                "${table_name}",
                str(getattr(self, "input_name", None)
                    or "default").split(".")[-1])
        batch_size = int(self.opt("batchSize", 10000))
        columns = [c for c in df.columns
                   if c not in (ROW_KIND_COL, TABLE_ID_COL)]
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            buf: list[dict] = []

            def flush():
                if not buf:
                    return
                now_ms = int(time.time() * 1000)
                for d in buf:
                    d.setdefault("__time", now_ms)
                task = {
                    "type": "index_parallel",
                    "spec": {
                        "ioConfig": {
                            "type": "index_parallel",
                            "inputSource": {
                                "type": "inline",
                                "data": "\n".join(
                                    json.dumps(d, default=str)
                                    for d in buf)},
                            "inputFormat": {"type": "json"},
                        },
                        "dataSchema": {
                            "dataSource": datasource,
                            "timestampSpec": {"column": "__time",
                                              "format": "millis"},
                            "dimensionsSpec": {"dimensions": columns},
                        },
                    },
                }
                _post_json(f"{base}/druid/indexer/v1/task", task)
                buf.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                buf.append(d)
                if len(buf) >= batch_size:
                    flush()
            flush()

        df.foreachPartition(write_partition)


class DataHubSink(Sink):
    NAME = "DataHub"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        raw_ep = str(self.require("endpoint")).rstrip("/")
        if "://" not in raw_ep:  # confs may write a bare host
            raw_ep = f"http://{raw_ep}"
        endpoint = apply_host_aliases(raw_ep)
        project = self.require("project")
        topic = self.require("topic")
        access_id = self.opt("accessId", "")
        access_key = self.opt("accessKey", "")
        retries = int(self.opt("retryTimes", 3))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]
        path = f"/projects/{project}/topics/{topic}/shards"

        def write_partition(rows):
            records = []
            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                records.append({
                    "ShardId": "0", "Attributes": {},
                    "Data": base64.b64encode(
                        json.dumps(d, default=str).encode()).decode()})
            if not records:
                return
            gmt = time.strftime("%a, %d %b %Y %H:%M:%S GMT", time.gmtime())
            # Aliyun DataHub HMAC-SHA1 canonical string
            to_sign = f"POST\napplication/json\n{gmt}\n{path}"
            sig = base64.b64encode(
                hmac.new(access_key.encode(), to_sign.encode(),
                         hashlib.sha1).digest()).decode()
            headers = {"Date": gmt,
                       "Authorization": f"DATAHUB {access_id}:{sig}",
                       "x-datahub-client-version": "1.1"}
            body = {"Action": "pub", "Records": records}
            last = None
            for _ in range(retries):
                try:
                    _post_json(endpoint + path, body, headers)
                    return
                except Exception as e:  # noqa: BLE001
                    last = e
                    time.sleep(0.2)
            raise last  # type: ignore[misc]

        df.foreachPartition(write_partition)


class HbaseRestSink(Sink):
    """HBase via the standard REST gateway (hbase rest start, port
    8080): PUT /{table}/{rowkey} with base64 {family:qualifier} cells
    — the no-native-client deployment path. rowkey_column(s) +
    rowkey_delimiter + family_name mirror the reference's mapping;
    `zookeeper_quorum` confs resolve the gateway from the quorum host
    under a host alias (the reference speaks ZK + HBase RPC; the REST
    gateway is the deployment stand-in here). Arrays serialize as
    "a,b,c" — HbaseSinkWriter.convertColumnToBytes strips brackets and
    spaces from the list rendering. SchemaSaveMode × DataSaveMode ride
    the gateway's /schema endpoints (create / drop+recreate /
    exists-probe)."""

    NAME = "Hbase"

    def wants_observation(self) -> bool:
        return False

    def _base(self) -> str:
        url = self.opt("rest_url")
        if not url:
            first = str(self.require("zookeeper_quorum")) \
                .split(",")[0].strip()
            url = f"http://{first}"
        return apply_host_aliases(str(url).rstrip("/"))

    def _handle_save_mode(self, base: str, table: str) -> None:
        schema_mode = str(self.opt("schema_save_mode",
                                   "CREATE_SCHEMA_WHEN_NOT_EXIST")).upper()
        data_mode = str(self.opt("data_save_mode", "APPEND_DATA")).upper()

        def exists() -> bool:
            req = urllib.request.Request(
                f"{base}/{table}/schema",
                headers={"Accept": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=30):
                    return True
            except urllib.error.HTTPError as e:
                if e.code == 404:
                    return False
                raise

        def create() -> None:
            _post_json(f"{base}/{table}/schema",
                       {"name": table}, method="PUT")

        def drop() -> None:
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/{table}/schema", method="DELETE"), timeout=30)

        have = exists()
        if schema_mode == "ERROR_WHEN_SCHEMA_NOT_EXIST" and not have:
            raise ValueError(f"Hbase sink: table {table!r} missing "
                             "(ERROR_WHEN_SCHEMA_NOT_EXIST)")
        if schema_mode == "RECREATE_SCHEMA":
            if have:
                drop()
            create()
            return
        if not have:
            create()
            return
        if data_mode == "DROP_DATA":
            drop()
            create()
        elif data_mode == "ERROR_WHEN_DATA_EXISTS":
            req = urllib.request.Request(
                f"{base}/{table}/scanner", data=b'{"batch": 1}',
                headers={"Content-Type": "application/json"},
                method="PUT")
            with urllib.request.urlopen(req, timeout=30) as resp:
                scanner = resp.headers.get("Location")
            try:
                g = urllib.request.Request(
                    scanner, headers={"Accept": "application/json"})
                with urllib.request.urlopen(g, timeout=30) as resp:
                    if resp.status == 200 and \
                            json.loads(resp.read() or b"{}").get("Row"):
                        raise ValueError(
                            f"Hbase sink: table {table!r} has data "
                            "(ERROR_WHEN_DATA_EXISTS)")
            except urllib.error.HTTPError as e:
                if e.code not in (204, 404):
                    raise
            finally:
                urllib.request.urlopen(urllib.request.Request(
                    scanner, method="DELETE"), timeout=30)

    def write(self, df: DataFrame) -> None:
        groups = getattr(self, "table_groups", None)
        if groups:
            # multi-table fan-out with ${table_name} per source table
            for tid, tdf in groups.items():
                sub = HbaseRestSink(self.options)
                sub.plugin_name = self.plugin_name
                sub.input_name = tid
                sub.write(tdf)
            return
        base = self._base()
        table = str(self.require("table")).replace(
            "${table_name}",
            str(getattr(self, "input_name", None) or "default")
            .split(".")[-1])
        self._handle_save_mode(base, table)
        rowkeys = self.opt("rowkey_column") or [self.require("rowkey")]
        if isinstance(rowkeys, str):
            rowkeys = [rowkeys]
        delim = self.opt("rowkey_delimiter", "")
        families = self.opt("family_name") or {}
        default_family = (families.get("all_columns")
                          or self.opt("family", "info"))
        batch = int(self.opt("batch", 100))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def b64(s) -> str:
            b = s if isinstance(s, bytes) else str(s).encode()
            return base64.b64encode(b).decode()

        def write_partition(rows):
            buf: list[dict] = []

            def flush():
                if not buf:
                    return
                _post_json(f"{base}/{table}/fakerow", {"Row": list(buf)},
                           method="PUT")
                buf.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                key = delim.join(str(d[k]) for k in rowkeys if k in d)
                cells = []
                for k, v in d.items():
                    if k in rowkeys or v is None:
                        continue
                    fam = families.get(k, default_family)
                    if isinstance(v, (list, tuple)):
                        # convertColumnToBytes ARRAY: list rendering
                        # with brackets/spaces stripped -> "a,b,c"
                        v = ",".join("" if x is None else str(x)
                                     for x in v)
                    cells.append({"column": b64(f"{fam}:{k}"),
                                  "$": b64(v)})
                buf.append({"key": b64(key), "Cell": cells})
                if len(buf) >= batch:
                    flush()
            flush()

        df.foreachPartition(write_partition)


__all__ = ["DruidSink", "DataHubSink", "HbaseRestSink"]
