"""Aliyun SLS (Log Service) source/sink over the public REST API.

Reference: connector-sls — Config.java (endpoint/project/logstore/
access_key_id/access_key_secret/consumer_group/batch_size/start_mode/
auto_cursor_reset), SlsSourceSplitEnumerator.java (one split per
shard), FastLogDeserializationContent/-Schema (content-JSON vs typed
field mapping), SeatunnelRowSerialization (each row becomes one Log
with a single `content` key holding the row JSON), SlsSinkWriter
(PutLogs batches of LOG_GROUP_SIZE).

Wire format from the public API docs + Logs.proto: LogGroup protobuf
(Log{Time=1, Contents=2{Key=1,Value=2}}, LogGroup{Logs=1, Topic=3,
Source=4}, LogGroupList{1}) over HTTP with the Aliyun LOG
HMAC-SHA1 signature (SignString = VERB\nMD5\nTYPE\nDATE\n
x-log-headers\nresource). Bodies are sent/accepted uncompressed
(x-log-compresstype is not set; production SLS also accepts raw).

Spark design: shards are the split unit (the reference enumerator's
contract) — each executor task drains its shard between its start
cursor and the end cursor captured at planning time, so a 100-shard
logstore reads with 100-way parallelism and nothing funnels through
the driver. GROUP_CURSOR start mode reads the consumer-group
checkpoint and commits the end cursor back after the batch
(at-least-once, exactly the reference's consumer-group behavior).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
import urllib.error
import urllib.request
from email.utils import formatdate

from pyspark.sql import DataFrame, SparkSession, functions as F

from seatunnel_spark import pb
from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL, parse_schema


def encode_log_group(logs: list[tuple[int, list[tuple[str, str]]]],
                     topic: str = "", source: str = "") -> bytes:
    out = b""
    for ts, contents in logs:
        body = pb.fvar(1, ts)
        for k, v in contents:
            body += pb.fbytes(2, pb.fstr(1, k) + pb.fstr(2, v))
        out += pb.fbytes(1, body)
    if topic:
        out += pb.fstr(3, topic)
    if source:
        out += pb.fstr(4, source)
    return out


def decode_log_group_list(data: bytes) -> list[dict]:
    """LogGroupList -> [{time, contents: {k: v}, topic, source}]."""
    out = []
    for group_pb in pb.decode(data).get(1, []):
        g = pb.decode(group_pb)
        topic = pb.first_str(g, 3, "")
        source = pb.first_str(g, 4, "")
        for log_pb in g.get(1, []):
            lg = pb.decode(log_pb)
            contents = {}
            for c in lg.get(2, []):
                cd = pb.decode(c)
                contents[pb.first_str(cd, 1, "")] = pb.first_str(cd, 2, "")
            out.append({"time": pb.first(lg, 1, 0), "contents": contents,
                        "topic": topic, "source": source})
    return out


class SlsClient:
    """Signed REST client for one project endpoint."""

    def __init__(self, endpoint: str, project: str, access_key_id: str,
                 access_key_secret: str, base_url: str | None = None):
        # base_url short-circuits alias resolution: the driver resolves
        # once and ships the final URL to executor tasks
        if base_url is None:
            ep = endpoint.replace("http://", "").replace("https://", "")
            base_url = apply_host_aliases(f"http://{project}.{ep}")
        self.base = base_url
        self.project = project
        self.ak = access_key_id
        self.sk = access_key_secret

    def _sign(self, verb: str, resource: str, headers: dict,
              body: bytes) -> None:
        headers["x-log-apiversion"] = "0.6.0"
        headers["x-log-signaturemethod"] = "hmac-sha1"
        headers["Date"] = formatdate(usegmt=True)
        md5 = ""
        if body:
            md5 = hashlib.md5(body).hexdigest().upper()
            headers["Content-MD5"] = md5
        ctype = headers.get("Content-Type", "")
        log_headers = "\n".join(
            f"{k.lower()}:{v}" for k, v in sorted(headers.items())
            if k.lower().startswith(("x-log-", "x-acs-")))
        sign_str = (f"{verb}\n{md5}\n{ctype}\n{headers['Date']}\n"
                    f"{log_headers}\n{resource}")
        sig = base64.b64encode(
            hmac.new(self.sk.encode(), sign_str.encode(),
                     hashlib.sha1).digest()).decode()
        headers["Authorization"] = f"LOG {self.ak}:{sig}"

    def _call(self, verb: str, path: str, query: dict | None = None,
              body: bytes = b"", ctype: str = "") -> tuple[dict, bytes]:
        q = "&".join(f"{k}={v}" for k, v in sorted((query or {}).items()))
        resource = path + (f"?{q}" if q else "")
        headers = {"x-log-bodyrawsize": str(len(body))}
        if ctype:
            headers["Content-Type"] = ctype
        self._sign(verb, resource, headers, body)
        req = urllib.request.Request(self.base + resource, method=verb,
                                     data=body or None, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
                return dict(resp.headers), resp.read()
        except urllib.error.HTTPError as e:  # pragma: no cover
            raise RuntimeError(f"SLS {verb} {resource} -> {e.code}: "
                               f"{e.read().decode(errors='replace')}") from e

    # -- API surface -------------------------------------------------------
    def list_shards(self, logstore: str) -> list[int]:
        _, data = self._call("GET", f"/logstores/{logstore}/shards")
        return [s["shardID"] for s in json.loads(data)]

    def get_cursor(self, logstore: str, shard: int, frm: str) -> str:
        _, data = self._call(
            "GET", f"/logstores/{logstore}/shards/{shard}",
            {"type": "cursor", "from": frm})
        return json.loads(data)["cursor"]

    def pull_logs(self, logstore: str, shard: int, cursor: str,
                  count: int = 1000) -> tuple[list[dict], str]:
        headers, data = self._call(
            "GET", f"/logstores/{logstore}/shards/{shard}",
            {"type": "log", "cursor": cursor, "count": count})
        next_cursor = headers.get("x-log-cursor", cursor)
        return decode_log_group_list(data), next_cursor

    def put_logs(self, logstore: str, group: bytes) -> None:
        self._call("POST", f"/logstores/{logstore}/shards/lb", body=group,
                   ctype="application/x-protobuf")

    def get_checkpoint(self, logstore: str, group: str,
                       shard: int) -> str | None:
        try:
            _, data = self._call(
                "GET", f"/logstores/{logstore}/consumergroups/{group}",
                {"type": "checkpoint", "shard": shard})
        except RuntimeError:
            return None
        rows = json.loads(data)
        for r in rows:
            if r.get("shard") == shard and r.get("checkpoint"):
                return r["checkpoint"]
        return None

    def update_checkpoint(self, logstore: str, group: str, shard: int,
                          cursor: str) -> None:
        body = json.dumps({"shard": shard, "checkpoint": cursor,
                           "forceSuccess": True}).encode()
        self._call("POST", f"/logstores/{logstore}/consumergroups/{group}",
                   {"type": "checkpoint"}, body, "application/json")


def _drain_shard(base_url, project, ak, sk, logstore, shard, start, end,
                 batch) -> list[tuple]:
    cl = SlsClient("", project, ak, sk, base_url=base_url)
    cursor = start
    rows = []
    while cursor != end:
        logs, nxt = cl.pull_logs(logstore, shard, cursor, batch)
        for lg in logs:
            rows.append((json.dumps(lg["contents"]), lg["time"],
                         lg["topic"], lg["source"], shard))
        if nxt == cursor:
            break
        cursor = nxt
    return rows


class SlsSource(Source):
    NAME = "Sls"

    def read(self, spark: SparkSession) -> DataFrame:
        endpoint = apply_host_aliases(str(self.require("endpoint")))
        project = self.require("project")
        logstore = self.require("logstore")
        ak, sk = self.require("access_key_id"), self.require("access_key_secret")
        group = self.opt("consumer_group", "SeaTunnel-Consumer-Group")
        batch = int(self.opt("batch_size", 1000))
        start_mode = str(self.opt("start_mode", "GROUP_CURSOR")).upper()
        reset = str(self.opt("auto_cursor_reset", "END")).upper()

        cl = SlsClient(endpoint, project, ak, sk)
        shards = cl.list_shards(logstore)
        plans = []  # (shard, start_cursor, end_cursor)
        for s in shards:
            if start_mode == "EARLIEST":
                start = cl.get_cursor(logstore, s, "begin")
            elif start_mode == "LATEST":
                start = cl.get_cursor(logstore, s, "end")
            elif start_mode == "TIMESTAMP":
                start = cl.get_cursor(
                    logstore, s, str(self.require("start_timestamp")))
            else:  # GROUP_CURSOR (reference default)
                start = cl.get_checkpoint(logstore, group, s)
                if start is None:
                    frm = "begin" if reset == "BEGIN" else "end"
                    start = cl.get_cursor(logstore, s, frm)
            plans.append((s, start, cl.get_cursor(logstore, s, "end")))

        base_url = cl.base
        rdd = spark.sparkContext.parallelize(plans, max(1, len(plans)))
        rows = rdd.flatMap(lambda p: _drain_shard(
            base_url, project, ak, sk, logstore, p[0], p[1], p[2], batch))
        raw = spark.createDataFrame(
            rows, "content string, log_time long, topic string, "
                  "source string, shard int")

        if start_mode == "GROUP_CURSOR":
            for s, _, end in plans:  # commit the batch's end position
                cl.update_checkpoint(logstore, group, s, end)

        schema_opt = self.opt("schema")
        fields = (schema_opt or {}).get("fields", schema_opt) or {}
        if schema_opt and list(fields) != ["content"]:
            # FastLogDeserializationSchema: every SLS content value is a
            # string; map declared fields by key and convert per type
            # (FastLogDeserializationSchema.convert:101)
            schema = parse_schema(fields)
            m = F.from_json("content", "map<string,string>")
            return raw.select(*[
                F.try_element_at(m, F.lit(f.name)).cast(f.dataType)
                .alias(f.name) for f in schema.fields])
        # FastLogDeserializationContent: one `content` JSON column
        return raw.select("content")


class SlsSink(Sink):
    NAME = "Sls"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        endpoint = apply_host_aliases(str(self.require("endpoint")))
        project = self.require("project")
        logstore = self.require("logstore")
        ak, sk = self.require("access_key_id"), self.require("access_key_secret")
        topic = self.opt("topic", "SeaTunnel-Topic")
        source = self.opt("source", "SeaTunnel-Source")
        group_size = int(self.opt("log_group_size", 100))
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]
        base_url = SlsClient(endpoint, project, ak, sk).base

        def write_partition(rows):
            cl = SlsClient("", project, ak, sk, base_url=base_url)
            pending: list[tuple[int, list[tuple[str, str]]]] = []

            def flush():
                if pending:
                    cl.put_logs(logstore, encode_log_group(
                        pending, topic=topic, source=source))
                    pending.clear()

            now = int(time.time())
            for row in rows:
                d = row.asDict(recursive=True)
                for c in meta:
                    d.pop(c, None)
                # SeatunnelRowSerialization: one `content` key per log
                pending.append(
                    (now, [("content", json.dumps(d, default=str))]))
                if len(pending) >= group_size:
                    flush()
            flush()

        df.foreachPartition(write_partition)


__all__ = ["SlsSource", "SlsSink", "SlsClient", "encode_log_group",
           "decode_log_group_list"]
