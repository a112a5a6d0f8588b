"""Aliyun MaxCompute (ODPS) source/sink over the Tunnel REST API.

Reference: connector-maxcompute — MaxcomputeConfig.java (accessId,
accesskey, endpoint, project, table_name, partition_spec, split_row,
overwrite), MaxcomputeSourceReader.java (download session +
openRecordReader(start, count) row-range splits),
MaxcomputeWriter (upload session, block write, commit).

Wire protocol from the public ODPS SDK surface: a download session is
created with POST /projects/{p}/tables/{t}?downloads (JSON with
DownloadID/RecordCount/Schema), rows stream from
GET …/downloads/{id}?data&rowrange=(start,count) as a protobuf record
stream — each record's values are fields numbered column-index+1
(sint64 zigzag varints for integers/datetime, fixed64 doubles, varint
bools, length-delimited strings/decimals), terminated by an
END_RECORD marker field carrying the record's crc32c, with a trailing
META_COUNT record count (the public ProtobufRecordStreamReader
layout). Uploads PUT the same stream to …/uploads/{id}?blockid=N and
commit the block list. Requests carry the Aliyun ODPS
`ODPS {accessId}:{base64 hmac-sha1}` authorization over the canonical
(method, md5, type, date, x-odps-*, resource) string.

Spark design: row-range splits of `split_row` rows (the reference
enumerator's unit) fan out via parallelize — each executor task
streams only its range; the sink writes one block per partition and
the driver commits the block list (the Tunnel 2-phase contract).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import struct
import urllib.error
import urllib.request
from email.utils import formatdate

from pyspark.sql import DataFrame, SparkSession, functions as F

from seatunnel_spark import pb
from seatunnel_spark.kafka_wire import crc32c
from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

END_RECORD = 33553408  # public TunnelRecord protocol marker ids
META_COUNT = 33554430


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def encode_records(rows: list[tuple], types: list[str]) -> bytes:
    """Rows -> tunnel protobuf record stream (types are ODPS names)."""
    out = bytearray()
    for row in rows:
        rec = bytearray()
        for i, (v, t) in enumerate(zip(row, types)):
            if v is None:
                continue
            num = i + 1
            t = t.lower()
            if t in ("bigint", "int", "smallint", "tinyint", "datetime"):
                rec += pb.tag(num, 0) + pb.varint(_zigzag(int(v)))
            elif t in ("double", "float"):
                rec += pb.tag(num, 1) + struct.pack("<d", float(v))
            elif t == "boolean":
                rec += pb.tag(num, 0) + pb.varint(1 if v else 0)
            else:  # string / decimal / date / map / array as text
                rec += pb.fbytes(num, str(v).encode())
        out += rec
        out += pb.tag(END_RECORD, 0) + pb.varint(crc32c(bytes(rec)))
    out += pb.tag(META_COUNT, 0) + pb.varint(len(rows))
    return bytes(out)


def decode_records(data: bytes, types: list[str]) -> list[tuple]:
    """Tunnel record stream -> rows (None-padded to len(types))."""
    rows: list[tuple] = []
    cur: dict[int, object] = {}
    i = 0
    n = len(data)
    while i < n:
        key, i = pb.read_varint(data, i)
        num, wire = key >> 3, key & 7
        if num == END_RECORD:
            _, i = pb.read_varint(data, i)  # record crc
            rows.append(tuple(cur.get(c) for c in range(len(types))))
            cur = {}
            continue
        if num == META_COUNT:
            _, i = pb.read_varint(data, i)
            continue
        col = num - 1
        t = types[col].lower() if col < len(types) else "string"
        if wire == 0:
            raw, i = pb.read_varint(data, i)
            if t == "boolean":
                cur[col] = bool(raw)
            else:
                cur[col] = _unzigzag(raw)
        elif wire == 1:
            cur[col] = struct.unpack_from("<d", data, i)[0]
            i += 8
        elif wire == 2:
            ln, i = pb.read_varint(data, i)
            cur[col] = data[i:i + ln].decode()
            i += ln
        else:  # pragma: no cover
            raise ValueError(f"tunnel stream: wire type {wire}")
    return rows


_ODPS_TO_SPARK = {
    "bigint": "bigint", "int": "int", "smallint": "smallint",
    "tinyint": "tinyint", "double": "double", "float": "float",
    "boolean": "boolean", "datetime": "timestamp", "date": "date",
    "string": "string", "decimal": "decimal(38,10)",
}


class OdpsTunnelClient:
    def __init__(self, endpoint: str, project: str, access_id: str,
                 access_key: str, base_url: str | None = None):
        if base_url is None:
            base_url = apply_host_aliases(
                endpoint if "://" in endpoint else f"http://{endpoint}")
        self.base = base_url.rstrip("/")
        self.project = project
        self.ak = access_id
        self.sk = access_key

    def _call(self, method: str, path: str, query: str = "",
              body: bytes = b"", ctype: str = "application/json",
              ) -> bytes:
        date = formatdate(usegmt=True)
        md5 = hashlib.md5(body).hexdigest() if body else ""
        resource = path + (f"?{query}" if query else "")
        sign = f"{method}\n{md5}\n{ctype}\n{date}\n{resource}"
        sig = base64.b64encode(hmac.new(
            self.sk.encode(), sign.encode(), hashlib.sha1).digest()).decode()
        headers = {"Authorization": f"ODPS {self.ak}:{sig}",
                   "Date": date, "Content-Type": ctype}
        if md5:
            headers["Content-MD5"] = md5
        req = urllib.request.Request(self.base + resource, method=method,
                                     data=body or None, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:  # noqa: S310
                return resp.read()
        except urllib.error.HTTPError as e:
            raise RuntimeError(
                f"ODPS {method} {resource} -> {e.code}: "
                f"{e.read().decode(errors='replace')}") from e

    def _table_path(self, table: str) -> str:
        return f"/projects/{self.project}/tables/{table}"

    def create_download(self, table: str,
                        partition_spec: str | None = None) -> dict:
        q = "downloads"
        if partition_spec:
            q += f"&partition={urllib.request.quote(partition_spec)}"
        return json.loads(self._call("POST", self._table_path(table), q))

    def read_rows(self, table: str, download_id: str, start: int,
                  count: int, types: list[str],
                  partition_spec: str | None = None) -> list[tuple]:
        q = f"data&downloadid={download_id}&rowrange=({start},{count})"
        if partition_spec:
            q += f"&partition={urllib.request.quote(partition_spec)}"
        data = self._call("GET", self._table_path(table), q,
                          ctype="application/octet-stream")
        return decode_records(data, types)

    def create_upload(self, table: str,
                      partition_spec: str | None = None) -> dict:
        q = "uploads"
        if partition_spec:
            q += f"&partition={urllib.request.quote(partition_spec)}"
        return json.loads(self._call("POST", self._table_path(table), q))

    def write_block(self, table: str, upload_id: str, block_id: int,
                    payload: bytes,
                    partition_spec: str | None = None) -> None:
        q = f"uploadid={upload_id}&blockid={block_id}"
        if partition_spec:
            q += f"&partition={urllib.request.quote(partition_spec)}"
        self._call("PUT", self._table_path(table), q, payload,
                   "application/octet-stream")

    def commit_upload(self, table: str, upload_id: str, blocks: list[int],
                      partition_spec: str | None = None) -> None:
        q = f"uploadid={upload_id}"
        if partition_spec:
            q += f"&partition={urllib.request.quote(partition_spec)}"
        self._call("POST", self._table_path(table), q,
                   json.dumps({"blocks": blocks}).encode())

    def truncate(self, table: str) -> None:
        self._call("DELETE", self._table_path(table), "data")


class MaxcomputeSource(Source):
    NAME = "Maxcompute"

    def read(self, spark: SparkSession) -> DataFrame:
        cl = OdpsTunnelClient(self.require("endpoint"),
                              self.require("project"),
                              self.require("accessId"),
                              self.require("accesskey"))
        table = self.require("table_name")
        part = self.opt("partition_spec")
        split_row = int(self.opt("split_row", 10000))
        session = cl.create_download(table, part)
        did = session["DownloadID"]
        total = int(session["RecordCount"])
        schema = session["Schema"]["columns"]
        names = [c["name"] for c in schema]
        types = [c["type"] for c in schema]
        ranges = [(s, min(split_row, total - s))
                  for s in range(0, total, split_row)] or [(0, 0)]

        base_url, project, ak, sk = cl.base, cl.project, cl.ak, cl.sk

        def fetch(rng):
            c = OdpsTunnelClient("", project, ak, sk, base_url=base_url)
            rows = c.read_rows(table, did, rng[0], rng[1], types, part)
            return [tuple(None if v is None else str(v) for v in r)
                    for r in rows]

        rdd = spark.sparkContext.parallelize(ranges, len(ranges)) \
            .flatMap(fetch)
        str_ddl = ", ".join(f"`{c}` string" for c in names)
        raw = spark.createDataFrame(rdd, str_ddl)
        typed = []
        for c, t in zip(names, types):
            col = F.col(f"`{c}`")
            if t.lower() == "datetime":  # rides as epoch millis
                typed.append(F.timestamp_millis(
                    col.cast("long")).alias(c))
            else:
                typed.append(col.cast(
                    _ODPS_TO_SPARK.get(t.lower(), "string")).alias(c))
        return raw.select(*typed)


class MaxcomputeSink(Sink):
    NAME = "Maxcompute"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        cl = OdpsTunnelClient(self.require("endpoint"),
                              self.require("project"),
                              self.require("accessId"),
                              self.require("accesskey"))
        table = self.require("table_name")
        part = self.opt("partition_spec")
        if bool(self.opt("overwrite", False)):
            cl.truncate(table)
        session = cl.create_upload(table, part)
        uid = session["UploadID"]
        data = df.drop(*[c for c in (ROW_KIND_COL, TABLE_ID_COL)
                         if c in df.columns])
        cols = data.columns
        spark_types = [f.dataType.simpleString() for f in data.schema.fields]
        odps = [{"bigint": "bigint", "int": "int", "double": "double",
                 "float": "float", "boolean": "boolean",
                 "timestamp": "datetime"}.get(
                     t.split("(")[0], "string") for t in spark_types]
        base_url, project, ak, sk = cl.base, cl.project, cl.ak, cl.sk

        def write_block(idx, rows):
            vals = []
            for row in rows:
                d = row.asDict(recursive=True)
                rec = []
                for c, t in zip(cols, odps):
                    v = d.get(c)
                    if v is not None and t == "datetime":
                        v = int(v.timestamp() * 1000) \
                            if hasattr(v, "timestamp") else int(v)
                    rec.append(v)
                vals.append(tuple(rec))
            if not vals:
                return iter(())
            c = OdpsTunnelClient("", project, ak, sk, base_url=base_url)
            c.write_block(table, uid, idx, encode_records(vals, odps), part)
            return iter([idx])

        blocks = data.rdd.mapPartitionsWithIndex(write_block).collect()
        cl.commit_upload(table, uid, sorted(blocks), part)


__all__ = ["MaxcomputeSource", "MaxcomputeSink", "OdpsTunnelClient",
           "encode_records", "decode_records"]
