"""Aliyun Tablestore (OTS) source/sink over the public wire protocol.

Reference: connector-tablestore — TablestoreOptions.java (endPoint,
instanceName, accessKeyId, accessKeySecret, table, primaryKeys,
batchSize), TablestoreWriter/TablestoreSinkClient (BatchWriteRow of
RowPutChange/RowDeleteChange), TableStoreDBSourceReader (row streams).

Wire format from the public OTS protocol docs: protobuf request/
response bodies (table_store.proto) with rows serialized in the
PlainBuffer binary layout — header magic 0x75, TAG_ROW_PK/TAG_ROW_DATA
cell lists, per-cell crc8 checksums folded into a row checksum
(polynomial 0x07). Requests carry the x-ots-* headers and the
hmac-sha1 signature over "/API\nPOST\n\n" + canonical x-ots headers.

Implemented APIs: PutRow, DeleteRow, BatchWriteRow, GetRange. The
source runs paginated forward GetRange scans inside an executor task
(the reference reads via the Tunnel streaming service; bounded batch
reads map to range scans). The sink batches `batchSize` row changes
per BatchWriteRow call per partition, RowKind-mapped (+I/+U put,
-D/-U delete), the reference writer's contract.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import struct
import urllib.error
import urllib.request
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from seatunnel_spark import pb
from seatunnel_spark.net import apply_host_aliases
from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

# ---------------------------------------------------------------- crc8
_CRC8_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE.append(_c)


def crc8(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = _CRC8_TABLE[(crc ^ b) & 0xFF]
    return crc


# ------------------------------------------------------- plainbuffer
HEADER = 0x75
TAG_ROW_PK, TAG_ROW_DATA, TAG_CELL = 0x1, 0x2, 0x3
TAG_CELL_NAME, TAG_CELL_VALUE = 0x4, 0x5
TAG_DELETE_MARKER, TAG_ROW_CHECKSUM = 0x8, 0x9
TAG_CELL_CHECKSUM = 0x0A
VT_INTEGER, VT_DOUBLE, VT_BOOLEAN, VT_STRING = 0x0, 0x1, 0x2, 0x3
VT_NULL, VT_BLOB = 0x6, 0x7
VT_INF_MIN, VT_INF_MAX = 0x9, 0xA

class _InfMin:
    """Range-scan lower sentinel (class-based so instances survive
    closure pickling into executor tasks — `object()` would not)."""


class _InfMax:
    """Range-scan upper sentinel."""


INF_MIN = _InfMin()
INF_MAX = _InfMax()


def _value_payload(v) -> bytes:
    if isinstance(v, _InfMin):
        return bytes([VT_INF_MIN])
    if isinstance(v, _InfMax):
        return bytes([VT_INF_MAX])
    if v is None:
        return bytes([VT_NULL])
    if isinstance(v, bool):
        return bytes([VT_BOOLEAN, 1 if v else 0])
    if isinstance(v, int):
        return bytes([VT_INTEGER]) + struct.pack("<q", v)
    if isinstance(v, float):
        return bytes([VT_DOUBLE]) + struct.pack("<d", v)
    if isinstance(v, (bytes, bytearray)):
        return bytes([VT_BLOB]) + struct.pack("<I", len(v)) + bytes(v)
    s = str(v).encode()
    return bytes([VT_STRING]) + struct.pack("<I", len(s)) + s


def _decode_value(payload: bytes):
    vt = payload[0]
    if vt == VT_INTEGER:
        return struct.unpack_from("<q", payload, 1)[0]
    if vt == VT_DOUBLE:
        return struct.unpack_from("<d", payload, 1)[0]
    if vt == VT_BOOLEAN:
        return payload[1] == 1
    if vt == VT_STRING:
        (ln,) = struct.unpack_from("<I", payload, 1)
        return payload[5:5 + ln].decode()
    if vt == VT_BLOB:
        (ln,) = struct.unpack_from("<I", payload, 1)
        return payload[5:5 + ln]
    if vt == VT_INF_MIN:
        return INF_MIN
    if vt == VT_INF_MAX:
        return INF_MAX
    return None


def _encode_cell(name: str, value) -> bytes:
    nb = name.encode()
    vp = _value_payload(value)
    cell = (bytes([TAG_CELL_NAME]) + struct.pack("<I", len(nb)) + nb
            + bytes([TAG_CELL_VALUE]) + struct.pack("<I", len(vp)) + vp)
    check = crc8(vp, crc8(nb))
    return (bytes([TAG_CELL]) + cell
            + bytes([TAG_CELL_CHECKSUM, check]))


def encode_row(pk: list[tuple[str, object]],
               attrs: list[tuple[str, object]] | None = None,
               delete: bool = False) -> bytes:
    """One row (without the stream header): PK cells + attr cells +
    row checksum."""
    out = bytes([TAG_ROW_PK])
    checks = []
    for name, v in pk:
        out += _encode_cell(name, v)
        checks.append(crc8(_value_payload(v), crc8(name.encode())))
    if attrs:
        out += bytes([TAG_ROW_DATA])
        for name, v in attrs:
            out += _encode_cell(name, v)
            checks.append(crc8(_value_payload(v), crc8(name.encode())))
    row_crc = 0
    for c in checks:
        row_crc = crc8(bytes([c]), row_crc)
    if delete:
        out += bytes([TAG_DELETE_MARKER])
        row_crc = crc8(b"\x01", row_crc)
    else:
        row_crc = crc8(b"\x00", row_crc)
    return out + bytes([TAG_ROW_CHECKSUM, row_crc])


def plainbuffer(rows: list[bytes]) -> bytes:
    return struct.pack("<I", HEADER) + b"".join(rows)


def decode_rows(data: bytes) -> list[dict]:
    """PlainBuffer stream -> [{"pk": {...}, "attrs": {...},
    "delete": bool}] (checksums are not re-verified on decode)."""
    rows: list[dict] = []
    i = 4 if data[:4] == struct.pack("<I", HEADER) else 0
    cur = None
    section = None
    n = len(data)
    while i < n:
        tag = data[i]
        i += 1
        if tag == TAG_ROW_PK:
            if cur is not None:
                rows.append(cur)
            cur = {"pk": {}, "attrs": {}, "delete": False}
            section = "pk"
        elif tag == TAG_ROW_DATA:
            section = "attrs"
        elif tag == TAG_CELL:
            (nlen,) = struct.unpack_from("<I", data, i + 1)
            name = data[i + 5:i + 5 + nlen].decode()
            j = i + 5 + nlen
            assert data[j] == TAG_CELL_VALUE
            (vlen,) = struct.unpack_from("<I", data, j + 1)
            value = _decode_value(data[j + 5:j + 5 + vlen])
            i = j + 5 + vlen
            if i < n and data[i] == TAG_CELL_CHECKSUM:
                i += 2
            cur[section][name] = value
        elif tag == TAG_DELETE_MARKER:
            cur["delete"] = True
        elif tag == TAG_ROW_CHECKSUM:
            i += 1
        else:  # pragma: no cover
            raise ValueError(f"plainbuffer: unknown tag {tag:#x} at {i-1}")
    if cur is not None:
        rows.append(cur)
    return rows


# ------------------------------------------------------------ client
class OtsClient:
    def __init__(self, endpoint: str, instance: str, access_key_id: str,
                 access_key_secret: str, base_url: str | None = None):
        if base_url is None:
            base_url = apply_host_aliases(
                endpoint if "://" in endpoint else f"http://{endpoint}")
        self.base = base_url.rstrip("/")
        self.instance = instance
        self.ak = access_key_id
        self.sk = access_key_secret

    def call(self, api: str, body: bytes) -> bytes:
        headers = {
            "x-ots-accesskeyid": self.ak,
            "x-ots-apiversion": "2015-12-31",
            "x-ots-contentmd5": base64.b64encode(
                hashlib.md5(body).digest()).decode(),
            "x-ots-date": datetime.now(timezone.utc).strftime(
                "%Y-%m-%dT%H:%M:%S.000Z"),
            "x-ots-instancename": self.instance,
        }
        canon = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
        sign = f"/{api}\nPOST\n\n{canon}"
        headers["x-ots-signature"] = base64.b64encode(hmac.new(
            self.sk.encode(), sign.encode(), hashlib.sha1).digest()).decode()
        req = urllib.request.Request(f"{self.base}/{api}", method="POST",
                                     data=body, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
                return resp.read()
        except urllib.error.HTTPError as e:
            raise RuntimeError(
                f"OTS {api} -> {e.code}: "
                f"{e.read().decode(errors='replace')}") from e

    def put_row(self, table: str, pk: list[tuple], attrs: list[tuple]):
        body = (pb.fstr(1, table)
                + pb.fbytes(2, plainbuffer([encode_row(pk, attrs)]))
                + pb.fbytes(3, pb.fvar(1, 0)))  # Condition IGNORE
        self.call("PutRow", body)

    def delete_row(self, table: str, pk: list[tuple]):
        body = (pb.fstr(1, table)
                + pb.fbytes(2, plainbuffer(
                    [encode_row(pk, None, delete=True)]))
                + pb.fbytes(3, pb.fvar(1, 0)))
        self.call("DeleteRow", body)

    def batch_write(self, table: str,
                    changes: list[tuple[str, list, list]]) -> None:
        """changes: [(kind 'put'|'delete', pk_cells, attr_cells)]."""
        rows = b""
        for kind, pk_cells, attr_cells in changes:
            if kind == "put":
                row = pb.fvar(1, 1) + pb.fbytes(2, plainbuffer(
                    [encode_row(pk_cells, attr_cells)]))
            else:
                row = pb.fvar(1, 3) + pb.fbytes(2, plainbuffer(
                    [encode_row(pk_cells, None, delete=True)]))
            rows += pb.fbytes(2, row + pb.fbytes(3, pb.fvar(1, 0)))
        body = pb.fbytes(1, pb.fstr(1, table) + rows)
        self.call("BatchWriteRow", body)

    def get_range(self, table: str, start_pk: list[tuple],
                  end_pk: list[tuple], limit: int = 1000,
                  ) -> tuple[list[dict], bytes | None]:
        body = (pb.fstr(1, table) + pb.fvar(2, 0)  # FORWARD
                + pb.fvar(4, limit)
                + pb.fbytes(5, plainbuffer([encode_row(start_pk)]))
                + pb.fbytes(6, plainbuffer([encode_row(end_pk)])))
        resp = pb.decode(self.call("GetRange", body))
        rows_pb = pb.first(resp, 3, b"")
        nxt = pb.first(resp, 2)
        return (decode_rows(rows_pb) if rows_pb else []), nxt or None


# ------------------------------------------------------------ plugins
class TablestoreSource(Source):
    NAME = "Tablestore"

    def read(self, spark: SparkSession) -> DataFrame:
        cl = OtsClient(self.require("endPoint"),
                       self.require("instanceName"),
                       self.require("accessKeyId"),
                       self.require("accessKeySecret"))
        table = self.require("table")
        pks = [str(k) for k in self.require("primaryKeys")]
        limit = int(self.opt("batchSize", 1000))
        base_url, inst = cl.base, cl.instance
        ak, sk = cl.ak, cl.sk

        def scan(_):
            c = OtsClient("", inst, ak, sk, base_url=base_url)
            start = [(k, INF_MIN) for k in pks]
            end = [(k, INF_MAX) for k in pks]
            out = []
            while True:
                rows, nxt = c.get_range(table, start, end, limit)
                for r in rows:
                    doc = {**r["pk"], **r["attrs"]}
                    out.append(json.dumps(doc, default=str))
                if not nxt:
                    return out
                resumed = decode_rows(nxt)
                start = list(resumed[0]["pk"].items())
        rdd = spark.sparkContext.parallelize([0], 1).flatMap(scan)
        raw = spark.createDataFrame(rdd.map(lambda s: (s,)), "doc string")
        schema_opt = self.opt("schema")
        if schema_opt:
            from seatunnel_spark.types import parse_schema

            schema = parse_schema(schema_opt.get("fields", schema_opt))
            return raw.select(
                F.from_json("doc", schema).alias("r")).select("r.*")
        return raw.withColumnRenamed("doc", "content")


class TablestoreSink(Sink):
    NAME = "Tablestore"

    def wants_observation(self) -> bool:
        return False

    def write(self, df: DataFrame) -> None:
        cl = OtsClient(self.require("endPoint"),
                       self.require("instanceName"),
                       self.require("accessKeyId"),
                       self.require("accessKeySecret"))
        table = self.require("table")
        pks = [str(k) for k in self.require("primaryKeys")]
        batch = int(self.opt("batchSize", 25))
        base_url, inst = cl.base, cl.instance
        ak, sk = cl.ak, cl.sk
        has_kind = ROW_KIND_COL in df.columns
        meta = [c for c in (ROW_KIND_COL, TABLE_ID_COL) if c in df.columns]

        def write_partition(rows):
            c = OtsClient("", inst, ak, sk, base_url=base_url)
            pending: list[tuple[str, list, list]] = []

            def flush():
                if pending:
                    c.batch_write(table, list(pending))
                    pending.clear()

            for row in rows:
                d = row.asDict(recursive=True)
                kind = str(d.get(ROW_KIND_COL, "+I")) if has_kind else "+I"
                for m in meta:
                    d.pop(m, None)
                pk_cells = [(k, d.pop(k, None)) for k in pks]
                if kind in ("-D", "-U"):
                    pending.append(("delete", pk_cells, []))
                else:
                    pending.append(("put", pk_cells,
                                    [(k, v) for k, v in d.items()]))
                if len(pending) >= batch:
                    flush()
            flush()

        df.foreachPartition(write_partition)


__all__ = ["TablestoreSource", "TablestoreSink", "OtsClient", "crc8",
           "encode_row", "decode_rows", "plainbuffer", "INF_MIN",
           "INF_MAX"]
