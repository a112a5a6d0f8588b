"""StarRocks native scan path: FE `_query_plan` REST + BE thrift scan.

The reference's StarRocksSourceReader flow
(client/source/StarRocksQueryPlanReadClient.java: POST
/api/{db}/{table}/_query_plan with basic auth -> opaque plan +
tablet->BE routings, greedy least-loaded BE selection, tablet batches
of request_tablet_size; client/source/StarRocksBeReadClient.java:
TStarrocksExternalService.open_scanner/get_next/close_scanner over an
unframed TBinaryProtocol socket, Arrow batches until eos). The thrift
structs follow the public external-service IDL (Apache Doris
gensrc/thrift/PaloExternalDataSourceService.thrift lineage, which
StarRocks inherited): TScanOpenParams 1:cluster 2:database 3:table
4:tablet_ids 5:opaqued_query_plan 6:batch_size 7:query_timeout
8:mem_limit 9:user 10:passwd 11:keep_alive_min 12:properties;
TScanOpenResult 1:status 2:context_id; TScanNextBatchParams
1:context_id 2:offset; TScanBatchResult 1:status 2:eos 3:rows(arrow);
TScanCloseParams 1:context_id; TStatus 1:status_code 2:error_msgs.
"""

from __future__ import annotations

import base64
import json
import socket
import struct

from seatunnel_spark import thrift_codec as T
from seatunnel_spark.net import apply_host_aliases


class StarRocksScanError(RuntimeError):
    pass


def fetch_query_plan(fe_node: str, database: str, table: str, sql: str,
                     user: str, password: str,
                     timeout: float = 5.0) -> tuple[str, dict]:
    """POST /api/{db}/{table}/_query_plan -> (opaque_plan,
    {tablet_id: [be_node, ...]})."""
    import urllib.request

    url = apply_host_aliases(
        f"http://{fe_node}/api/{database}/{table}/_query_plan")
    auth = base64.b64encode(f"{user}:{password}".encode()).decode()
    req = urllib.request.Request(
        url, method="POST",
        data=json.dumps({"sql": sql}).encode(),
        headers={"Content-Type": "application/json;charset=UTF-8",
                 "Authorization": f"Basic {auth}"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        body = json.loads(resp.read().decode())
    plan = body.get("opaque_query_plan")
    if not plan:
        raise StarRocksScanError(
            f"_query_plan returned no plan: {body.get('exception', body)}")
    partitions = {
        str(tid): list((routing or {}).get("routings") or [])
        for tid, routing in (body.get("partitions") or {}).items()}
    return plan, partitions


def assign_tablets(partitions: dict, tablet_batch: int = 1024
                   ) -> list[tuple[str, list[int]]]:
    """Greedy least-loaded BE per tablet, then split each BE's tablet
    set into request_tablet_size batches — one scan partition each
    (selectBeForTablet + tabletsMapToPartition)."""
    be_tablets: dict[str, list[int]] = {}
    for tid, routings in partitions.items():
        candidate = None
        for be in routings:
            if be not in be_tablets:
                be_tablets[be] = []
                candidate = be
                break
            if candidate is None or len(be_tablets[be]) < \
                    len(be_tablets[candidate]):
                candidate = be
        if candidate is not None:
            be_tablets[candidate].append(int(tid))
    out = []
    for be, tablets in sorted(be_tablets.items()):
        tablets = sorted(set(tablets))
        for i in range(0, len(tablets), tablet_batch):
            out.append((be, tablets[i:i + tablet_batch]))
    return out


class StarRocksBeClient:
    """TStarrocksExternalService over an unframed binary-protocol
    socket (the BE's brpc-thrift port)."""

    def __init__(self, be_node: str, timeout: float = 30.0):
        url = apply_host_aliases(f"tcp://{be_node}")
        hostpart = url.split("://", 1)[-1]
        h, _, p = hostpart.rpartition(":")
        self.sock = socket.create_connection((h, int(p)), timeout=timeout)
        self._buf = b""
        self._seq = 0

    def _recv_message(self):
        # unframed transport: accumulate until a whole message decodes
        while True:
            if self._buf:
                try:
                    return T.decode_message(self._buf)
                except (IndexError, struct.error):
                    pass
            chunk = self.sock.recv(1 << 20)
            if not chunk:
                raise ConnectionError("starrocks BE connection closed")
            self._buf += chunk

    def _call(self, name: str, req: dict) -> dict:
        self._seq += 1
        self.sock.sendall(T.encode_message(name, T.CALL, self._seq,
                                           {1: (T.STRUCT, req)}))
        _name, mtype, _seq, fields = self._recv_message()
        self._buf = b""  # one message per call on this transport
        if mtype == T.EXCEPTION:
            raise StarRocksScanError(
                f"{name}: {T.text(T.sget(fields, 1), 'thrift exception')}")
        resp = T.sget(fields, 0)
        status = T.sget(resp, 1)
        code = T.sget(status, 1, 0)
        if code != 0:  # TStatusCode.OK
            msgs = T.sget(status, 2)
            err = b", ".join(msgs[1]) if msgs else b"scan error"
            raise StarRocksScanError(
                f"{name}: status {code}: {err.decode(errors='replace')}")
        return resp

    def open_scanner(self, database: str, table: str, tablet_ids: list[int],
                     opaque_plan: str, user: str, password: str,
                     batch_size: int = 1024, query_timeout: int = 3600,
                     mem_limit: int = 2 ** 31, keep_alive_min: int = 10,
                     properties: dict | None = None) -> str:
        req = {1: (T.STRING, "default_cluster"),
               2: (T.STRING, database),
               3: (T.STRING, table),
               4: (T.LIST, (T.I64, list(tablet_ids))),
               5: (T.STRING, opaque_plan),
               6: (T.I32, batch_size),
               7: (T.I32, query_timeout),
               8: (T.I64, mem_limit),
               9: (T.STRING, user),
               10: (T.STRING, password),
               11: (T.I16, keep_alive_min)}
        if properties:
            req[12] = (T.MAP, (T.STRING, T.STRING,
                               {str(k): str(v)
                                for k, v in properties.items()}))
        resp = self._call("open_scanner", req)
        ctx = T.text(T.sget(resp, 2))
        if not ctx:
            raise StarRocksScanError("open_scanner: no context_id")
        return ctx

    def get_next(self, context_id: str, offset: int
                 ) -> tuple[bool, bytes | None]:
        resp = self._call("get_next", {1: (T.STRING, context_id),
                                       2: (T.I64, offset)})
        eos = bool(T.sget(resp, 2, False))
        rows = T.sget(resp, 3)
        return eos, (bytes(rows) if rows else None)


    def close_scanner(self, context_id: str) -> None:
        try:
            self._call("close_scanner", {1: (T.STRING, context_id)})
        except StarRocksScanError:
            pass

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def scan_partition(be_node: str, database: str, table: str,
                   tablet_ids: list[int], opaque_plan: str, user: str,
                   password: str, batch_size: int = 1024,
                   properties: dict | None = None):
    """Open a BE scan and yield python row tuples decoded from the
    Arrow IPC batches (executor-side; one generator per partition)."""
    import pyarrow as pa

    cl = StarRocksBeClient(be_node)
    try:
        ctx = cl.open_scanner(database, table, tablet_ids, opaque_plan,
                              user, password, batch_size=batch_size,
                              properties=properties)
        offset = 0
        while True:
            eos, payload = cl.get_next(ctx, offset)
            if payload:
                with pa.ipc.open_stream(payload) as reader:
                    for batch in reader:
                        cols = [c.to_pylist() for c in batch.columns]
                        offset += batch.num_rows
                        yield from zip(*cols)
            if eos:
                break
        cl.close_scanner(ctx)
    finally:
        cl.close()


__all__ = ["StarRocksBeClient", "StarRocksScanError", "fetch_query_plan",
           "assign_tablets", "scan_partition"]
