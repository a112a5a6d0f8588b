"""Mini Kudu — in-process master + tablet server speaking the krpc
subset in seatunnel_spark/kudu_rpc.py (magic + SASL PLAIN negotiation,
ConnectionContext, GetTableSchema / GetTableLocations on the master
service, paged Scan with rowwise sidecars and Write with
RowOperationsPB decode on the tablet-server service).

One listener plays both master and tserver (it answers both service
names), like a single-node quickstart cluster. Tables are hash
partitioned into `num_tablets` in-memory tablets by primary key — scans
of different tablets return disjoint rows, so the connector's
tablet-split fan-out is actually exercised.
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib

from seatunnel_spark import pb
from seatunnel_spark import kudu_rpc as K


class MiniKudu:
    def __init__(self, num_tablets: int = 2):
        self.num_tablets = num_tablets
        # name -> {"cols": [Column], "tablets": [dict pk->row]}
        self.tables: dict[str, dict] = {}
        self.scanners: dict[bytes, list] = {}
        self.lock = threading.RLock()
        self.port = 0

    def create_table(self, name: str, cols: list[K.Column]) -> None:
        with self.lock:
            self.tables[name] = {
                "cols": cols,
                "tablets": [dict() for _ in range(self.num_tablets)],
            }

    def _pk(self, cols, row):
        return tuple(v for c, v in zip(cols, row) if c.is_key)

    def _bucket(self, pk: tuple) -> int:
        return zlib.crc32(repr(pk).encode()) % self.num_tablets

    def rows(self, name: str) -> list[tuple]:
        with self.lock:
            t = self.tables[name]
            out = []
            for tb in t["tablets"]:
                out.extend(tb.values())
            return sorted(out, key=repr)

    # ---------------------------------------------------------- rpc
    def _master_call(self, method: str, body: bytes) -> bytes:
        req = pb.decode(body)
        table_pb = pb.decode(pb.first(req, 1, b""))
        name = pb.first_str(table_pb, 2, "")
        with self.lock:
            if name not in self.tables:
                # MasterErrorPB{code=1, status=2:AppStatusPB{code=1,message=2}}
                status = pb.fvar(1, 1) + pb.fstr(2, f"table {name} not found")
                return pb.fbytes(1, pb.fvar(1, 1) + pb.fbytes(2, status))
            t = self.tables[name]
            if method == "GetTableSchema":
                return pb.fbytes(2, K.encode_schema(t["cols"]))
            if method == "GetTableLocations":
                out = b""
                for i in range(self.num_tablets):
                    tablet_id = f"{name}::tablet-{i}".encode()
                    addr = pb.fstr(1, "127.0.0.1") + pb.fvar(2, self.port)
                    ts = pb.fbytes(1, b"ts-0") + pb.fbytes(2, addr)
                    replica = pb.fbytes(1, ts) + pb.fvar(2, 1)
                    out += pb.fbytes(2, pb.fbytes(1, tablet_id) +
                                     pb.fbytes(3, replica))
                return out
        raise ValueError(f"unknown master method {method}")

    def _find_tablet(self, tablet_id: bytes):
        name, _, idx = tablet_id.decode().partition("::tablet-")
        t = self.tables[name]
        return t, t["tablets"][int(idx)]

    def _ts_call(self, method: str, body: bytes) -> tuple[bytes, list[bytes]]:
        req = pb.decode(body)
        if method == "Write":
            tablet_id = pb.first(req, 1, b"")
            cols = K.decode_schema(pb.first(req, 2, b""))
            ops = K.decode_row_ops(cols, pb.first(req, 3, b""))
            errors = b""
            with self.lock:
                t, _ = self._find_tablet(tablet_id)
                for idx, (op, row) in enumerate(ops):
                    pk = self._pk(cols, row)
                    tb = t["tablets"][self._bucket(pk)]
                    if op == K.OP_INSERT:
                        if pk in tb:
                            status = pb.fvar(1, 6) + pb.fstr(2, "key already present")
                            errors += pb.fbytes(2, pb.fvar(1, idx) +
                                                pb.fbytes(2, status))
                        else:
                            tb[pk] = row
                    elif op in (K.OP_UPSERT, K.OP_UPDATE):
                        if op == K.OP_UPDATE and pk not in tb:
                            status = pb.fvar(1, 5) + pb.fstr(2, "key not found")
                            errors += pb.fbytes(2, pb.fvar(1, idx) +
                                                pb.fbytes(2, status))
                        else:
                            tb[pk] = row
                    elif op == K.OP_DELETE:
                        if pk not in tb:
                            status = pb.fvar(1, 5) + pb.fstr(2, "key not found")
                            errors += pb.fbytes(2, pb.fvar(1, idx) +
                                                pb.fbytes(2, status))
                        else:
                            del tb[pk]
            return errors, []
        if method == "Scan":
            batch_rows = 100  # page size in rows (batch_size_bytes analog)
            new_scan = pb.first(req, 2)
            with self.lock:
                if new_scan is not None:
                    ns = pb.decode(new_scan)
                    tablet_id = pb.first(ns, 1, b"")
                    cols = [K.Column.decode(c) for c in ns.get(3, [])]
                    t, tb = self._find_tablet(tablet_id)
                    if not cols:
                        cols = t["cols"]
                    names = [c.name for c in cols]
                    full = {c.name: i for i, c in enumerate(t["cols"])}
                    pending = [tuple(row[full[n]] for n in names)
                               for row in tb.values()]
                    scanner_id = f"s{len(self.scanners)}".encode()
                    self.scanners[scanner_id] = [cols, pending]
                else:
                    scanner_id = pb.first(req, 1, b"")
                    cols, pending = self.scanners[scanner_id]
                page, rest = pending[:batch_rows], pending[batch_rows:]
                self.scanners[scanner_id][1] = rest
                more = 1 if rest else 0
                if not more:
                    self.scanners.pop(scanner_id, None)
            rows_data, indirect = K.encode_row_block(cols, page)
            data_pb = (pb.fvar(1, len(page)) + pb.fvar(2, 0) + pb.fvar(3, 1))
            resp = (pb.fbytes(2, scanner_id) + pb.fvar(3, more) +
                    pb.fbytes(4, data_pb))
            return resp, [rows_data, indirect]
        raise ValueError(f"unknown tserver method {method}")


def start_mini_kudu(port: int = 0, host: str = "127.0.0.1",
                    num_tablets: int = 2):
    store = MiniKudu(num_tablets)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(32)
    store.port = srv.getsockname()[1]
    stop_flag = threading.Event()

    def handle(conn):
        buf = b""

        def read_exact(n):
            nonlocal buf
            while len(buf) < n:
                chunk = conn.recv(65536)
                if not chunk:
                    raise ConnectionError
                buf += chunk
            out, buf2 = buf[:n], buf[n:]
            buf = buf2
            return out

        def send(call_id, body, sidecars=()):
            header = pb.fvar(1, call_id & 0xFFFFFFFF)
            if sidecars:
                off = len(body)
                for sc in sidecars:
                    header += pb.fvar(3, off)
                    off += len(sc)
                body = body + b"".join(sidecars)
            msg = (pb.varint(len(header)) + header +
                   pb.varint(len(body)) + body)
            conn.sendall(struct.pack(">I", len(msg)) + msg)

        try:
            magic = read_exact(7)
            assert magic[:4] == b"hrpc", f"bad connection magic {magic!r}"
            while not stop_flag.is_set():
                (total,) = struct.unpack(">I", read_exact(4))
                frame = read_exact(total)
                hlen, i = pb.read_varint(frame, 0)
                header = pb.decode(frame[i:i + hlen])
                i += hlen
                blen, i = pb.read_varint(frame, i)
                body = frame[i:i + blen]
                call_id = pb.first(header, 3, 0)
                if call_id >= 0x80000000:  # negative int32 on the wire
                    call_id -= 1 << 32
                if call_id == -33:  # negotiation
                    step = pb.first(pb.decode(body), 1, 0)
                    if step == K.NEG_NEGOTIATE:
                        send(-33, pb.fvar(1, K.NEG_NEGOTIATE) +
                             pb.fbytes(2, pb.fstr(1, "PLAIN")))
                    else:  # SASL_INITIATE (token presence is the auth)
                        neg = pb.decode(body)
                        token = pb.first(neg, 3, b"")
                        assert token.startswith(b"\x00"), "bad PLAIN token"
                        send(-33, pb.fvar(1, K.NEG_SASL_SUCCESS))
                    continue
                if call_id == -3:  # ConnectionContext: no response
                    continue
                rm = pb.decode(pb.first(header, 6, b""))
                service = pb.first_str(rm, 1, "")
                method = pb.first_str(rm, 2, "")
                try:
                    if service == K.MASTER_SERVICE:
                        resp, sidecars = store._master_call(method, body), []
                    else:
                        resp, sidecars = store._ts_call(method, body)
                    send(call_id, resp, sidecars)
                except Exception as e:  # ErrorStatusPB{message=1}
                    err_header = (pb.fvar(1, call_id & 0xFFFFFFFF) +
                                  pb.fvar(2, 1))
                    err_body = pb.fstr(1, f"{type(e).__name__}: {e}")
                    msg = (pb.varint(len(err_header)) + err_header +
                           pb.varint(len(err_body)) + err_body)
                    conn.sendall(struct.pack(">I", len(msg)) + msg)
        except (ConnectionError, OSError, AssertionError, struct.error):
            pass
        finally:
            conn.close()

    def accept_loop():
        while not stop_flag.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,), daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def shutdown():
        stop_flag.set()
        srv.close()

    return store, store.port, shutdown


__all__ = ["MiniKudu", "start_mini_kudu"]
