"""PostgreSQL logical replication client + pgoutput codec (stdlib).

Written from the public protocol docs (postgresql.org/docs/current/
protocol-replication.html and protocol-logicalrep-message-formats.html)
so `Postgres-CDC` tails a LIVE WAL stream instead of a replay
directory — the pg analog of mysql_binlog.py. Reference parity:
connector-cdc-postgres tails the same stream via embedded Debezium's
PostgresReplicationConnection (pgoutput / decoderbufs plugin).

Flow: a `replication=database` connection issues IDENTIFY_SYSTEM,
CREATE_REPLICATION_SLOT ... LOGICAL pgoutput (idempotently) and
START_REPLICATION SLOT ... LOGICAL 0/0 (proto_version '1',
publication_names '...'). The server answers CopyBothResponse and
streams CopyData frames: XLogData ('w') wrapping pgoutput messages —
Begin/Relation/Insert/Update/Delete/Commit with text-format tuples —
plus keepalives ('k'). A bounded read ends at the server's CopyDone
(the mini master sends one at WAL end; a production tail loops
forever, acking with standby status updates).

Both encode (mini master side) and decode halves implement the same
public layout; the decoder also drives the CDC source against any
server speaking pgoutput proto_version 1.
"""

from __future__ import annotations

import struct

from seatunnel_spark.pg_wire import PgClient, _decode_value


def lsn_int(text: str) -> int:
    """'X/Y' -> 64-bit LSN."""
    hi, _, lo = str(text).partition("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def lsn_str(n: int) -> str:
    return f"{n >> 32:X}/{n & 0xFFFFFFFF:X}"


# ---------------------------------------------------------------------------
# pgoutput message codec
# ---------------------------------------------------------------------------

def _cstr(b: bytes, i: int) -> tuple[str, int]:
    end = b.index(b"\0", i)
    return b[i:end].decode(), end + 1


def enc_relation(rel_id: int, namespace: str, name: str,
                 cols: list[tuple[str, int]]) -> bytes:
    """cols = [(name, type_oid)]; replica identity 'd' (default)."""
    out = b"R" + struct.pack(">I", rel_id)
    out += namespace.encode() + b"\0" + name.encode() + b"\0"
    out += b"d" + struct.pack(">H", len(cols))
    for cname, oid in cols:
        out += b"\x01" + cname.encode() + b"\0" + struct.pack(">Ii", oid, -1)
    return out


def enc_tuple(values: list) -> bytes:
    out = struct.pack(">H", len(values))
    for v in values:
        if v is None:
            out += b"n"
        else:
            t = str(v).encode()
            out += b"t" + struct.pack(">I", len(t)) + t
    return out


def enc_begin(final_lsn: int, xid: int) -> bytes:
    return b"B" + struct.pack(">QQI", final_lsn, 0, xid)


def enc_commit(lsn: int) -> bytes:
    return b"C" + struct.pack(">BQQQ", 0, lsn, lsn, 0)


def enc_insert(rel_id: int, values: list) -> bytes:
    return b"I" + struct.pack(">I", rel_id) + b"N" + enc_tuple(values)


def enc_update(rel_id: int, before: list | None, after: list) -> bytes:
    out = b"U" + struct.pack(">I", rel_id)
    if before is not None:
        out += b"O" + enc_tuple(before)
    return out + b"N" + enc_tuple(after)


def enc_delete(rel_id: int, before: list) -> bytes:
    return b"D" + struct.pack(">I", rel_id) + b"O" + enc_tuple(before)


def _dec_tuple(b: bytes, i: int) -> tuple[list, int]:
    (n,) = struct.unpack_from(">H", b, i)
    i += 2
    vals: list = []
    for _ in range(n):
        kind = b[i:i + 1]
        i += 1
        if kind in (b"n", b"u"):
            vals.append(None)
        elif kind == b"t":
            (ln,) = struct.unpack_from(">I", b, i)
            i += 4
            vals.append(b[i:i + ln].decode())
            i += ln
        else:
            raise ValueError(f"pgoutput tuple kind {kind!r}")
    return vals, i


def decode_message(b: bytes) -> dict:
    """One pgoutput message -> dict with 'op' plus fields."""
    op = b[0:1]
    if op == b"B":
        final_lsn, _ts, xid = struct.unpack_from(">QQI", b, 1)
        return {"op": "begin", "lsn": final_lsn, "xid": xid}
    if op == b"C":
        _fl, lsn, _end, _ts = struct.unpack_from(">BQQQ", b, 1)
        return {"op": "commit", "lsn": lsn}
    if op == b"R":
        (rel_id,) = struct.unpack_from(">I", b, 1)
        ns, i = _cstr(b, 5)
        name, i = _cstr(b, i)
        i += 1  # replica identity
        (ncols,) = struct.unpack_from(">H", b, i)
        i += 2
        cols = []
        for _ in range(ncols):
            i += 1  # flags
            cname, i = _cstr(b, i)
            oid, _mod = struct.unpack_from(">Ii", b, i)
            i += 8
            cols.append((cname, oid))
        return {"op": "relation", "rel_id": rel_id, "namespace": ns,
                "name": name, "cols": cols}
    if op == b"I":
        (rel_id,) = struct.unpack_from(">I", b, 1)
        assert b[5:6] == b"N"
        vals, _ = _dec_tuple(b, 6)
        return {"op": "insert", "rel_id": rel_id, "new": vals}
    if op == b"U":
        (rel_id,) = struct.unpack_from(">I", b, 1)
        i = 5
        old = None
        if b[i:i + 1] in (b"K", b"O"):
            old, i = _dec_tuple(b, i + 1)
        assert b[i:i + 1] == b"N"
        new, _ = _dec_tuple(b, i + 1)
        return {"op": "update", "rel_id": rel_id, "old": old, "new": new}
    if op == b"D":
        (rel_id,) = struct.unpack_from(">I", b, 1)
        old, _ = _dec_tuple(b, 6)
        return {"op": "delete", "rel_id": rel_id, "old": old}
    return {"op": "unknown", "raw": bytes(b)}


# ---------------------------------------------------------------------------
# replication client
# ---------------------------------------------------------------------------

class LogicalReplicationClient(PgClient):
    """Replication-mode connection; `stream()` yields decoded row
    events with typed values (text-format cells decoded by the
    relation's column type oids via pg_wire._decode_value)."""

    def __init__(self, host: str, port: int = 5432,
                 user: str = "postgres", password: str = "",
                 database: str = "postgres", timeout: float = 30.0):
        super().__init__(host, port, user, password, database, timeout,
                         replication="database")

    def identify_system(self) -> dict:
        cols, _oids, rows = self.query("IDENTIFY_SYSTEM")
        return dict(zip(cols, rows[0])) if rows else {}

    def create_slot(self, slot: str, plugin: str = "pgoutput"):
        """CREATE_REPLICATION_SLOT; returns the slot's consistent_point
        LSN (int) so callers can snapshot AT the slot's WAL retention
        point (Debezium PostgresReplicationConnection creates the slot
        before snapshotting for exactly this reason), or None when an
        existing slot is reused."""
        try:
            cols, _oids, rows = self.query(
                f"CREATE_REPLICATION_SLOT {slot} LOGICAL {plugin}")
            if rows and "consistent_point" in cols:
                return lsn_int(rows[0][cols.index("consistent_point")])
            return None
        except RuntimeError as e:  # already exists -> reuse
            if "exists" not in str(e):
                raise
            return None

    def stream(self, slot: str, publication: str = "seatunnel",
               start_lsn: int = 0):
        """START_REPLICATION and yield events until the server's
        CopyDone: {'event': insert|update|delete, 'namespace', 'table',
        'cols', 'before', 'after', 'lsn'}."""
        self._send(b"Q", (
            f"START_REPLICATION SLOT {slot} LOGICAL {lsn_str(start_lsn)} "
            f"(proto_version '1', publication_names '{publication}')\0"
        ).encode())
        relations: dict[int, dict] = {}
        while True:
            mtype, payload = self._next()
            if mtype == b"W":  # CopyBothResponse
                continue
            if mtype == b"E":
                raise RuntimeError(
                    f"pg replication error: {self._error_text(payload)}")
            if mtype == b"c":  # CopyDone: bounded stream end
                # drain CommandComplete / ReadyForQuery if present
                try:
                    self.sock.settimeout(1.0)
                    while True:
                        t, _ = self._next()
                        if t == b"Z":
                            break
                except Exception:  # noqa: BLE001
                    pass
                return
            if mtype != b"d":  # CopyData only below
                continue
            kind = payload[0:1]
            if kind == b"k":  # keepalive: [lsn ts reply?]
                if payload[17:18] == b"\x01":
                    # standby status update: received/flushed/applied
                    lsn = struct.unpack_from(">Q", payload, 1)[0]
                    self._send(b"d", b"r" + struct.pack(
                        ">QQQQB", lsn, lsn, lsn, 0, 0))
                continue
            if kind != b"w":
                continue
            _start, _end, _ts = struct.unpack_from(">QQQ", payload, 1)
            msg = decode_message(payload[25:])
            op = msg["op"]
            if op == "relation":
                relations[msg["rel_id"]] = msg
                continue
            if op in ("insert", "update", "delete"):
                rel = relations.get(msg["rel_id"])
                if rel is None:
                    continue
                cols = rel["cols"]

                def typed(vals):
                    if vals is None:
                        return None
                    return [None if v is None
                            else _decode_value(oid, v)
                            for (c, oid), v in zip(cols, vals)]

                yield {"event": op, "namespace": rel["namespace"],
                       "table": rel["name"],
                       "cols": [c for c, _ in cols],
                       "before": typed(msg.get("old")),
                       "after": typed(msg.get("new")),
                       # the event's own position is the XLogData START
                       # lsn; the second header field is the server's
                       # current end-of-WAL, which on a real server is
                       # >= the watermark for EVERY event (including
                       # pre-snapshot replays from an existing slot) and
                       # would defeat the offset>watermark stitch filter.
                       "lsn": _start or _end}


__all__ = ["LogicalReplicationClient", "decode_message", "lsn_int",
           "lsn_str", "enc_relation", "enc_begin", "enc_commit",
           "enc_insert", "enc_update", "enc_delete", "enc_tuple"]
