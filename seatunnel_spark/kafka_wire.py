"""Kafka wire protocol (stdlib-only): record-batch v2 codec + a
minimal client speaking ApiVersions/Metadata/Produce/Fetch/ListOffsets.

Written from the public Kafka protocol guide
(kafka.apache.org/protocol) — the same wire format any broker >= 0.11
speaks, so this client works against a real cluster; in the sandbox it
talks to testing/kafka_server.py. The Spark-native production path for
STREAMING stays `format("kafka")` (spark-sql-kafka connector jar);
this module is the fallback when that jar isn't on the classpath, and
the only path the sandbox can exercise end-to-end.

Implemented API versions (fixed, conservative):
  ApiVersions v0, Metadata v1, Produce v3, Fetch v4, ListOffsets v1.
Record batches are magic-2 with CRC-32C (Castagnoli) integrity.
"""

from __future__ import annotations

import socket
import struct
import threading
import time

# --------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected 0x82F63B78) — table-driven
# --------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------------------------
# primitive codecs
# --------------------------------------------------------------------------

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_varint(n: int) -> bytes:
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_varint(data: bytes, i: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = data[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), i
        shift += 7


def enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def dec_str(data: bytes, i: int) -> tuple[str | None, int]:
    (n,) = struct.unpack_from(">h", data, i)
    i += 2
    if n == -1:
        return None, i
    return data[i:i + n].decode(), i + n


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def dec_bytes(data: bytes, i: int) -> tuple[bytes | None, int]:
    (n,) = struct.unpack_from(">i", data, i)
    i += 4
    if n == -1:
        return None, i
    return data[i:i + n], i + n


# --------------------------------------------------------------------------
# record batch v2
# --------------------------------------------------------------------------

def encode_record_batch(base_offset: int,
                        records: list[tuple[bytes | None, bytes | None]],
                        base_ts: int | None = None,
                        producer_id: int = -1, producer_epoch: int = -1,
                        base_sequence: int = -1,
                        transactional: bool = False) -> bytes:
    """records = [(key, value), ...] -> one magic-2 batch.

    producer_id/epoch/base_sequence carry the idempotent-producer
    identity; attribute bit 4 marks the batch transactional (KIP-98
    batch format)."""
    base_ts = base_ts if base_ts is not None else int(time.time() * 1000)
    recs = bytearray()
    for delta, (key, value) in enumerate(records):
        body = bytearray()
        body += b"\x00"                       # attributes
        body += enc_varint(0)                 # timestampDelta
        body += enc_varint(delta)             # offsetDelta
        for field in (key, value):
            if field is None:
                body += enc_varint(-1)
            else:
                body += enc_varint(len(field)) + field
        body += enc_varint(0)                 # headers count
        recs += enc_varint(len(body)) + body
    attrs = 0x10 if transactional else 0
    after_crc = (
        struct.pack(">hiqqqhii", attrs, len(records) - 1, base_ts, base_ts,
                    producer_id, producer_epoch, base_sequence,
                    len(records)) + bytes(recs)
    )
    crc = crc32c(after_crc)
    body = (struct.pack(">iBI", 0, 2, crc) + after_crc)  # epoch, magic, crc
    return struct.pack(">qi", base_offset, len(body)) + body


def batch_header(data: bytes) -> dict | None:
    """Parse the FIRST batch's header out of a produce payload:
    {attrs, transactional, producer_id, producer_epoch, base_sequence}."""
    if len(data) < 12:
        return None
    _base, length = struct.unpack_from(">qi", data, 0)
    batch = data[12:12 + length]
    if len(batch) < 49 or batch[4] != 2:
        return None
    attrs, _lod, _ts1, _ts2, pid, epoch, seq, _cnt = struct.unpack_from(
        ">hiqqqhii", batch, 9)
    return {"attrs": attrs, "transactional": bool(attrs & 0x10),
            "producer_id": pid, "producer_epoch": epoch,
            "base_sequence": seq}


def decode_record_batches(data: bytes):
    """Yield (offset, key, value) from a concatenation of batches."""
    i = 0
    while i + 12 <= len(data):
        base_offset, length = struct.unpack_from(">qi", data, i)
        i += 12
        if i + length > len(data):
            return  # partial batch at end of fetch response
        batch = data[i:i + length]
        i += length
        # batch: epoch(4) magic(1) crc(4) attrs(2) lastOffsetDelta(4)
        # baseTs(8) maxTs(8) producerId(8) producerEpoch(2) baseSeq(4)
        # recordCount(4) records...
        magic = batch[4]
        if magic != 2:
            continue
        (count,) = struct.unpack_from(">i", batch, 45)
        j = 49
        for _ in range(count):
            rec_len, j = dec_varint(batch, j)
            end = j + rec_len
            k = j + 1  # attributes
            _, k = dec_varint(batch, k)  # tsDelta
            off_delta, k = dec_varint(batch, k)
            klen, k = dec_varint(batch, k)
            key = None
            if klen >= 0:
                key = batch[k:k + klen]
                k += klen
            vlen, k = dec_varint(batch, k)
            value = None
            if vlen >= 0:
                value = batch[k:k + vlen]
                k += vlen
            yield base_offset + off_delta, key, value
            j = end


# --------------------------------------------------------------------------
# client
# --------------------------------------------------------------------------

_API_PRODUCE, _API_FETCH, _API_LIST_OFFSETS, _API_METADATA = 0, 1, 2, 3
_API_SASL_HANDSHAKE = 17
_API_VERSIONS = 18
_API_INIT_PRODUCER_ID = 22
_API_ADD_PARTITIONS_TO_TXN = 24
_API_END_TXN = 26
_API_SASL_AUTHENTICATE = 36


def sasl_gssapi_config(kafka_config: dict | None,
                       bootstrap: str) -> dict | None:
    """Build the GSSAPI SASL parameters from the conf's `kafka.config`
    block (security.protocol=SASL_PLAINTEXT + sasl.mechanism=GSSAPI):
    keytab/principal parsed out of the JAAS Krb5LoginModule string,
    krb5.conf from java.security.krb5.conf, the acceptor principal
    `{service}/{bootstrap-host}` like the Java client's
    sasl.kerberos.service.name rule. File paths resolve through
    SEATUNNEL_SPARK_PATH_ALIASES (the volume-mount analog), so a conf
    written for container paths (/etc/krb5.conf, /tmp/kafka.keytab)
    runs unmodified."""
    import re

    from seatunnel_spark.sources.file import resolve_path_aliases

    cfg = kafka_config or {}
    if str(cfg.get("security.protocol", "")).upper() != "SASL_PLAINTEXT":
        return None
    if str(cfg.get("sasl.mechanism", "GSSAPI")).upper() != "GSSAPI":
        return None
    jaas = str(cfg.get("sasl.jaas.config", ""))
    mk = re.search(r'keyTab="([^"]+)"', jaas)
    mp = re.search(r'principal="([^"]+)"', jaas)
    if not (mk and mp):
        raise ValueError("kafka GSSAPI: sasl.jaas.config must carry "
                         "keyTab=\"...\" and principal=\"...\"")
    krb5_path = str(cfg.get("java.security.krb5.conf",
                            "/etc/krb5.conf")).strip('"')
    host = bootstrap.split(",")[0].rsplit(":", 1)[0].strip().lower()
    return {
        "keytab": resolve_path_aliases(mk.group(1)),
        "principal": mp.group(1),
        "krb5_conf": resolve_path_aliases(krb5_path),
        "service": str(cfg.get("sasl.kerberos.service.name", "kafka")),
        "host": host,
    }


def resolve_bootstrap(bootstrap: str) -> str:
    """Apply host aliases on the DRIVER so closures ship final
    endpoints (executor workers don't see late env changes)."""
    from seatunnel_spark.net import apply_host_aliases

    out = []
    for hp in bootstrap.split(","):
        resolved = apply_host_aliases(f"tcp://{hp.strip()}")
        out.append(resolved.split("://", 1)[1])
    return ",".join(out)


class KafkaWireClient:
    def __init__(self, bootstrap: str, client_id: str = "seatunnel-spark",
                 timeout: float = 30.0, sasl: dict | None = None):
        from seatunnel_spark.net import apply_host_aliases

        first = bootstrap.split(",")[0].strip()
        resolved = apply_host_aliases(f"tcp://{first}")
        hostpart = resolved.split("://", 1)[1]
        host, _, port = hostpart.rpartition(":")
        self.sock = socket.create_connection((host, int(port)),
                                             timeout=timeout)
        self.client_id = client_id
        self._corr = 0
        self._buf = b""
        self._lock = threading.Lock()
        if sasl:
            self._sasl_gssapi(sasl)

    def _sasl_gssapi(self, sasl: dict) -> None:
        """SASL GSSAPI (RFC 4752) over SaslHandshake v1 +
        SaslAuthenticate v0: kinit from the keytab (AS exchange against
        the krb5.conf realm's KDC), TGS for `{service}/{host}`, then
        the GSS context tokens (AP-REQ -> AP-REP, mutual) and the
        security-layer wrap negotiation (layer: none)."""
        from seatunnel_spark import krb5 as K

        key = K.keytab_key(sasl["keytab"], sasl["principal"])
        conf = K.parse_krb5_conf(sasl["krb5_conf"])
        _comps, realm = K.parse_principal(sasl["principal"])
        realm = realm or conf.get("default_realm", "")
        kdc = conf["realms"].get(realm, {}).get("kdc")
        if not kdc:
            raise ValueError(f"krb5.conf: no kdc for realm {realm!r}")
        tgt_session, tgt = K.as_exchange(kdc, sasl["principal"], key,
                                         realm)
        session, ticket = K.tgs_exchange(
            kdc, tgt, tgt_session, sasl["principal"],
            [sasl["service"], sasl["host"]], realm)

        # SaslHandshake v1
        resp = self._call(_API_SASL_HANDSHAKE, 1,
                          enc_str("GSSAPI"))
        (err,) = struct.unpack_from(">h", resp, 0)
        if err:
            raise RuntimeError(f"kafka SaslHandshake error {err}")

        def authenticate(token: bytes) -> bytes:
            r = self._call(_API_SASL_AUTHENTICATE, 0, enc_bytes(token))
            (e,) = struct.unpack_from(">h", r, 0)
            msg, i = dec_str(r, 2)
            if e:
                raise RuntimeError(
                    f"kafka SASL authentication failed: {msg or e}")
            out, _ = dec_bytes(r, i)
            return out or b""

        ap_req = K.build_ap_req(ticket, session, sasl["principal"],
                                usage=11, cksum=K.gss_checksum_deleg(),
                                seq_number=0, mutual=True)
        ap_rep_tok = authenticate(K.gss_initial_token(ap_req))
        K.dec_ap_rep(K.gss_parse_ap_rep(ap_rep_tok), session)  # mutual
        challenge = authenticate(b"")
        layers = K.gss_unwrap(session, challenge, initiator_sent=False)
        if not layers or not layers[0] & 0x01:
            raise RuntimeError("kafka SASL: server offers no "
                               "security-layer 'none'")
        reply = K.gss_wrap(session, bytes([0x01]) + layers[1:4],
                           initiator=True, seq=0, seal=False)
        authenticate(reply)

    def close(self):
        try:
            self.sock.close()
        except OSError:
            pass

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("kafka connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _call(self, api: int, version: int, payload: bytes) -> bytes:
        with self._lock:
            self._corr += 1
            header = (struct.pack(">hhi", api, version, self._corr)
                      + enc_str(self.client_id))
            msg = header + payload
            self.sock.sendall(struct.pack(">i", len(msg)) + msg)
            (length,) = struct.unpack(">i", self._read_exact(4))
            resp = self._read_exact(length)
            (corr,) = struct.unpack_from(">i", resp, 0)
            if corr != self._corr:
                raise RuntimeError("kafka: correlation id mismatch")
            return resp[4:]

    # -- Metadata v1 ------------------------------------------------------
    def metadata(self, topics: list[str] | None = None) -> dict:
        if topics is None:
            payload = struct.pack(">i", -1)
        else:
            payload = struct.pack(">i", len(topics)) + b"".join(
                enc_str(t) for t in topics)
        r = self._call(_API_METADATA, 1, payload)
        i = 0
        (n_brokers,) = struct.unpack_from(">i", r, i)
        i += 4
        for _ in range(n_brokers):
            i += 4  # node id
            _, i = dec_str(r, i)
            i += 4  # port
            _, i = dec_str(r, i)  # rack
        i += 4  # controller id
        (n_topics,) = struct.unpack_from(">i", r, i)
        i += 4
        out: dict[str, list[int]] = {}
        for _ in range(n_topics):
            i += 2  # error code
            name, i = dec_str(r, i)
            i += 1  # is_internal
            (n_parts,) = struct.unpack_from(">i", r, i)
            i += 4
            parts = []
            for _ in range(n_parts):
                _err, pid = struct.unpack_from(">hi", r, i)
                i += 2 + 4 + 4  # err, pid, leader
                (n_rep,) = struct.unpack_from(">i", r, i)
                i += 4 + 4 * n_rep
                (n_isr,) = struct.unpack_from(">i", r, i)
                i += 4 + 4 * n_isr
                parts.append(pid)
            out[name] = sorted(parts)
        return out

    # -- Produce v3 -------------------------------------------------------
    def produce(self, topic: str, partition: int,
                records: list[tuple[bytes | None, bytes | None]],
                base_offset_hint: int = 0,
                txn_id: str | None = None, producer_id: int = -1,
                producer_epoch: int = -1, base_sequence: int = -1) -> int:
        batch = encode_record_batch(
            base_offset_hint, records, producer_id=producer_id,
            producer_epoch=producer_epoch, base_sequence=base_sequence,
            transactional=txn_id is not None)
        payload = (
            enc_str(txn_id) + struct.pack(">hi", -1, 30000)  # acks=-1
            + struct.pack(">i", 1) + enc_str(topic)
            + struct.pack(">i", 1) + struct.pack(">i", partition)
            + enc_bytes(batch)
        )
        r = self._call(_API_PRODUCE, 3, payload)
        i = 4  # topic array count
        _, i = dec_str(r, i)
        i += 4  # partition array count
        _pid, err, base = struct.unpack_from(">ihq", r, i)
        if err:
            raise RuntimeError(f"kafka produce error code {err}")
        return base

    # -- consumer-group offsets (OffsetCommit v2 / OffsetFetch v1) --------
    def offset_fetch(self, group: str, topic: str,
                     partitions: list[int]) -> dict[int, int]:
        """Committed offsets for (group, topic); -1 = none committed."""
        payload = (enc_str(group) + struct.pack(">i", 1) + enc_str(topic)
                   + struct.pack(">i", len(partitions))
                   + b"".join(struct.pack(">i", p) for p in partitions))
        r = self._call(9, 1, payload)
        i = 4  # topic count
        _, i = dec_str(r, i)
        (n,) = struct.unpack_from(">i", r, i)
        i += 4
        out: dict[int, int] = {}
        for _ in range(n):
            p, off = struct.unpack_from(">iq", r, i)
            i += 12
            _meta, i = dec_str(r, i)
            (err,) = struct.unpack_from(">h", r, i)
            i += 2
            if err:
                raise RuntimeError(f"kafka offset_fetch error code {err}")
            out[p] = off
        return out

    def offset_commit(self, group: str, topic: str,
                      offsets: dict[int, int]) -> None:
        payload = (enc_str(group) + struct.pack(">i", -1) + enc_str("")
                   + struct.pack(">q", -1)  # retention
                   + struct.pack(">i", 1) + enc_str(topic)
                   + struct.pack(">i", len(offsets)))
        for p, off in offsets.items():
            payload += struct.pack(">iq", p, off) + enc_str(None)
        r = self._call(8, 2, payload)
        i = 4  # topic count
        _, i = dec_str(r, i)
        (n,) = struct.unpack_from(">i", r, i)
        i += 4
        for _ in range(n):
            _p, err = struct.unpack_from(">ih", r, i)
            i += 6
            if err:
                raise RuntimeError(f"kafka offset_commit error code {err}")

    # -- transactions (KIP-98: InitProducerId v0, AddPartitionsToTxn v0,
    #    EndTxn v0) ---------------------------------------------------------
    def init_producer_id(self, txn_id: str | None,
                         timeout_ms: int = 60_000) -> tuple[int, int]:
        """-> (producer_id, producer_epoch). Re-initializing an existing
        transactional.id bumps the epoch, FENCING any zombie producer
        still holding the old epoch (the exactly-once recovery path)."""
        payload = enc_str(txn_id) + struct.pack(">i", timeout_ms)
        r = self._call(_API_INIT_PRODUCER_ID, 0, payload)
        _throttle, err, pid, epoch = struct.unpack_from(">ihqh", r, 0)
        if err:
            raise RuntimeError(f"kafka init_producer_id error code {err}")
        return pid, epoch

    def add_partitions_to_txn(self, txn_id: str, producer_id: int,
                              producer_epoch: int,
                              topic_parts: dict[str, list[int]]) -> None:
        payload = (enc_str(txn_id)
                   + struct.pack(">qh", producer_id, producer_epoch)
                   + struct.pack(">i", len(topic_parts)))
        for t, parts in topic_parts.items():
            payload += enc_str(t) + struct.pack(">i", len(parts))
            payload += b"".join(struct.pack(">i", p) for p in parts)
        r = self._call(_API_ADD_PARTITIONS_TO_TXN, 0, payload)
        i = 4  # throttle
        (n_topics,) = struct.unpack_from(">i", r, i)
        i += 4
        for _ in range(n_topics):
            _, i = dec_str(r, i)
            (n_parts,) = struct.unpack_from(">i", r, i)
            i += 4
            for _ in range(n_parts):
                _p, err = struct.unpack_from(">ih", r, i)
                i += 6
                if err:
                    raise RuntimeError(
                        f"kafka add_partitions_to_txn error code {err}")

    def end_txn(self, txn_id: str, producer_id: int, producer_epoch: int,
                commit: bool) -> None:
        payload = (enc_str(txn_id)
                   + struct.pack(">qh", producer_id, producer_epoch)
                   + (b"\x01" if commit else b"\x00"))
        r = self._call(_API_END_TXN, 0, payload)
        _throttle, err = struct.unpack_from(">ih", r, 0)
        if err:
            raise RuntimeError(f"kafka end_txn error code {err}")

    # -- ListOffsets v1 ---------------------------------------------------
    def list_offset(self, topic: str, partition: int,
                    timestamp: int = -1) -> int:
        """timestamp -1 = latest (log end), -2 = earliest."""
        payload = (
            struct.pack(">i", -1) + struct.pack(">i", 1) + enc_str(topic)
            + struct.pack(">i", 1) + struct.pack(">iq", partition, timestamp)
        )
        r = self._call(_API_LIST_OFFSETS, 1, payload)
        i = 4
        _, i = dec_str(r, i)
        i += 4
        _pid, err, _ts, off = struct.unpack_from(">ihqq", r, i)
        if err:
            raise RuntimeError(f"kafka list_offsets error code {err}")
        return off

    # -- Fetch v4 ---------------------------------------------------------
    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 4 * 1024 * 1024, isolation: int = 0):
        """Yield (offset, key, value) from `offset` to current log end.
        isolation 0 = read_uncommitted (Kafka's consumer default),
        1 = read_committed (only records below the last stable offset,
        skipping aborted transactions)."""
        while True:
            payload = (
                struct.pack(">iiiiB", -1, 500, 1, max_bytes, isolation)
                + struct.pack(">i", 1) + enc_str(topic)
                + struct.pack(">i", 1)
                + struct.pack(">iqi", partition, offset, max_bytes)
            )
            r = self._call(_API_FETCH, 4, payload)
            i = 4  # throttle
            i += 4  # topic count
            _, i = dec_str(r, i)
            i += 4  # partition count
            _pid, err, hw = struct.unpack_from(">ihq", r, i)
            i += 4 + 2 + 8
            i += 8  # last_stable_offset
            (n_aborted,) = struct.unpack_from(">i", r, i)
            i += 4
            if n_aborted > 0:
                i += n_aborted * 16
            recs, i = dec_bytes(r, i)
            if err:
                raise RuntimeError(f"kafka fetch error code {err}")
            got = False
            for off, k, v in decode_record_batches(recs or b""):
                if off >= offset:
                    got = True
                    offset = off + 1
                    yield off, k, v
            if not got or offset >= hw:
                return


__all__ = ["KafkaWireClient", "encode_record_batch",
           "decode_record_batches", "batch_header", "crc32c",
           "enc_varint", "dec_varint"]
