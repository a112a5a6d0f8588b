"""Mini Kafka broker — in-process TCP server speaking the wire APIs
the client uses (ApiVersions v0, Metadata v1, Produce v3, Fetch v4,
ListOffsets v1) with magic-2 record batches stored per
(topic, partition) log. Auto-creates topics with `num_partitions`
(default 1). The sandbox stand-in for a Testcontainers Kafka fixture."""

from __future__ import annotations

import socket
import struct
import threading

from seatunnel_spark.kafka_wire import (
    batch_header,
    dec_bytes,
    dec_str,
    decode_record_batches,
    enc_bytes,
    enc_str,
    encode_record_batch,
)


class MiniKafka:
    def __init__(self, num_partitions: int = 2):
        self.num_partitions = num_partitions
        # (topic, partition) -> list[(key, value)]
        self.logs: dict[tuple[str, int], list] = {}
        self.lock = threading.RLock()
        self.host = "127.0.0.1"
        self.port = 0
        # -- transaction coordinator state (KIP-98 model) --------------
        self._next_pid = 1000
        # transactional.id -> {"pid", "epoch", "parts": set[(t,p)]}
        self.txns: dict[str, dict] = {}
        # (topic, partition) -> {pid: first_uncommitted_offset}
        self.open_txn_start: dict[tuple[str, int], dict[int, int]] = {}
        # (topic, partition) -> [(start, end)] aborted offset ranges
        self.aborted: dict[tuple[str, int], list[tuple[int, int]]] = {}
        # (pid, epoch, topic, partition) -> next expected base sequence
        # (idempotent-producer duplicate detection; epoch in the key —
        # a fencing bump resets the sequence space like a real broker)
        self.next_seq: dict[tuple, int] = {}
        # (pid, epoch, topic, partition) -> base offset of last batch
        self.last_base: dict[tuple, int] = {}
        # (group, topic, partition) -> committed offset
        self.group_offsets: dict[tuple[str, str, int], int] = {}
        # -- SASL GSSAPI acceptor state (kerberized broker mode) -------
        self.gssapi_key: bytes | None = None  # the broker's service key
        self.sasl_events: list[str] = []
        self.auth_failures = 0

    def enable_gssapi(self, service_key: bytes) -> None:
        """Kerberize the broker: every connection must complete a SASL
        GSSAPI handshake (service ticket encrypted with `service_key`)
        before any other API; unauthenticated requests drop the
        connection like a real SASL_PLAINTEXT listener."""
        self.gssapi_key = service_key

    def _gss_accept(self, state: dict, token: bytes) -> bytes:
        from seatunnel_spark import krb5 as K

        step = state.get("sasl_step", 0)
        if step == 0:
            ap_req = K.gss_parse_initial(token)
            _tag, inner = K.der_unwrap(ap_req, 0x6E)
            _, seq = K.der_unwrap(inner)
            af = seq.fields()
            ticket = K.dec_ticket(af[3].bytes_())
            tkt_plain = K.krb_decrypt(self.gssapi_key, 2, ticket.cipher)
            _, tp = K.der_unwrap(tkt_plain, 0x63)
            _, tpseq = K.der_unwrap(tp)
            tpf = tpseq.fields()
            _kt, session = K.dec_key(K.DerView(tpf[1].bytes_()))
            cname = K.dec_principal(K.DerView(tpf[3].bytes_()))
            _et, auth_cipher = K.dec_encrypted_data(
                K.DerView(af[4].bytes_()))
            K.krb_decrypt(session, 11, auth_cipher)  # verify client
            state["sasl_session"] = session
            state["sasl_client"] = "/".join(cname)
            self.sasl_events.append(f"AP-REQ from {'/'.join(cname)}")
            ap_rep = K.der_app(15, K.der_seq(
                K.der_ctx(0, K.der_int(5)),
                K.der_ctx(1, K.der_int(15)),
                K.der_ctx(2, K.enc_encrypted_data(
                    K.ETYPE_AES256,
                    K.krb_encrypt(session, 12, K.der_app(27, K.der_seq(
                        K.der_ctx(0, K.der_gentime()),
                        K.der_ctx(1, K.der_int(0)))))))))
            state["sasl_step"] = 1
            return K.gss_ap_rep_token(ap_rep)
        if step == 1:
            # client context complete (empty token) -> offer layers
            state["sasl_step"] = 2
            return K.gss_wrap(state["sasl_session"],
                              b"\x01\x7f\xff\xff", initiator=False,
                              seal=False)
        # step 2: client's chosen layer
        choice = K.gss_unwrap(state["sasl_session"], token,
                              initiator_sent=True)
        if not choice or not choice[0] & 0x01:
            raise ValueError("client selected unsupported SASL layer")
        state["authenticated"] = True
        self.sasl_events.append(f"authenticated {state['sasl_client']}")
        return b""

    def topic_partitions(self, topic: str) -> list[int]:
        with self.lock:
            parts = sorted(p for (t, p) in self.logs if t == topic)
            return parts or list(range(self.num_partitions))

    def append(self, topic: str, partition: int, records) -> int:
        with self.lock:
            log = self.logs.setdefault((topic, partition), [])
            base = len(log)
            log.extend(records)
            return base

    def _produce(self, topic: str, partition: int, records,
                 txn: str | None, hdr: dict) -> tuple[int, int]:
        """-> (base_offset, error_code). Enforces idempotent-producer
        sequence dedup and transactional epoch fencing."""
        ppid = hdr.get("producer_id", -1)
        with self.lock:
            if ppid is not None and ppid >= 0 and \
                    hdr.get("base_sequence", -1) >= 0:
                k = (ppid, hdr.get("producer_epoch", -1), topic, partition)
                exp = self.next_seq.get(k, 0)
                seq = hdr["base_sequence"]
                if seq < exp:
                    # duplicate batch retry: ack its original base
                    # offset without re-appending (idempotence)
                    return self.last_base.get(k, 0), 0
                if seq > exp:
                    return -1, 45  # OUT_OF_ORDER_SEQUENCE_NUMBER
            if txn is not None or hdr.get("transactional"):
                entry = self.txns.get(txn)
                err = self._txn_err(entry, ppid, hdr.get("producer_epoch", -1))
                if err:
                    return -1, err
                if (topic, partition) not in entry["parts"]:
                    return -1, 49  # partition not added to txn
            base = self.append(topic, partition, records)
            if ppid is not None and ppid >= 0 and \
                    hdr.get("base_sequence", -1) >= 0:
                k = (ppid, hdr.get("producer_epoch", -1), topic, partition)
                self.next_seq[k] = hdr["base_sequence"] + len(records)
                self.last_base[k] = base
            if txn is not None or hdr.get("transactional"):
                self.open_txn_start.setdefault(
                    (topic, partition), {}).setdefault(ppid, base)
            return base, 0

    def read_all(self, topic: str) -> list[tuple]:
        """Test helper: every (partition, offset, key, value)."""
        with self.lock:
            out = []
            for (t, p), log in sorted(self.logs.items()):
                if t == topic:
                    out += [(p, i, k, v) for i, (k, v) in enumerate(log)]
            return out

    def seed(self, topic: str, values: list, partition: int = 0):
        recs = [(None, v.encode() if isinstance(v, str) else v)
                for v in values]
        self.append(topic, partition, recs)

    # -- transaction helpers ----------------------------------------------
    def _txn_err(self, entry, pid: int, epoch: int) -> int:
        """0 ok; 47 INVALID_PRODUCER_EPOCH (zombie fenced);
        49 INVALID_TXN_STATE (unknown txn/pid)."""
        if entry is None or entry["pid"] != pid:
            return 49
        if entry["epoch"] != epoch:
            return 47
        return 0

    def _abort_open(self, entry) -> None:
        for (t, p) in entry["parts"]:
            opens = self.open_txn_start.get((t, p), {})
            start = opens.pop(entry["pid"], None)
            if start is not None:
                end = len(self.logs.get((t, p), []))
                self.aborted.setdefault((t, p), []).append((start, end))
        entry["parts"] = set()

    def _lso(self, t: str, p: int) -> int:
        """Last stable offset: everything below it is decided."""
        opens = self.open_txn_start.get((t, p), {})
        log_end = len(self.logs.get((t, p), []))
        return min(opens.values(), default=log_end)

    def _visible_runs(self, t: str, p: int, off: int, limit: int
                      ) -> list[tuple[int, list]]:
        """Contiguous [base_offset, records] runs in [off, limit)
        excluding aborted ranges — each run becomes its own batch so
        consumer offsets stay exact despite the gaps."""
        log = self.logs.get((t, p), [])
        aborted = self.aborted.get((t, p), [])
        runs: list[tuple[int, list]] = []
        cur: list = []
        cur_base = None
        for o in range(off, min(limit, len(log))):
            if any(s <= o < e for s, e in aborted):
                if cur:
                    runs.append((cur_base, cur))
                    cur, cur_base = [], None
                continue
            if cur_base is None:
                cur_base = o
            cur.append(log[o])
        if cur:
            runs.append((cur_base, cur))
        return runs

    # -- request handling -------------------------------------------------
    def handle_request(self, api: int, version: int, body: bytes,
                       state: dict | None = None) -> bytes:
        state = state if state is not None else {"authenticated": True}
        if self.gssapi_key is not None and not state.get("authenticated"):
            if api == 17:  # SaslHandshake v1
                mech, _ = dec_str(body, 0)
                if (mech or "").upper() != "GSSAPI":
                    return struct.pack(">hi", 33, 1) + enc_str("GSSAPI")
                state["handshook"] = True
                return struct.pack(">hi", 0, 1) + enc_str("GSSAPI")
            if api == 36:  # SaslAuthenticate v0
                token, _ = dec_bytes(body, 0)
                try:
                    out = self._gss_accept(state, token or b"")
                except Exception as e:  # noqa: BLE001 - bad credentials
                    self.auth_failures += 1
                    return (struct.pack(">h", 58)  # SASL_AUTH_FAILED
                            + enc_str(str(e)) + enc_bytes(b""))
                return struct.pack(">h", 0) + enc_str(None) \
                    + enc_bytes(out)
            if api == 18:
                pass  # ApiVersions allowed pre-auth (the real broker's)
            else:
                # unauthenticated data API on a SASL listener: the real
                # broker closes the connection
                raise ConnectionError("unauthenticated request")
        if api == 18:  # ApiVersions
            entries = [(0, 0, 3), (1, 0, 4), (2, 0, 1), (3, 0, 1),
                       (8, 0, 2), (9, 0, 1), (17, 0, 1), (18, 0, 0),
                       (22, 0, 0), (24, 0, 0), (26, 0, 0), (36, 0, 0)]
            return (struct.pack(">h", 0) + struct.pack(">i", len(entries))
                    + b"".join(struct.pack(">hhh", *e) for e in entries))
        if api == 9:  # OffsetFetch v1
            group, i = dec_str(body, 0)
            (nt,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", nt)
            for _ in range(nt):
                topic, i = dec_str(body, i)
                (np_,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", np_)
                for _ in range(np_):
                    (p,) = struct.unpack_from(">i", body, i)
                    i += 4
                    with self.lock:
                        off = self.group_offsets.get((group, topic, p), -1)
                    out += struct.pack(">iq", p, off) + enc_str("") \
                        + struct.pack(">h", 0)
            return out
        if api == 8:  # OffsetCommit v2
            group, i = dec_str(body, 0)
            i += 4  # generation
            _member, i = dec_str(body, i)
            i += 8  # retention
            (nt,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", nt)
            for _ in range(nt):
                topic, i = dec_str(body, i)
                (np_,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", np_)
                for _ in range(np_):
                    p, off = struct.unpack_from(">iq", body, i)
                    i += 12
                    _meta, i = dec_str(body, i)
                    with self.lock:
                        self.group_offsets[(group, topic, p)] = off
                    out += struct.pack(">ih", p, 0)
            return out
        if api == 22:  # InitProducerId v0
            txn_id, i = dec_str(body, 0)
            with self.lock:
                if txn_id is None:
                    pid, epoch = self._next_pid, 0
                    self._next_pid += 1
                else:
                    entry = self.txns.get(txn_id)
                    if entry is None:
                        entry = {"pid": self._next_pid, "epoch": 0,
                                 "parts": set()}
                        self._next_pid += 1
                        self.txns[txn_id] = entry
                    else:
                        # bump the epoch: fences the previous producer
                        # instance and ABORTS any transaction it left
                        # open (real coordinator recovery semantics)
                        self._abort_open(entry)
                        entry["epoch"] += 1
                    pid, epoch = entry["pid"], entry["epoch"]
            return struct.pack(">ihqh", 0, 0, pid, epoch)
        if api == 24:  # AddPartitionsToTxn v0
            txn_id, i = dec_str(body, 0)
            pid, epoch = struct.unpack_from(">qh", body, i)
            i += 10
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            results = []
            with self.lock:
                entry = self.txns.get(txn_id)
                for _ in range(n_topics):
                    t, i = dec_str(body, i)
                    (n_parts,) = struct.unpack_from(">i", body, i)
                    i += 4
                    parts = []
                    for _ in range(n_parts):
                        (p,) = struct.unpack_from(">i", body, i)
                        i += 4
                        err = self._txn_err(entry, pid, epoch)
                        if not err:
                            entry["parts"].add((t, p))
                        parts.append((p, err))
                    results.append((t, parts))
            out = struct.pack(">i", 0) + struct.pack(">i", len(results))
            for t, parts in results:
                out += enc_str(t) + struct.pack(">i", len(parts))
                for p, err in parts:
                    out += struct.pack(">ih", p, err)
            return out
        if api == 26:  # EndTxn v0
            txn_id, i = dec_str(body, 0)
            pid, epoch = struct.unpack_from(">qh", body, i)
            commit = body[i + 10] != 0
            with self.lock:
                entry = self.txns.get(txn_id)
                err = self._txn_err(entry, pid, epoch)
                if not err:
                    for (t, p) in entry["parts"]:
                        opens = self.open_txn_start.get((t, p), {})
                        start = opens.pop(pid, None)
                        if start is not None and not commit:
                            end = len(self.logs.get((t, p), []))
                            self.aborted.setdefault((t, p), []).append(
                                (start, end))
                    entry["parts"] = set()
            return struct.pack(">ih", 0, err)
        if api == 3:  # Metadata v1
            i = 0
            (n,) = struct.unpack_from(">i", body, i)
            i += 4
            topics = []
            if n == -1:
                with self.lock:
                    topics = sorted({t for (t, _) in self.logs})
            else:
                for _ in range(n):
                    t, i = dec_str(body, i)
                    topics.append(t)
            out = struct.pack(">i", 1)  # one broker
            out += struct.pack(">i", 0) + enc_str(self.host) \
                + struct.pack(">i", self.port) + enc_str(None)
            out += struct.pack(">i", 0)  # controller id
            out += struct.pack(">i", len(topics))
            for t in topics:
                parts = self.topic_partitions(t)
                for p in parts:  # auto-create
                    self.logs.setdefault((t, p), [])
                out += struct.pack(">h", 0) + enc_str(t) + b"\x00"
                out += struct.pack(">i", len(parts))
                for p in parts:
                    out += struct.pack(">hii", 0, p, 0)
                    out += struct.pack(">ii", 1, 0)   # replicas [0]
                    out += struct.pack(">ii", 1, 0)   # isr [0]
            return out
        if api == 0:  # Produce v3
            i = 0
            txn, i = dec_str(body, i)
            _acks, _timeout = struct.unpack_from(">hi", body, i)
            i += 6
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            resp_topics = b""
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                part_resp = b""
                for _ in range(n_parts):
                    (pid,) = struct.unpack_from(">i", body, i)
                    i += 4
                    recs, i = dec_bytes(body, i)
                    hdr = batch_header(recs or b"") or {}
                    records = [(k, v) for _, k, v in
                               decode_record_batches(recs or b"")]
                    base, err = self._produce(topic, pid, records, txn, hdr)
                    part_resp += struct.pack(">ihqq", pid, err, base, -1)
                resp_topics += (enc_str(topic) + struct.pack(">i", n_parts)
                                + part_resp)
            return (struct.pack(">i", n_topics) + resp_topics
                    + struct.pack(">i", 0))  # throttle
        if api == 2:  # ListOffsets v1
            i = 4  # replica id
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", n_topics)
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid, ts = struct.unpack_from(">iq", body, i)
                    i += 12
                    log = self.logs.get((topic, pid), [])
                    # -2 earliest, -1 latest; a real broker indexes by
                    # record time for ts >= 0 — the mini has no time
                    # index and everything it holds was appended "now",
                    # so any historical ts resolves to the log start
                    off = len(log) if ts == -1 else 0
                    out += struct.pack(">ihqq", pid, 0, -1, off)
            return out
        if api == 1:  # Fetch v4
            isolation = body[4 + 4 + 4 + 4]
            i = 4 + 4 + 4 + 4 + 1  # replica, max_wait, min_bytes, max_bytes, isolation
            (n_topics,) = struct.unpack_from(">i", body, i)
            i += 4
            out = struct.pack(">i", 0)  # throttle
            out += struct.pack(">i", n_topics)
            for _ in range(n_topics):
                topic, i = dec_str(body, i)
                (n_parts,) = struct.unpack_from(">i", body, i)
                i += 4
                out += enc_str(topic) + struct.pack(">i", n_parts)
                for _ in range(n_parts):
                    pid, off, _maxb = struct.unpack_from(">iqi", body, i)
                    i += 16
                    with self.lock:
                        log = self.logs.get((topic, pid), [])
                        log_end = len(log)
                        lso = self._lso(topic, pid)
                        if isolation == 1:
                            # read_committed: only decided offsets,
                            # aborted ranges skipped; one batch per
                            # contiguous visible run keeps offsets exact
                            hw = lso
                            runs = self._visible_runs(
                                topic, pid, off, min(lso, off + 500))
                        else:
                            hw = log_end
                            chunk = log[off:off + 500]
                            runs = [(off, chunk)] if chunk else []
                    batch = b"".join(encode_record_batch(b, recs)
                                     for b, recs in runs if recs)
                    out += struct.pack(">ihq", pid, 0, hw)
                    out += struct.pack(">q", lso)     # last stable offset
                    out += struct.pack(">i", 0)       # aborted txns
                    out += enc_bytes(batch)
            return out
        raise ValueError(f"mini-kafka: unsupported api {api}")


def start_mini_kafka(port: int = 0, host: str = "127.0.0.1",
                     num_partitions: int = 2):
    broker = MiniKafka(num_partitions)
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(64)
    broker.host, broker.port = host, srv.getsockname()[1]
    stop_flag = threading.Event()

    def handle(conn):
        buf = b""
        state = {"authenticated": broker.gssapi_key is None}

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

        try:
            while not stop_flag.is_set():
                (length,) = struct.unpack(">i", read_exact(4))
                msg = read_exact(length)
                api, version, corr = struct.unpack_from(">hhi", msg, 0)
                _cid, i = dec_str(msg, 8)
                try:
                    resp = broker.handle_request(api, version, msg[i:],
                                                 state)
                except ValueError:
                    continue
                conn.sendall(struct.pack(">i", len(resp) + 4)
                             + struct.pack(">i", corr) + resp)
        except (ConnectionError, OSError, struct.error):
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

    return broker, broker.port, shutdown


__all__ = ["MiniKafka", "start_mini_kafka"]
