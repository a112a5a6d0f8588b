"""Mini backends: taosAdapter (TDengine REST), a Prometheus
remote-write receiver (snappy + protobuf decode for assertions), and a
STOMP broker (ActiveMQ analog)."""

from __future__ import annotations

import json
import re
import socket
import struct
import threading

from seatunnel_spark.testing.rest_servers import _Handler, _serve


# ==========================================================================
# taosAdapter (TDengine REST)
# ==========================================================================

def start_mini_taos(port: int = 0):
    """POST /rest/sql with INSERT INTO ... USING ... TAGS / SELECT
    subsets; stores rows per (db, subtable) plus stable membership."""
    state = {"tables": {}, "stables": {}}  # (db,t)->[rows]; (db,stable)->set
    lock = threading.RLock()

    _INS = re.compile(
        r"(\S+?)\.(\S+?)(?:\s+USING\s+(\S+?)\.(\S+)\s+TAGS\s*\(([^)]*)\))?"
        r"\s*\(([^)]*)\)\s*VALUES\s*\(", re.I)

    def parse_vals(raw: str) -> list:
        out = []
        for tok in re.findall(r"'(?:[^']|'')*'|[^,]+", raw):
            tok = tok.strip()
            if tok.startswith("'"):
                out.append(tok[1:-1].replace("''", "'"))
            elif tok.upper() == "NULL":
                out.append(None)
            elif tok.lower() in ("true", "false"):
                out.append(tok.lower() == "true")
            else:
                out.append(float(tok) if "." in tok else int(tok))
        return out

    def run_sql(sql: str) -> dict:
        sql = sql.strip().rstrip(";")
        if sql.upper().startswith("INSERT INTO"):
            rest = sql[len("INSERT INTO"):].strip()
            for m in _INS.finditer(rest):
                db, sub, sdb, stable, _tags, cols = m.groups()[:6]
                cols = [c.strip() for c in m.group(6).split(",")]
                vals_raw = rest[m.end():].split(")")[0]
                vals = parse_vals(vals_raw)
                row = dict(zip(cols, vals))
                state["tables"].setdefault((db, sub), []).append(row)
                if stable:
                    state["stables"].setdefault((sdb, stable),
                                                set()).add(sub)
            return {"code": 0}
        m = re.match(r"SELECT\s+DISTINCT\s+tbname\s+FROM\s+(\S+)\.(\S+)",
                     sql, re.I)
        if m:
            subs = sorted(state["stables"].get((m.group(1), m.group(2)),
                                               set()))
            return {"code": 0, "column_meta": [["tbname", "VARCHAR", 0]],
                    "data": [[s] for s in subs]}
        m = re.match(r"SELECT\s+\*\s+FROM\s+(\S+)\.(\S+?)"
                     r"(\s+LIMIT\s+(\d+))?$", sql, re.I)
        if m:
            all_rows = list(state["tables"].get((m.group(1), m.group(2)),
                                                []))
            # column meta comes from the table, not the (possibly
            # LIMIT 0) result page
            cols = sorted({k for r in all_rows for k in r})
            rows = all_rows
            if m.group(4) is not None:
                rows = all_rows[:int(m.group(4))]

            def ttype(v):
                if isinstance(v, bool):
                    return "BOOL"
                if isinstance(v, int):
                    return "BIGINT"
                if isinstance(v, float):
                    return "DOUBLE"
                return "VARCHAR"

            meta = [[c, ttype(next((r[c] for r in all_rows
                                    if r.get(c) is not None), "")), 0]
                    for c in cols]
            return {"code": 0, "column_meta": meta,
                    "data": [[r.get(c) for c in cols] for r in rows]}
        return {"code": 9999, "desc": f"unsupported: {sql}"}

    class H(_Handler):
        def do_POST(self):
            if self.path != "/rest/sql":
                self._reply(404, {"code": 404})
                return
            with lock:
                self._reply(200, run_sql(self._body().decode()))

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# Prometheus remote-write receiver
# ==========================================================================

def snappy_decode(data: bytes) -> bytes:
    """Decode snappy block format (literals + copies)."""
    # preamble varint
    n = shift = i = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while i < len(data):
        tag = data[i]
        i += 1
        t = tag & 3
        if t == 0:  # literal
            ln = (tag >> 2) + 1
            if ln > 60:
                nb = ln - 60
                ln = int.from_bytes(data[i:i + nb], "little") + 1
                i += nb
            out += data[i:i + ln]
            i += ln
        else:
            if t == 1:
                ln = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[i]
                i += 1
            elif t == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[i:i + 2], "little")
                i += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[i:i + 4], "little")
                i += 4
            for _ in range(ln):
                out.append(out[-off])
    assert len(out) == n
    return bytes(out)


def decode_write_request(data: bytes) -> list[tuple[dict, list]]:
    """Parse prometheus.WriteRequest (subset used by the sink)."""
    def fields(buf):
        i = 0
        while i < len(buf):
            tag = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                tag |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            num, wire = tag >> 3, tag & 7
            if wire == 2:
                ln = 0
                shift = 0
                while True:
                    b = buf[i]
                    i += 1
                    ln |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                yield num, buf[i:i + ln]
                i += ln
            elif wire == 0:
                v = 0
                shift = 0
                while True:
                    b = buf[i]
                    i += 1
                    v |= (b & 0x7F) << shift
                    if not b & 0x80:
                        break
                    shift += 7
                yield num, v
            elif wire == 1:
                yield num, buf[i:i + 8]
                i += 8

    series = []
    for num, ts_buf in fields(data):
        if num != 1:
            continue
        labels, samples = {}, []
        for n2, payload in fields(ts_buf):
            if n2 == 1:  # label
                name = value = ""
                for n3, p3 in fields(payload):
                    if n3 == 1:
                        name = p3.decode()
                    elif n3 == 2:
                        value = p3.decode()
                labels[name] = value
            elif n2 == 2:  # sample
                val = 0.0
                ts = 0
                for n3, p3 in fields(payload):
                    if n3 == 1:
                        (val,) = struct.unpack("<d", p3)
                    elif n3 == 2:
                        ts = p3 if isinstance(p3, int) else 0
                samples.append((val, ts))
        series.append((labels, samples))
    return series


def start_mini_prometheus(port: int = 0):
    """Remote-write receiver + the query HTTP API: GET /api/v1/query
    answers with an instant vector built from the received samples
    (last sample per series), /api/v1/query_range with a range matrix
    (all samples) — the e2e ITs write via remote-write then read back
    through the same server (VictoriaMetrics speaks both too)."""
    received: list = []
    lock = threading.RLock()

    class H(_Handler):
        def do_POST(self):
            raw = self._body()
            if self.headers.get("Content-Encoding") == "snappy":
                raw = snappy_decode(raw)
            with lock:
                received.extend(decode_write_request(raw))
            self._reply(200, {})

        def do_GET(self):
            import urllib.parse as _up

            parts = _up.urlsplit(self.path)
            q = dict(_up.parse_qsl(parts.query))
            want = _up.unquote(q.get("query", ""))
            with lock:
                series = [(labels, samples) for labels, samples
                          in received
                          if labels.get("__name__") == want]
            if parts.path.endswith("/api/v1/query_range"):
                result = [{
                    "metric": labels,
                    "values": [[ts / 1000.0, str(val)]
                               for val, ts in samples],
                } for labels, samples in series]
                rtype = "matrix"
            elif parts.path.endswith("/api/v1/query"):
                result = [{
                    "metric": labels,
                    "value": [samples[-1][1] / 1000.0,
                              str(samples[-1][0])],
                } for labels, samples in series if samples]
                rtype = "vector"
            else:
                self._reply(404, {"status": "error"})
                return
            self._reply(200, {"status": "success",
                              "data": {"resultType": rtype,
                                       "result": result}})

    port, stop = _serve(H, port)
    return received, port, stop


# ==========================================================================
# STOMP broker
# ==========================================================================

def start_mini_stomp(port: int = 0, host: str = "127.0.0.1"):
    queues: dict[str, list] = {}
    lock = threading.RLock()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(16)
    stop_flag = threading.Event()

    def handle(conn):
        buf = b""
        try:
            while not stop_flag.is_set():
                while b"\x00" not in buf:
                    chunk = conn.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                raw, buf = buf.split(b"\x00", 1)
                buf = buf.lstrip(b"\n")
                head, _, body = raw.partition(b"\n\n")
                lines = head.decode().splitlines()
                while lines and not lines[0]:
                    lines.pop(0)
                cmd = lines[0] if lines else ""
                headers = dict(l.split(":", 1) for l in lines[1:]
                               if ":" in l)
                if cmd == "CONNECT":
                    conn.sendall(b"CONNECTED\nversion:1.2\n\n\x00")
                elif cmd == "SEND":
                    with lock:
                        queues.setdefault(headers.get("destination", "?"),
                                          []).append(body.decode())
                    if "receipt" in headers:
                        conn.sendall(
                            f"RECEIPT\nreceipt-id:{headers['receipt']}\n\n"
                            .encode() + b"\x00")
                elif cmd == "DISCONNECT":
                    return
        except OSError:
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

    return queues, srv.getsockname()[1], shutdown


__all__ = ["start_mini_taos", "start_mini_prometheus", "start_mini_stomp",
           "snappy_decode", "decode_write_request"]


# ==========================================================================
# SelectDB Cloud (copy/upload 307 redirect + copy/query) and Google
# Firestore (REST v1 createDocument) minis for the staged-load sinks.
# ==========================================================================

def start_mini_selectdb(port: int = 0):
    import json as _json
    import urllib.parse as _up

    from seatunnel_spark.testing.rest_servers import _Handler, _serve

    state = {"files": {}, "queries": [], "port": None}

    class H(_Handler):
        def do_PUT(self):
            parsed = _up.urlsplit(self.path)
            if parsed.path == "/copy/upload":
                name = self.headers.get("fileName", "f")
                assert self.headers.get("Authorization", "").startswith(
                    "Basic ")
                self.send_response(307)
                self.send_header(
                    "Location",
                    f"http://127.0.0.1:{state['port']}/stage/{name}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if parsed.path.startswith("/stage/"):
                state["files"][parsed.path[len("/stage/"):]] = self._body()
                return self._reply(200, {})
            return self._reply(404, {})

        def do_POST(self):
            parsed = _up.urlsplit(self.path)
            if parsed.path == "/copy/query":
                doc = _json.loads(self._body())
                state["queries"].append(doc)
                return self._reply(200, {"code": 0, "msg": "success",
                                         "data": {"code": "0"}})
            return self._reply(404, {})

    port, stop = _serve(H, port)
    state["port"] = port
    return state, port, stop


def start_mini_firestore(port: int = 0):
    import json as _json
    import urllib.parse as _up

    from seatunnel_spark.testing.rest_servers import _Handler, _serve

    state = {"docs": {}, "auth": []}

    class H(_Handler):
        def do_POST(self):
            parsed = _up.urlsplit(self.path)
            parts = parsed.path.strip("/").split("/")
            # v1/projects/{p}/databases/(default)/documents/{collection}
            collection = parts[-1]
            state["auth"].append(self.headers.get("Authorization"))
            doc = _json.loads(self._body())
            docs = state["docs"].setdefault(collection, [])
            name = f"doc-{len(docs)}"
            docs.append({"name": name, "fields": doc.get("fields", {})})
            return self._reply(200, {"name": name})

    port, stop = _serve(H, port)
    return state, port, stop


# ==========================================================================
# SMTP server (GreenMail stand-in for connector-email-e2e)
# ==========================================================================

def _self_signed_context():
    """Server SSLContext with a fresh self-signed cert (cryptography)
    — the SMTPS listener the auth'd email path talks to."""
    import datetime
    import ssl
    import tempfile

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                         "mini-smtp")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (x509.CertificateBuilder()
            .subject_name(name).issuer_name(name)
            .public_key(key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(now - datetime.timedelta(days=1))
            .not_valid_after(now + datetime.timedelta(days=1))
            .sign(key, hashes.SHA256()))
    with tempfile.NamedTemporaryFile(suffix=".pem", delete=False) as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption()))
        f.write(cert.public_bytes(serialization.Encoding.PEM))
        path = f.name
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(path)
    return ctx


def start_mini_smtp(port: int = 0, host: str = "127.0.0.1",
                    tls: bool = False):
    """Minimal RFC 5321 server: HELO/EHLO, MAIL FROM, RCPT TO, DATA
    (dot-terminated), QUIT; `tls=True` wraps accepted sockets in a
    self-signed SMTPS listener (what mail.smtp.ssl.enable talks to).
    Returns (messages, port, stop); each message is
    {"from", "to": [...], "data": str}."""
    messages: list[dict] = []
    lock = threading.RLock()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(8)
    actual = srv.getsockname()[1]
    stopping = threading.Event()
    ssl_ctx = _self_signed_context() if tls else None

    def handle(conn):
        if ssl_ctx is not None:
            try:
                conn = ssl_ctx.wrap_socket(conn, server_side=True)
            except OSError:
                return
        f = conn.makefile("rb")

        def send(line):
            conn.sendall(line.encode() + b"\r\n")

        try:
            send("220 mini-smtp ready")
            cur = {"from": "", "to": [], "data": ""}
            while True:
                line = f.readline()
                if not line:
                    return
                cmd = line.decode(errors="replace").strip()
                up = cmd.upper()
                if up.startswith("EHLO"):
                    send("250-mini-smtp")
                    send("250 AUTH PLAIN LOGIN")
                elif up.startswith("HELO"):
                    send("250 mini-smtp")
                elif up.startswith("AUTH"):
                    # PLAIN with inline initial response, or LOGIN's
                    # two base64 prompts — accept either
                    if up.startswith("AUTH LOGIN"):
                        send("334 VXNlcm5hbWU6")
                        f.readline()
                        send("334 UGFzc3dvcmQ6")
                        f.readline()
                    send("235 authenticated")
                elif up.startswith("MAIL FROM:"):
                    cur["from"] = cmd[10:].strip().strip("<>")
                    send("250 OK")
                elif up.startswith("RCPT TO:"):
                    cur["to"].append(cmd[8:].strip().strip("<>"))
                    send("250 OK")
                elif up == "DATA":
                    send("354 end with <CRLF>.<CRLF>")
                    body = []
                    while True:
                        dl = f.readline()
                        if not dl or dl.rstrip(b"\r\n") == b".":
                            break
                        body.append(dl.decode(errors="replace"))
                    cur["data"] = "".join(body)
                    with lock:
                        messages.append(dict(cur))
                    cur = {"from": "", "to": [], "data": ""}
                    send("250 OK queued")
                elif up == "QUIT":
                    send("221 bye")
                    return
                elif up in ("RSET", "NOOP"):
                    send("250 OK")
                else:
                    send("502 not implemented")
        except OSError:
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def accept_loop():
        while not stopping.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            srv.close()
        except OSError:
            pass

    return messages, actual, stop
