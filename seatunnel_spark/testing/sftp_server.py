"""Mini SSH/SFTP server — the sandbox stand-in for the reference's
Testcontainers `atmoz/sftp` fixture (connector-file-sftp-e2e
SftpFileIT). Speaks the same from-scratch SSH2 transport as the client
(ssh_wire: curve25519-sha256 kex, ssh-ed25519 host key, aes128-ctr +
hmac-sha2-256, password auth) and serves SFTP v3 against a local root
directory, so the e2e confs exercise the full wire."""

from __future__ import annotations

import os
import socket
import struct
import threading

from seatunnel_spark import ssh_wire as W
from seatunnel_spark.ssh_wire import Reader, sstr


class _SftpSession:
    def __init__(self, tr: W.SshTransport, root: str):
        self.tr = tr
        self.root = root
        self.buf = b""
        self.remote_id = 0
        self.handles: dict[bytes, dict] = {}
        self._hn = 0

    # path sandboxing: absolute and relative remote paths both resolve
    # under root (atmoz/sftp chroots the same way)
    def _local(self, path: str) -> str:
        p = os.path.normpath(path.lstrip("/"))
        if p.startswith(".."):
            raise PermissionError(path)
        return os.path.join(self.root, p) if p != "." else self.root

    def serve(self) -> None:
        tr = self.tr
        # channel open + subsystem request
        p = Reader(tr.recv_msg(W.MSG_CHANNEL_OPEN), 1)
        ctype = p.string()
        self.remote_id = p.uint32()
        if ctype != b"session":
            tr.send_packet(bytes([W.MSG_CHANNEL_OPEN_FAILURE])
                           + struct.pack(">II", self.remote_id, 1)
                           + sstr(b"only session") + sstr(b""))
            return
        tr.send_packet(bytes([W.MSG_CHANNEL_OPEN_CONFIRMATION])
                       + struct.pack(">IIII", self.remote_id, 0,
                                     1 << 30, 1 << 20))
        req = Reader(tr.recv_msg(W.MSG_CHANNEL_REQUEST), 1)
        req.uint32()
        rtype = req.string()
        want_reply = req.boolean()
        if rtype != b"subsystem" or req.string() != b"sftp":
            if want_reply:
                tr.send_packet(bytes([W.MSG_CHANNEL_FAILURE])
                               + struct.pack(">I", self.remote_id))
            return
        if want_reply:
            tr.send_packet(bytes([W.MSG_CHANNEL_SUCCESS])
                           + struct.pack(">I", self.remote_id))
        while True:
            t, body = self._recv_sftp()
            if t == W.FXP_INIT:
                self._send(struct.pack(">BI", W.FXP_VERSION, 3))
                continue
            self._dispatch(t, Reader(body))

    # -- framing --
    def _chan_read(self, n: int) -> bytes:
        while len(self.buf) < n:
            p = self.tr.recv_msg(W.MSG_CHANNEL_DATA, W.MSG_CHANNEL_CLOSE)
            if p[0] == W.MSG_CHANNEL_CLOSE:
                raise ConnectionError("channel closed")
            r = Reader(p, 1)
            r.uint32()
            self.buf += r.string()
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def _recv_sftp(self) -> tuple[int, bytes]:
        (ln,) = struct.unpack(">I", self._chan_read(4))
        body = self._chan_read(ln)
        return body[0], body[1:]

    def _send(self, data: bytes) -> None:
        self.tr.send_packet(bytes([W.MSG_CHANNEL_DATA])
                            + struct.pack(">I", self.remote_id)
                            + sstr(struct.pack(">I", len(data)) + data))

    def _status(self, rid: int, code: int, msg: str = "") -> None:
        self._send(struct.pack(">BII", W.FXP_STATUS, rid, code)
                   + sstr(msg) + sstr(""))

    def _attrs_of(self, path: str) -> bytes:
        st = os.stat(path)
        return W.encode_attrs(size=st.st_size, permissions=st.st_mode)

    # -- op dispatch --
    def _dispatch(self, t: int, r: Reader) -> None:
        rid = r.uint32()
        try:
            if t in (W.FXP_STAT, W.FXP_LSTAT):
                self._send(struct.pack(">BI", W.FXP_ATTRS, rid)
                           + self._attrs_of(self._local(
                               r.string().decode())))
            elif t == W.FXP_REALPATH:
                p = r.string().decode()
                canon = "/" + os.path.normpath(p.lstrip("/")).replace(
                    "\\", "/").lstrip("./")
                self._send(struct.pack(">BII", W.FXP_NAME, rid, 1)
                           + sstr(canon) + sstr(canon)
                           + W.encode_attrs())
            elif t == W.FXP_OPENDIR:
                path = self._local(r.string().decode())
                if not os.path.isdir(path):
                    self._status(rid, W.FX_NO_SUCH_FILE, path)
                    return
                h = self._new_handle({"dir": path, "served": False})
                self._send(struct.pack(">BI", W.FXP_HANDLE, rid)
                           + sstr(h))
            elif t == W.FXP_READDIR:
                h = self.handles.get(bytes(r.string()))
                if h is None or "dir" not in h:
                    self._status(rid, W.FX_FAILURE, "bad handle")
                    return
                if h["served"]:
                    self._status(rid, W.FX_EOF)
                    return
                h["served"] = True
                names = sorted(os.listdir(h["dir"]))
                out = struct.pack(">BII", W.FXP_NAME, rid, len(names))
                for n in names:
                    full = os.path.join(h["dir"], n)
                    out += sstr(n) + sstr(n) + self._attrs_of(full)
                self._send(out)
            elif t == W.FXP_OPEN:
                path = self._local(r.string().decode())
                pflags = r.uint32()
                if pflags & W.FXF_READ and not os.path.isfile(path):
                    self._status(rid, W.FX_NO_SUCH_FILE, path)
                    return
                mode = "rb" if pflags & W.FXF_READ else (
                    "wb" if pflags & W.FXF_TRUNC else "r+b")
                if "w" not in mode and "r+" in mode \
                        and not os.path.exists(path):
                    mode = "wb"
                f = open(path, mode)  # noqa: SIM115 - handle table owns it
                h = self._new_handle({"file": f})
                self._send(struct.pack(">BI", W.FXP_HANDLE, rid)
                           + sstr(h))
            elif t == W.FXP_READ:
                h = self.handles.get(bytes(r.string()))
                off, n = r.uint64(), r.uint32()
                f = h["file"]
                f.seek(off)
                blob = f.read(n)
                if not blob:
                    self._status(rid, W.FX_EOF)
                else:
                    self._send(struct.pack(">BI", W.FXP_DATA, rid)
                               + sstr(blob))
            elif t == W.FXP_WRITE:
                h = self.handles.get(bytes(r.string()))
                off = r.uint64()
                blob = r.string()
                f = h["file"]
                f.seek(off)
                f.write(blob)
                self._status(rid, W.FX_OK)
            elif t == W.FXP_CLOSE:
                h = self.handles.pop(bytes(r.string()), None)
                if h and "file" in h:
                    h["file"].close()
                self._status(rid, W.FX_OK)
            elif t == W.FXP_MKDIR:
                try:
                    os.mkdir(self._local(r.string().decode()))
                    self._status(rid, W.FX_OK)
                except FileExistsError:
                    self._status(rid, W.FX_FAILURE, "exists")
            elif t == W.FXP_RMDIR:
                os.rmdir(self._local(r.string().decode()))
                self._status(rid, W.FX_OK)
            elif t == W.FXP_REMOVE:
                os.remove(self._local(r.string().decode()))
                self._status(rid, W.FX_OK)
            elif t == W.FXP_RENAME:
                old = self._local(r.string().decode())
                new = self._local(r.string().decode())
                os.rename(old, new)
                self._status(rid, W.FX_OK)
            else:
                self._status(rid, W.FX_FAILURE, f"unsupported op {t}")
        except FileNotFoundError as e:
            self._status(rid, W.FX_NO_SUCH_FILE, str(e))
        except OSError as e:
            self._status(rid, W.FX_FAILURE, str(e))

    def _new_handle(self, entry: dict) -> bytes:
        self._hn += 1
        h = b"h%d" % self._hn
        self.handles[h] = entry
        return h


def start_mini_sftp(user: str, password: str, root: str,
                    port: int = 0, host: str = "127.0.0.1"):
    """Start the server; returns (port, stop). Each connection gets its
    own transport thread; the Ed25519 host key is generated fresh."""
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PrivateKey)

    os.makedirs(root, exist_ok=True)
    host_key = Ed25519PrivateKey.generate()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(8)
    actual_port = srv.getsockname()[1]
    stopping = threading.Event()

    def handle(conn: socket.socket) -> None:
        try:
            tr = W.SshTransport(conn)
            peer = tr.exchange_versions()
            tr.server_kex(peer, host_key)
            tr.server_auth(lambda u, p: u == user and p == password)
            _SftpSession(tr, root).serve()
        except (ConnectionError, OSError, PermissionError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def accept_loop() -> None:
        while not stopping.is_set():
            try:
                conn, _ = srv.accept()
            except OSError:
                return
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()

    threading.Thread(target=accept_loop, daemon=True).start()

    def stop() -> None:
        stopping.set()
        try:
            srv.close()
        except OSError:
            pass

    return actual_port, stop
