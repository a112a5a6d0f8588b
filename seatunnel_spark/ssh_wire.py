"""Minimal SSH2 transport + SFTP v3, stdlib + `cryptography` only.

Written from the public RFCs: 4253 (binary packet protocol, kex
framing, key derivation), 8731 (curve25519-sha256 key exchange), 8709
(ssh-ed25519 host keys), 4252 (password auth), 4254 (channels /
subsystem), and draft-ietf-secsh-filexfer-02 (SFTP v3 — the version
every server speaks). One fixed, modern algorithm suite both ways:

    kex        curve25519-sha256
    host key   ssh-ed25519
    cipher     aes128-ctr
    mac        hmac-sha2-256
    compress   none

Reference parity: connector-file-sftp drives a JSch session +
ChannelSftp (SFTPConnectionProvider); this module is the same surface
(connect, auth, stat/ls/get/put/mkdirs) over a from-scratch transport,
because neither JSch nor paramiko exists in this sandbox. Both the
client (sftp_fs) and the test server (testing/sftp_server) speak this
transport, so the e2e confs exercise the REAL wire: version exchange,
KEXINIT negotiation, X25519 + Ed25519-signed exchange hash, AES-CTR +
HMAC packets, password auth, channel open, sftp subsystem.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import os
import socket
import struct

# -- wire primitives --------------------------------------------------------

MSG_DISCONNECT = 1
MSG_IGNORE = 2
MSG_UNIMPLEMENTED = 3
MSG_DEBUG = 4
MSG_SERVICE_REQUEST = 5
MSG_SERVICE_ACCEPT = 6
MSG_KEXINIT = 20
MSG_NEWKEYS = 21
MSG_KEX_ECDH_INIT = 30
MSG_KEX_ECDH_REPLY = 31
MSG_USERAUTH_REQUEST = 50
MSG_USERAUTH_FAILURE = 51
MSG_USERAUTH_SUCCESS = 52
MSG_GLOBAL_REQUEST = 80
MSG_REQUEST_FAILURE = 82
MSG_CHANNEL_OPEN = 90
MSG_CHANNEL_OPEN_CONFIRMATION = 91
MSG_CHANNEL_OPEN_FAILURE = 92
MSG_CHANNEL_WINDOW_ADJUST = 93
MSG_CHANNEL_DATA = 94
MSG_CHANNEL_EOF = 96
MSG_CHANNEL_CLOSE = 97
MSG_CHANNEL_REQUEST = 98
MSG_CHANNEL_SUCCESS = 99
MSG_CHANNEL_FAILURE = 100

VERSION = b"SSH-2.0-seatunnel_spark_0.1"


def sstr(b) -> bytes:
    if isinstance(b, str):
        b = b.encode()
    return struct.pack(">I", len(b)) + b


def mpint(n: int) -> bytes:
    if n == 0:
        return struct.pack(">I", 0)
    nb = n.to_bytes((n.bit_length() + 8) // 8, "big")  # leading 0 if hi bit
    return sstr(nb)


class Reader:
    def __init__(self, data: bytes, i: int = 0):
        self.data, self.i = data, i

    def byte(self) -> int:
        v = self.data[self.i]
        self.i += 1
        return v

    def boolean(self) -> bool:
        return self.byte() != 0

    def uint32(self) -> int:
        (v,) = struct.unpack_from(">I", self.data, self.i)
        self.i += 4
        return v

    def uint64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.data, self.i)
        self.i += 8
        return v

    def string(self) -> bytes:
        n = self.uint32()
        v = self.data[self.i:self.i + n]
        self.i += n
        return v

    def rest(self) -> bytes:
        return self.data[self.i:]


KEX_ALG = b"curve25519-sha256"
HOSTKEY_ALG = b"ssh-ed25519"
CIPHER_ALG = b"aes128-ctr"
MAC_ALG = b"hmac-sha2-256"


def _kexinit_payload() -> bytes:
    nl = sstr  # name-list == string of comma-joined names
    return (bytes([MSG_KEXINIT]) + os.urandom(16)
            + nl(KEX_ALG) + nl(HOSTKEY_ALG)
            + nl(CIPHER_ALG) + nl(CIPHER_ALG)
            + nl(MAC_ALG) + nl(MAC_ALG)
            + nl(b"none") + nl(b"none")
            + nl(b"") + nl(b"")
            + b"\x00" + struct.pack(">I", 0))


def _derive(shared_mp: bytes, h: bytes, letter: bytes,
            session_id: bytes, n: int) -> bytes:
    out = hashlib.sha256(shared_mp + h + letter + session_id).digest()
    while len(out) < n:
        out += hashlib.sha256(shared_mp + h + out).digest()
    return out[:n]


class SshTransport:
    """RFC 4253 packet layer over a connected socket. After `kex()`
    (client) / `accept_kex()` (server) all packets ride aes128-ctr +
    hmac-sha2-256."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._buf = b""
        self._seq_out = 0
        self._seq_in = 0
        self._enc = None     # outgoing CTR encryptor
        self._dec = None     # incoming CTR decryptor
        self._mac_out = None
        self._mac_in = None
        self.session_id: bytes | None = None

    # -- raw IO --
    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("ssh connection closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_line(self) -> bytes:
        while b"\n" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("ssh connection closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\n", 1)
        return line.rstrip(b"\r")

    def exchange_versions(self) -> bytes:
        """Send our version line, read the peer's (skipping banner
        lines, RFC 4253 §4.2). Returns the peer version string."""
        self.sock.sendall(VERSION + b"\r\n")
        while True:
            line = self._read_line()
            if line.startswith(b"SSH-"):
                return line

    # -- packet layer --
    def send_packet(self, payload: bytes) -> None:
        block = 16 if self._enc else 8
        padlen = block - ((5 + len(payload)) % block)
        if padlen < 4:
            padlen += block
        pkt = struct.pack(">IB", 1 + len(payload) + padlen, padlen) \
            + payload + os.urandom(padlen)
        if self._enc:
            mac = hmac_mod.new(
                self._mac_out, struct.pack(">I", self._seq_out) + pkt,
                hashlib.sha256).digest()
            self.sock.sendall(self._enc.update(pkt) + mac)
        else:
            self.sock.sendall(pkt)
        self._seq_out = (self._seq_out + 1) & 0xFFFFFFFF

    def recv_packet(self) -> bytes:
        if self._dec:
            first = self._dec.update(self._read_exact(16))
            (length,) = struct.unpack_from(">I", first)
            rest = self._dec.update(self._read_exact(length + 4 - 16))
            pkt = first + rest
            mac = self._read_exact(32)
            want = hmac_mod.new(
                self._mac_in, struct.pack(">I", self._seq_in) + pkt,
                hashlib.sha256).digest()
            if not hmac_mod.compare_digest(mac, want):
                raise ConnectionError("ssh: bad packet MAC")
        else:
            head = self._read_exact(4)
            (length,) = struct.unpack(">I", head)
            pkt = head + self._read_exact(length)
        padlen = pkt[4]
        payload = pkt[5:len(pkt) - padlen]
        self._seq_in = (self._seq_in + 1) & 0xFFFFFFFF
        return payload

    def recv_msg(self, *expect: int) -> bytes:
        """Next packet whose type is in `expect`, transparently
        swallowing IGNORE/DEBUG/UNIMPLEMENTED/WINDOW_ADJUST noise."""
        while True:
            p = self.recv_packet()
            t = p[0]
            if t in (MSG_IGNORE, MSG_DEBUG, MSG_UNIMPLEMENTED,
                     MSG_CHANNEL_WINDOW_ADJUST, MSG_CHANNEL_EOF):
                continue
            if t == MSG_DISCONNECT:
                r = Reader(p, 1)
                r.uint32()
                raise ConnectionError(
                    f"ssh disconnect: {r.string().decode(errors='replace')}")
            if t == MSG_GLOBAL_REQUEST:
                r = Reader(p, 1)
                r.string()
                if r.boolean():  # want-reply
                    self.send_packet(bytes([MSG_REQUEST_FAILURE]))
                continue
            if expect and t not in expect:
                raise ConnectionError(f"ssh: unexpected message {t}, "
                                      f"wanted {expect}")
            return p

    def _activate(self, shared_mp: bytes, h: bytes, client_side: bool):
        from cryptography.hazmat.primitives.ciphers import (
            Cipher, algorithms, modes)

        if self.session_id is None:
            self.session_id = h
        sid = self.session_id

        def d(letter: bytes, n: int) -> bytes:
            return _derive(shared_mp, h, letter, sid, n)

        iv_c2s, iv_s2c = d(b"A", 16), d(b"B", 16)
        key_c2s, key_s2c = d(b"C", 16), d(b"D", 16)
        mac_c2s, mac_s2c = d(b"E", 32), d(b"F", 32)
        if client_side:
            out_iv, out_key, self._mac_out = iv_c2s, key_c2s, mac_c2s
            in_iv, in_key, self._mac_in = iv_s2c, key_s2c, mac_s2c
        else:
            out_iv, out_key, self._mac_out = iv_s2c, key_s2c, mac_s2c
            in_iv, in_key, self._mac_in = iv_c2s, key_c2s, mac_c2s
        self._enc = Cipher(algorithms.AES(out_key),
                           modes.CTR(out_iv)).encryptor()
        self._dec = Cipher(algorithms.AES(in_key),
                           modes.CTR(in_iv)).decryptor()

    # -- client-side kex + auth --
    def client_kex(self, peer_version: bytes) -> None:
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PublicKey)
        from cryptography.hazmat.primitives.asymmetric.x25519 import (
            X25519PrivateKey, X25519PublicKey)

        i_c = _kexinit_payload()
        self.send_packet(i_c)
        i_s = self.recv_msg(MSG_KEXINIT)
        r = Reader(i_s, 17)  # skip type + cookie
        kex_names = r.string().split(b",")
        host_names = r.string().split(b",")
        if KEX_ALG not in kex_names or HOSTKEY_ALG not in host_names:
            raise ConnectionError("ssh: no common kex/hostkey algorithm")

        eph = X25519PrivateKey.generate()
        q_c = eph.public_key().public_bytes_raw()
        self.send_packet(bytes([MSG_KEX_ECDH_INIT]) + sstr(q_c))
        rep = Reader(self.recv_msg(MSG_KEX_ECDH_REPLY), 1)
        k_s = rep.string()
        q_s = rep.string()
        sig_blob = rep.string()
        shared = eph.exchange(X25519PublicKey.from_public_bytes(q_s))
        k = int.from_bytes(shared, "big")
        shared_mp = mpint(k)
        h = hashlib.sha256(
            sstr(VERSION) + sstr(peer_version) + sstr(i_c) + sstr(i_s)
            + sstr(k_s) + sstr(q_c) + sstr(q_s) + shared_mp).digest()
        # verify the server's Ed25519 signature over H
        kr = Reader(k_s)
        if kr.string() != HOSTKEY_ALG:
            raise ConnectionError("ssh: unexpected host key type")
        pub = Ed25519PublicKey.from_public_bytes(kr.string())
        sr = Reader(sig_blob)
        if sr.string() != HOSTKEY_ALG:
            raise ConnectionError("ssh: unexpected signature type")
        pub.verify(sr.string(), h)  # raises InvalidSignature on forgery

        self.send_packet(bytes([MSG_NEWKEYS]))
        self.recv_msg(MSG_NEWKEYS)
        self._activate(shared_mp, h, client_side=True)

    def client_auth_password(self, user: str, password: str) -> None:
        self.send_packet(bytes([MSG_SERVICE_REQUEST])
                         + sstr(b"ssh-userauth"))
        self.recv_msg(MSG_SERVICE_ACCEPT)
        self.send_packet(
            bytes([MSG_USERAUTH_REQUEST]) + sstr(user)
            + sstr(b"ssh-connection") + sstr(b"password") + b"\x00"
            + sstr(password))
        p = self.recv_msg(MSG_USERAUTH_SUCCESS, MSG_USERAUTH_FAILURE)
        if p[0] != MSG_USERAUTH_SUCCESS:
            raise PermissionError("ssh: password authentication failed")

    # -- server-side kex + auth --
    def server_kex(self, peer_version: bytes, host_key) -> None:
        """host_key: cryptography Ed25519PrivateKey."""
        from cryptography.hazmat.primitives.asymmetric.x25519 import (
            X25519PrivateKey, X25519PublicKey)

        i_s = _kexinit_payload()
        self.send_packet(i_s)
        i_c = self.recv_msg(MSG_KEXINIT)
        init = Reader(self.recv_msg(MSG_KEX_ECDH_INIT), 1)
        q_c = init.string()
        eph = X25519PrivateKey.generate()
        q_s = eph.public_key().public_bytes_raw()
        shared = eph.exchange(X25519PublicKey.from_public_bytes(q_c))
        shared_mp = mpint(int.from_bytes(shared, "big"))
        k_s = sstr(HOSTKEY_ALG) + sstr(
            host_key.public_key().public_bytes_raw())
        h = hashlib.sha256(
            sstr(peer_version) + sstr(VERSION) + sstr(i_c) + sstr(i_s)
            + sstr(k_s) + sstr(q_c) + sstr(q_s) + shared_mp).digest()
        sig = sstr(HOSTKEY_ALG) + sstr(host_key.sign(h))
        self.send_packet(bytes([MSG_KEX_ECDH_REPLY]) + sstr(k_s)
                         + sstr(q_s) + sstr(sig))
        self.send_packet(bytes([MSG_NEWKEYS]))
        self.recv_msg(MSG_NEWKEYS)
        self._activate(shared_mp, h, client_side=False)

    def server_auth(self, check) -> str:
        """Serve ssh-userauth; `check(user, password) -> bool`.
        Returns the authenticated username."""
        p = Reader(self.recv_msg(MSG_SERVICE_REQUEST), 1)
        svc = p.string()
        self.send_packet(bytes([MSG_SERVICE_ACCEPT]) + sstr(svc))
        while True:
            r = Reader(self.recv_msg(MSG_USERAUTH_REQUEST), 1)
            user = r.string().decode()
            r.string()  # service
            method = r.string()
            if method == b"password":
                r.boolean()
                if check(user, r.string().decode()):
                    self.send_packet(bytes([MSG_USERAUTH_SUCCESS]))
                    return user
            self.send_packet(bytes([MSG_USERAUTH_FAILURE])
                             + sstr(b"password") + b"\x00")


# -- SFTP v3 (draft-ietf-secsh-filexfer-02) ---------------------------------

FXP_INIT = 1
FXP_VERSION = 2
FXP_OPEN = 3
FXP_CLOSE = 4
FXP_READ = 5
FXP_WRITE = 6
FXP_LSTAT = 7
FXP_OPENDIR = 11
FXP_READDIR = 12
FXP_REMOVE = 13
FXP_MKDIR = 14
FXP_RMDIR = 15
FXP_REALPATH = 16
FXP_STAT = 17
FXP_RENAME = 18
FXP_STATUS = 101
FXP_HANDLE = 102
FXP_DATA = 103
FXP_NAME = 104
FXP_ATTRS = 105

FX_OK = 0
FX_EOF = 1
FX_NO_SUCH_FILE = 2
FX_FAILURE = 4

FXF_READ = 0x01
FXF_WRITE = 0x02
FXF_CREAT = 0x08
FXF_TRUNC = 0x10

ATTR_SIZE = 0x01
ATTR_PERMISSIONS = 0x04


def encode_attrs(size: int | None = None,
                 permissions: int | None = None) -> bytes:
    flags = (ATTR_SIZE if size is not None else 0) \
        | (ATTR_PERMISSIONS if permissions is not None else 0)
    out = struct.pack(">I", flags)
    if size is not None:
        out += struct.pack(">Q", size)
    if permissions is not None:
        out += struct.pack(">I", permissions)
    return out


def decode_attrs(r: Reader) -> dict:
    flags = r.uint32()
    out: dict = {}
    if flags & ATTR_SIZE:
        out["size"] = r.uint64()
    if flags & 0x02:  # UIDGID
        r.uint32()
        r.uint32()
    if flags & ATTR_PERMISSIONS:
        out["permissions"] = r.uint32()
    if flags & 0x08:  # ACMODTIME
        r.uint32()
        r.uint32()
    return out


class SftpClient:
    """SFTP v3 over an authenticated SshTransport channel."""

    def __init__(self, tr: SshTransport):
        self.tr = tr
        self._chan_buf = b""
        self._req = 0
        # open the session channel + sftp subsystem (RFC 4254)
        self.local_id = 0
        tr.send_packet(bytes([MSG_CHANNEL_OPEN]) + sstr(b"session")
                       + struct.pack(">III", self.local_id, 1 << 30,
                                     1 << 20))
        conf = Reader(tr.recv_msg(MSG_CHANNEL_OPEN_CONFIRMATION,
                                  MSG_CHANNEL_OPEN_FAILURE), 1)
        if conf.data[0] == MSG_CHANNEL_OPEN_FAILURE:
            raise ConnectionError("ssh: channel open failed")
        conf.uint32()                  # recipient (ours)
        self.remote_id = conf.uint32()
        tr.send_packet(bytes([MSG_CHANNEL_REQUEST])
                       + struct.pack(">I", self.remote_id)
                       + sstr(b"subsystem") + b"\x01" + sstr(b"sftp"))
        p = tr.recv_msg(MSG_CHANNEL_SUCCESS, MSG_CHANNEL_FAILURE)
        if p[0] != MSG_CHANNEL_SUCCESS:
            raise ConnectionError("ssh: sftp subsystem refused")
        self._send_raw(struct.pack(">IB", 5, FXP_INIT)
                       + struct.pack(">I", 3))
        t, body = self._recv_sftp()
        if t != FXP_VERSION:
            raise ConnectionError("sftp: bad INIT response")

    # -- channel-framed sftp packets --
    def _send_raw(self, data: bytes) -> None:
        self.tr.send_packet(bytes([MSG_CHANNEL_DATA])
                            + struct.pack(">I", self.remote_id)
                            + sstr(data))

    def _chan_read(self, n: int) -> bytes:
        while len(self._chan_buf) < n:
            p = self.tr.recv_msg(MSG_CHANNEL_DATA)
            r = Reader(p, 1)
            r.uint32()
            self._chan_buf += r.string()
        out = self._chan_buf[:n]
        self._chan_buf = self._chan_buf[n:]
        return out

    def _recv_sftp(self) -> tuple[int, bytes]:
        (ln,) = struct.unpack(">I", self._chan_read(4))
        body = self._chan_read(ln)
        return body[0], body[1:]

    def _request(self, t: int, payload: bytes) -> tuple[int, Reader]:
        self._req += 1
        rid = self._req
        data = struct.pack(">B I", t, rid) + payload
        self._send_raw(struct.pack(">I", len(data)) + data)
        rt, body = self._recv_sftp()
        r = Reader(body)
        got = r.uint32()
        if got != rid:
            raise ConnectionError("sftp: response id mismatch")
        return rt, r

    @staticmethod
    def _check_status(rt: int, r: Reader, op: str,
                      ok=(FX_OK,)) -> int:
        if rt != FXP_STATUS:
            raise ConnectionError(f"sftp {op}: unexpected reply {rt}")
        code = r.uint32()
        if code not in ok:
            msg = r.string().decode(errors="replace")
            if code == FX_NO_SUCH_FILE:
                raise FileNotFoundError(f"sftp {op}: {msg}")
            raise OSError(f"sftp {op}: status {code} {msg}")
        return code

    # -- operations --
    def stat(self, path: str) -> dict:
        rt, r = self._request(FXP_STAT, sstr(path))
        if rt == FXP_ATTRS:
            return decode_attrs(r)
        self._check_status(rt, r, "stat")  # raises
        raise ConnectionError("sftp stat: no attrs")

    def listdir(self, path: str) -> list[tuple[str, dict]]:
        rt, r = self._request(FXP_OPENDIR, sstr(path))
        if rt != FXP_HANDLE:
            self._check_status(rt, r, "opendir")
        handle = r.string()
        out: list[tuple[str, dict]] = []
        while True:
            rt, r = self._request(FXP_READDIR, sstr(handle))
            if rt == FXP_STATUS:
                code = r.uint32()
                if code == FX_EOF:
                    break
                raise OSError(f"sftp readdir: status {code}")
            n = r.uint32()
            for _ in range(n):
                name = r.string().decode()
                r.string()  # longname
                attrs = decode_attrs(r)
                if name not in (".", ".."):
                    out.append((name, attrs))
        rt, r = self._request(FXP_CLOSE, sstr(handle))
        self._check_status(rt, r, "close")
        return out

    def read_file(self, path: str, chunk: int = 32768) -> bytes:
        rt, r = self._request(
            FXP_OPEN, sstr(path) + struct.pack(">I", FXF_READ)
            + encode_attrs())
        if rt != FXP_HANDLE:
            self._check_status(rt, r, "open")
        handle = r.string()
        data = b""
        off = 0
        while True:
            rt, r = self._request(
                FXP_READ, sstr(handle) + struct.pack(">QI", off, chunk))
            if rt == FXP_STATUS:
                self._check_status(rt, r, "read", ok=(FX_EOF,))
                break
            blob = r.string()
            data += blob
            off += len(blob)
        rt, r = self._request(FXP_CLOSE, sstr(handle))
        self._check_status(rt, r, "close")
        return data

    def write_file(self, path: str, data: bytes,
                   chunk: int = 32768) -> None:
        rt, r = self._request(
            FXP_OPEN, sstr(path)
            + struct.pack(">I", FXF_WRITE | FXF_CREAT | FXF_TRUNC)
            + encode_attrs())
        if rt != FXP_HANDLE:
            self._check_status(rt, r, "open")
        handle = r.string()
        for off in range(0, len(data), chunk) or [0]:
            rt, r = self._request(
                FXP_WRITE, sstr(handle) + struct.pack(">Q", off)
                + sstr(data[off:off + chunk]))
            self._check_status(rt, r, "write")
        rt, r = self._request(FXP_CLOSE, sstr(handle))
        self._check_status(rt, r, "close")

    def mkdir(self, path: str) -> None:
        rt, r = self._request(FXP_MKDIR, sstr(path) + encode_attrs())
        self._check_status(rt, r, "mkdir", ok=(FX_OK, FX_FAILURE))

    def mkdirs(self, path: str) -> None:
        parts = [p for p in path.split("/") if p]
        cur = "/" if path.startswith("/") else ""
        for p in parts:
            cur = (cur + "/" if cur and not cur.endswith("/") else cur) + p
            try:
                self.stat(cur)
            except (FileNotFoundError, OSError):
                self.mkdir(cur)

    def remove(self, path: str) -> None:
        rt, r = self._request(FXP_REMOVE, sstr(path))
        self._check_status(rt, r, "remove")

    def rename(self, old: str, new: str) -> None:
        rt, r = self._request(FXP_RENAME, sstr(old) + sstr(new))
        self._check_status(rt, r, "rename")

    def close(self) -> None:
        try:
            self.tr.send_packet(bytes([MSG_CHANNEL_CLOSE])
                                + struct.pack(">I", self.remote_id))
            self.tr.sock.close()
        except OSError:
            pass


def connect_sftp(host: str, port: int, user: str,
                 password: str, timeout: float = 30.0) -> SftpClient:
    sock = socket.create_connection((host, port), timeout=timeout)
    tr = SshTransport(sock)
    peer = tr.exchange_versions()
    tr.client_kex(peer)
    tr.client_auth_password(user, password)
    return SftpClient(tr)


__all__ = ["SshTransport", "SftpClient", "connect_sftp", "Reader",
           "sstr", "mpint", "encode_attrs", "decode_attrs", "VERSION"]
