"""Mini Kerberos KDC (RFC 4120 TCP transport): AS exchange with
PA-ENC-TIMESTAMP preauth verification and TGS exchange (PA-TGS-REQ
AP-REQ decode, TGT decrypt, authenticator check) over the
aes256-cts-hmac-sha1-96 stack in seatunnel_spark.krb5 — stands in for
the `kerberos:88` container the reference's kerberos e2e confs point
at. Principals register with passwords (keys derive with the standard
salt) or raw keys; issued tickets carry fresh session keys."""

from __future__ import annotations

import secrets
import socket
import struct
import threading
import time

from seatunnel_spark import krb5 as K

KDC_ERR_PREAUTH_REQUIRED = 25
KDC_ERR_PREAUTH_FAILED = 24
KDC_ERR_C_PRINCIPAL_UNKNOWN = 6
KDC_ERR_S_PRINCIPAL_UNKNOWN = 7


class MiniKdc:
    def __init__(self, realm: str = "EXAMPLE.COM"):
        self.realm = realm
        self.keys: dict[str, bytes] = {}
        self.krbtgt = secrets.token_bytes(32)
        self.keys[f"krbtgt/{realm}@{realm}"] = self.krbtgt
        self.requests: list[str] = []
        self.preauth_failures = 0

    def add_principal(self, principal: str, password: str) -> bytes:
        key = K.string_to_key(password, K.principal_salt(principal))
        self.keys[principal] = key
        return key

    def add_key(self, principal: str, key: bytes) -> None:
        self.keys[principal] = key

    def _key_of(self, comps: list[str]) -> bytes | None:
        return self.keys.get("/".join(comps) + "@" + self.realm)

    # -- replies -------------------------------------------------------
    def _error(self, code: int, text: str = "") -> bytes:
        items = [K.der_ctx(0, K.der_int(5)),
                 K.der_ctx(1, K.der_int(30)),
                 K.der_ctx(4, K.der_gentime()),
                 K.der_ctx(5, K.der_int(0)),
                 K.der_ctx(6, K.der_int(code)),
                 K.der_ctx(9, K.der_gstring(self.realm)),
                 K.der_ctx(10, K.enc_principal(["krbtgt", self.realm],
                                               K.NT_SRV_INST))]
        if text:
            items.append(K.der_ctx(11, K.der_gstring(text)))
        return K.der_app(30, K.der_seq(*items))

    def _ticket(self, sname: list[str], service_key: bytes,
                session: bytes, cname: list[str]) -> bytes:
        enc_part = K.der_app(3, K.der_seq(
            K.der_ctx(0, K.der_bitstring32(0x40000000)),
            K.der_ctx(1, K.enc_key(K.ETYPE_AES256, session)),
            K.der_ctx(2, K.der_gstring(self.realm)),
            K.der_ctx(3, K.enc_principal(cname)),
            K.der_ctx(4, K.der_seq(K.der_ctx(0, K.der_int(0)),
                                   K.der_ctx(1, K.der_octets(b"")))),
            K.der_ctx(5, K.der_gentime()),
            K.der_ctx(7, K.der_gentime(time.time() + 86400))))
        return K.enc_ticket(self.realm, sname,
                            K.krb_encrypt(service_key, 2, enc_part))

    def _kdc_rep(self, app: int, msg_type: int, cname: list[str],
                 ticket: bytes, session: bytes, rep_key: bytes,
                 usage: int, nonce: int, sname: list[str]) -> bytes:
        enc_part = K.der_app(25 if app == 11 else 26, K.der_seq(
            K.der_ctx(0, K.enc_key(K.ETYPE_AES256, session)),
            K.der_ctx(1, K.der_seq(K.der_seq(
                K.der_ctx(0, K.der_int(0)),
                K.der_ctx(1, K.der_gentime())))),
            K.der_ctx(2, K.der_int(nonce)),
            K.der_ctx(4, K.der_bitstring32(0x40000000)),
            K.der_ctx(5, K.der_gentime()),
            K.der_ctx(7, K.der_gentime(time.time() + 86400)),
            K.der_ctx(9, K.der_gstring(self.realm)),
            K.der_ctx(10, K.enc_principal(sname, K.NT_SRV_INST))))
        return K.der_app(app, K.der_seq(
            K.der_ctx(0, K.der_int(5)),
            K.der_ctx(1, K.der_int(msg_type)),
            K.der_ctx(3, K.der_gstring(self.realm)),
            K.der_ctx(4, K.enc_principal(cname)),
            K.der_ctx(5, ticket),
            K.der_ctx(6, K.enc_encrypted_data(
                K.ETYPE_AES256,
                K.krb_encrypt(rep_key, usage, enc_part)))))

    # -- request handling ----------------------------------------------
    def handle(self, raw: bytes) -> bytes:
        tag, inner = K.der_unwrap(raw)
        app = tag & 0x1F
        _, seq = K.der_unwrap(inner)
        f = seq.fields()
        padata = {}
        if 3 in f:
            pa = f[3]
            _, pseq = K.der_unwrap(DerBytes(pa))
            while not pseq.at_end():
                _, entry = pseq.read_tlv()
                ef = entry.fields()
                ptype = K.DerView(ef[1].bytes_()).read_int()
                padata[ptype] = K.DerView(ef[2].bytes_()).read_octets()
        _, body = K.der_unwrap(K.DerView(f[4].bytes_()))
        bf = body.fields()
        cname = K.dec_principal(K.DerView(bf[1].bytes_())) \
            if 1 in bf else None
        sname = K.dec_principal(K.DerView(bf[3].bytes_()))
        nonce = K.DerView(bf[7].bytes_()).read_int()

        if app == 10:  # AS-REQ
            self.requests.append(f"AS {cname} -> {sname}")
            ckey = self._key_of(cname or [])
            if ckey is None:
                return self._error(KDC_ERR_C_PRINCIPAL_UNKNOWN,
                                   "/".join(cname or []))
            if 2 not in padata:
                return self._error(KDC_ERR_PREAUTH_REQUIRED)
            try:
                _et, cipher = K.dec_encrypted_data(
                    K.DerView(padata[2]))
                ts_plain = K.krb_decrypt(ckey, 1, cipher)
                _, tseq = K.der_unwrap(ts_plain)
                tf = tseq.fields()
                ts = tf[0].bytes_()  # GeneralizedTime TLV
                _, tv = K.der_unwrap(K.DerView(ts))
                when = time.strptime(tv.bytes_().decode(),
                                     "%Y%m%d%H%M%SZ")
                import calendar

                if abs(calendar.timegm(when) - time.time()) > 300:
                    raise ValueError("clock skew")
            except Exception:  # noqa: BLE001
                self.preauth_failures += 1
                return self._error(KDC_ERR_PREAUTH_FAILED)
            session = secrets.token_bytes(32)
            ticket = self._ticket(["krbtgt", self.realm], self.krbtgt,
                                  session, cname)
            return self._kdc_rep(11, 11, cname, ticket, session, ckey,
                                 3, nonce, ["krbtgt", self.realm])

        if app == 12:  # TGS-REQ
            self.requests.append(f"TGS -> {sname}")
            if 1 not in padata:
                return self._error(KDC_ERR_PREAUTH_REQUIRED)
            ap_tag, ap_inner = K.der_unwrap(padata[1], 0x6E)
            _, ap_seq = K.der_unwrap(ap_inner)
            af = ap_seq.fields()
            tgt = K.dec_ticket(af[3].bytes_())
            tgt_plain = K.krb_decrypt(self.krbtgt, 2, tgt.cipher)
            _, tp = K.der_unwrap(tgt_plain, 0x63)
            _, tpseq = K.der_unwrap(tp)
            tpf = tpseq.fields()
            _kt, tgt_session = K.dec_key(K.DerView(tpf[1].bytes_()))
            cname = K.dec_principal(K.DerView(tpf[3].bytes_()))
            _et, auth_cipher = K.dec_encrypted_data(
                K.DerView(af[4].bytes_()))
            K.krb_decrypt(tgt_session, 7, auth_cipher)  # verify
            skey = self._key_of(sname)
            if skey is None:
                return self._error(KDC_ERR_S_PRINCIPAL_UNKNOWN,
                                   "/".join(sname))
            session = secrets.token_bytes(32)
            ticket = self._ticket(sname, skey, session, cname)
            return self._kdc_rep(13, 13, cname, ticket, session,
                                 tgt_session, 8, nonce, sname)

        return self._error(KDC_ERR_PREAUTH_FAILED, "bad message")


def DerBytes(v) -> "K.DerView":  # noqa: N802 - tiny adapter
    return K.DerView(v.bytes_() if hasattr(v, "bytes_") else v)


def _handle_conn(conn: socket.socket, kdc: MiniKdc) -> None:
    try:
        buf = b""
        while len(buf) < 4:
            chunk = conn.recv(4 - len(buf))
            if not chunk:
                return
            buf += chunk
        (n,) = struct.unpack(">I", buf)
        req = b""
        while len(req) < n:
            chunk = conn.recv(n - len(req))
            if not chunk:
                return
            req += chunk
        try:
            rep = kdc.handle(req)
        except Exception:  # noqa: BLE001 - malformed request
            rep = kdc._error(KDC_ERR_PREAUTH_FAILED, "malformed")
        conn.sendall(struct.pack(">I", len(rep)) + rep)
    except OSError:
        pass
    finally:
        try:
            conn.close()
        except OSError:
            pass


def start_mini_kdc(realm: str = "EXAMPLE.COM", port: int = 0):
    kdc = MiniKdc(realm)
    sock = socket.create_server(("127.0.0.1", port))
    sock.settimeout(0.5)
    stopping = threading.Event()

    def loop():
        while not stopping.is_set():
            try:
                conn, _ = sock.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            threading.Thread(target=_handle_conn, args=(conn, kdc),
                             daemon=True).start()

    threading.Thread(target=loop, daemon=True).start()

    def stop():
        stopping.set()
        try:
            sock.close()
        except OSError:
            pass

    return kdc, sock.getsockname()[1], stop


def write_krb5_conf(path: str, realm: str, kdc_addr: str) -> None:
    with open(path, "w") as f:
        f.write(f"""[libdefaults]
    default_realm = {realm}

[realms]
    {realm} = {{
        kdc = {kdc_addr}
    }}
""")


__all__ = ["MiniKdc", "start_mini_kdc", "write_krb5_conf"]
