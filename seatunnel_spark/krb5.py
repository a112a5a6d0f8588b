"""Kerberos 5 client stack (stdlib + cryptography) — RFC 4120/3961/
3962/4121/4752 subset.

From-scratch, public-spec implementation (same build approach as
ssh_wire.py / tds_wire.py):

* DER codec — the minimal ASN.1 subset Kerberos messages use
  (SEQUENCE, context/application tags, INTEGER, OCTET STRING,
  GeneralString, GeneralizedTime, BIT STRING).
* aes256-cts-hmac-sha1-96 (etype 18, RFC 3962): n-fold, DK key
  derivation, CBC-CTS with confounder, HMAC-SHA1-96, PBKDF2
  string-to-key (4096 iterations, salt = realm|principal).
* MIT keytab v2 read/write (the de-facto public format) and a
  krb5.conf parser (realm -> kdc address).
* AS exchange with PA-ENC-TIMESTAMP preauth -> TGT; TGS exchange
  (PA-TGS-REQ AP-REQ) -> service ticket; AP-REQ/AP-REP.
* GSS-API krb5 mechanism tokens (RFC 4121): InitialContextToken
  (0x01 0x00 AP-REQ), AP-REP (0x02 0x00), Wrap tokens (0x05 0x04,
  sealed and integrity-only) — enough for SASL GSSAPI (RFC 4752)
  security-layer negotiation as Kafka/Hive use it.

The reference delegates all of this to JAAS/UGI
(Krb5LoginModule + SASL GSSAPI in the kafka client;
UserGroupInformation.loginUserFromKeytab in HiveMetaStoreProxy) —
here it is the stdlib analog driving the same wire bytes.
"""

from __future__ import annotations

import os
import secrets
import struct
import time

# ======================================================================
# DER
# ======================================================================


def der(tag: int, content: bytes) -> bytes:
    n = len(content)
    if n < 0x80:
        ln = bytes([n])
    elif n < 0x100:
        ln = b"\x81" + bytes([n])
    elif n < 0x10000:
        ln = b"\x82" + struct.pack(">H", n)
    else:
        ln = b"\x84" + struct.pack(">I", n)
    return bytes([tag]) + ln + content


def der_seq(*items: bytes) -> bytes:
    return der(0x30, b"".join(items))


def der_ctx(n: int, content: bytes) -> bytes:
    """[n] EXPLICIT wrapper."""
    return der(0xA0 | n, content)


def der_app(n: int, content: bytes) -> bytes:
    """APPLICATION n constructed wrapper."""
    return der(0x60 | n, content)


def der_int(v: int) -> bytes:
    if v == 0:
        return der(0x02, b"\x00")
    out = b""
    x = v
    while x not in (0, -1):
        out = bytes([x & 0xFF]) + out
        x >>= 8
    if v > 0 and (not out or out[0] & 0x80):
        out = b"\x00" + out
    if v < 0 and (not out or not out[0] & 0x80):
        out = b"\xff" + out
    return der(0x02, out or b"\x00")


def der_octets(b: bytes) -> bytes:
    return der(0x04, b)


def der_gstring(s: str) -> bytes:
    return der(0x1B, s.encode())


def der_gentime(t: float | None = None) -> bytes:
    tm = time.gmtime(t if t is not None else time.time())
    return der(0x18, time.strftime("%Y%m%d%H%M%SZ", tm).encode())


def der_bitstring32(bits: int) -> bytes:
    return der(0x03, b"\x00" + struct.pack(">I", bits))


class DerView:
    """Positional DER reader over a buffer slice."""

    def __init__(self, buf: bytes, i: int = 0, end: int | None = None):
        self.buf = buf
        self.i = i
        self.end = len(buf) if end is None else end

    def at_end(self) -> bool:
        return self.i >= self.end

    def peek_tag(self) -> int:
        return self.buf[self.i]

    def read_tlv(self) -> tuple[int, "DerView"]:
        tag = self.buf[self.i]
        i = self.i + 1
        first = self.buf[i]
        i += 1
        if first < 0x80:
            n = first
        else:
            nb = first & 0x7F
            n = int.from_bytes(self.buf[i:i + nb], "big")
            i += nb
        inner = DerView(self.buf, i, i + n)
        self.i = i + n
        return tag, inner

    def bytes_(self) -> bytes:
        return bytes(self.buf[self.i:self.end])

    def read_int(self) -> int:
        tag, v = self.read_tlv()
        assert tag == 0x02, f"expected INTEGER, got {tag:#x}"
        return int.from_bytes(v.bytes_(), "big", signed=True)

    def read_octets(self) -> bytes:
        tag, v = self.read_tlv()
        assert tag == 0x04, f"expected OCTET STRING, got {tag:#x}"
        return v.bytes_()

    def read_gstring(self) -> str:
        tag, v = self.read_tlv()
        return v.bytes_().decode()

    def fields(self) -> dict[int, "DerView"]:
        """Context-tagged fields of a SEQUENCE body -> {n: inner}."""
        out = {}
        while not self.at_end():
            tag, inner = self.read_tlv()
            out[tag & 0x1F] = inner
        return out


def der_unwrap(view_or_bytes, expect: int | None = None):
    v = DerView(view_or_bytes) if isinstance(view_or_bytes, (bytes,
                                                             bytearray)) \
        else view_or_bytes
    tag, inner = v.read_tlv()
    if expect is not None and tag != expect:
        raise ValueError(f"DER tag {tag:#x} != expected {expect:#x}")
    return tag, inner


# ======================================================================
# RFC 3961/3962 crypto: aes256-cts-hmac-sha1-96
# ======================================================================

ETYPE_AES256 = 18
CKSUM_HMAC_SHA1_AES256 = 16


def _nfold(data: bytes, nbytes: int) -> bytes:
    """RFC 3961 n-fold: repeat 13-bit-rotated copies, ones-complement
    add in nbytes-size chunks."""
    def rot13(b: bytes, step: int) -> bytes:
        nbits = len(b) * 8
        shift = (13 * step) % nbits
        as_int = int.from_bytes(b, "big")
        rotated = ((as_int >> shift) | (as_int << (nbits - shift))) \
            & ((1 << nbits) - 1)
        return rotated.to_bytes(len(b), "big")

    import math

    lcm = len(data) * nbytes // math.gcd(len(data), nbytes)
    big = b"".join(rot13(data, i) for i in range(lcm // len(data)))
    result = 0
    for i in range(0, lcm, nbytes):
        result += int.from_bytes(big[i:i + nbytes], "big")
    # ones-complement carry folding
    mask = (1 << (nbytes * 8)) - 1
    while result >> (nbytes * 8):
        result = (result & mask) + (result >> (nbytes * 8))
    return result.to_bytes(nbytes, "big")


def _aes_ecb(key: bytes, block: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()  # noqa: S305
    return enc.update(block) + enc.finalize()


def dk(key: bytes, constant: bytes) -> bytes:
    """RFC 3961 DK: DR via CBC-chained AES of n-fold(constant)."""
    if len(constant) != 16:
        constant = _nfold(constant, 16)
    out = b""
    block = constant
    while len(out) < len(key):
        block = _aes_ecb(key, block)
        out += block
    return out[:len(key)]


def _usage_keys(key: bytes, usage: int) -> tuple[bytes, bytes, bytes]:
    u = struct.pack(">I", usage)
    ke = dk(key, u + b"\xaa")
    ki = dk(key, u + b"\x55")
    kc = dk(key, u + b"\x99")
    return ke, ki, kc


def _cbc_cts_encrypt(key: bytes, data: bytes) -> bytes:
    """AES-CBC with ciphertext stealing (zero IV), RFC 3962 style —
    data is at least one block (the confounder guarantees it)."""
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    if len(data) == 16:
        return _aes_ecb(key, data)
    pad = (-len(data)) % 16
    padded = data + b"\x00" * pad
    enc = Cipher(algorithms.AES(key), modes.CBC(b"\x00" * 16)).encryptor()
    blocks = enc.update(padded) + enc.finalize()
    # CS3: transmit C1..Cn-2, Cn, then Cn-1 truncated to the final
    # partial plaintext length (full Cn-1 when the data is block-aligned)
    head, cn1, cn = blocks[:-32], blocks[-32:-16], blocks[-16:]
    return head + cn + (cn1[:16 - pad] if pad else cn1)


def _cbc_cts_decrypt(key: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    def ecb_dec(block: bytes) -> bytes:
        c = Cipher(algorithms.AES(key), modes.ECB()).decryptor()  # noqa: S305
        return c.update(block) + c.finalize()

    if len(data) == 16:
        return ecb_dec(data)
    tail = len(data) % 16
    if tail == 0:
        # full blocks: last two swapped
        head, cn1, cn = data[:-32], data[-32:-16], data[-16:]
        reordered = head + cn + cn1
        dec = Cipher(algorithms.AES(key),
                     modes.CBC(b"\x00" * 16)).decryptor()
        return dec.update(reordered) + dec.finalize()
    # partial final block: reconstruct the stolen ciphertext
    head, cn1, cpart = data[:-(16 + tail)], data[-(16 + tail):-tail], \
        data[-tail:]
    dn = ecb_dec(cn1)
    cn = cpart + dn[tail:]
    reordered = head + cn + cn1
    dec = Cipher(algorithms.AES(key), modes.CBC(b"\x00" * 16)).decryptor()
    plain = dec.update(reordered) + dec.finalize()
    return plain[:len(data)]


def _hmac_sha1(key: bytes, data: bytes) -> bytes:
    import hashlib
    import hmac as _hmac

    return _hmac.new(key, data, hashlib.sha1).digest()


def krb_encrypt(key: bytes, usage: int, plaintext: bytes) -> bytes:
    ke, ki, _ = _usage_keys(key, usage)
    conf = secrets.token_bytes(16)
    body = conf + plaintext
    c = _cbc_cts_encrypt(ke, body)
    return c + _hmac_sha1(ki, body)[:12]


def krb_decrypt(key: bytes, usage: int, ciphertext: bytes) -> bytes:
    ke, ki, _ = _usage_keys(key, usage)
    c, tag = ciphertext[:-12], ciphertext[-12:]
    body = _cbc_cts_decrypt(ke, c)
    if _hmac_sha1(ki, body)[:12] != tag:
        raise ValueError("krb5: integrity check failed (bad key?)")
    return body[16:]


def krb_checksum(key: bytes, usage: int, data: bytes) -> bytes:
    _, _, kc = _usage_keys(key, usage)
    return _hmac_sha1(kc, data)[:12]


def string_to_key(password: str, salt: str, iterations: int = 4096,
                  keylen: int = 32) -> bytes:
    import hashlib

    tkey = hashlib.pbkdf2_hmac("sha1", password.encode(), salt.encode(),
                               iterations, keylen)
    return dk(tkey, b"kerberos")


# ======================================================================
# principals / krb5.conf / keytab
# ======================================================================

NT_PRINCIPAL = 1
NT_SRV_INST = 2


def parse_principal(p: str) -> tuple[list[str], str]:
    """"kafka/host@REALM" -> (["kafka", "host"], "REALM")."""
    name, _, realm = p.partition("@")
    return name.split("/"), realm


def principal_salt(principal: str) -> str:
    comps, realm = parse_principal(principal)
    return realm + "".join(comps)


def parse_krb5_conf(path: str) -> dict:
    """Minimal krb5.conf: default_realm + realm -> kdc host:port."""
    out: dict = {"realms": {}}
    section = None
    realm = None
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            if line.startswith("["):
                section = line.strip("[]").lower()
                continue
            if section == "libdefaults" and "=" in line:
                k, _, v = line.partition("=")
                if k.strip() == "default_realm":
                    out["default_realm"] = v.strip()
            elif section == "realms":
                if "=" in line and line.rstrip().endswith("{"):
                    realm = line.split("=", 1)[0].strip()
                    out["realms"][realm] = {}
                elif line.startswith("}"):
                    realm = None
                elif realm and "=" in line:
                    k, _, v = line.partition("=")
                    out["realms"][realm][k.strip()] = v.strip()
    return out


def write_keytab(path: str, entries: list[tuple[str, int, bytes]]) -> None:
    """MIT keytab v2: entries = [(principal, kvno, key_bytes)] (etype
    aes256)."""
    out = b"\x05\x02"
    for principal, kvno, keyb in entries:
        comps, realm = parse_principal(principal)
        body = struct.pack(">H", len(comps))
        body += struct.pack(">H", len(realm)) + realm.encode()
        for c in comps:
            body += struct.pack(">H", len(c)) + c.encode()
        body += struct.pack(">I", NT_PRINCIPAL)
        body += struct.pack(">I", int(time.time()))
        body += bytes([kvno & 0xFF])
        body += struct.pack(">H", ETYPE_AES256)
        body += struct.pack(">H", len(keyb)) + keyb
        out += struct.pack(">i", len(body)) + body
    with open(path, "wb") as f:
        f.write(out)


def read_keytab(path: str) -> list[tuple[str, int, int, bytes]]:
    """-> [(principal, kvno, etype, key)]."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"\x05\x02":
        raise ValueError("not a keytab v2 file")
    i = 2
    out = []
    while i < len(data):
        (size,) = struct.unpack_from(">i", data, i)
        i += 4
        if size <= 0:
            i += -size
            continue
        end = i + size
        (ncomp,) = struct.unpack_from(">H", data, i)
        i += 2
        (rl,) = struct.unpack_from(">H", data, i)
        i += 2
        realm = data[i:i + rl].decode()
        i += rl
        comps = []
        for _ in range(ncomp):
            (cl,) = struct.unpack_from(">H", data, i)
            i += 2
            comps.append(data[i:i + cl].decode())
            i += cl
        i += 4 + 4  # name-type, timestamp
        kvno = data[i]
        i += 1
        (etype,) = struct.unpack_from(">H", data, i)
        i += 2
        (kl,) = struct.unpack_from(">H", data, i)
        i += 2
        key = data[i:i + kl]
        out.append(("/".join(comps) + "@" + realm, kvno, etype, key))
        i = end
    return out


def keytab_key(path: str, principal: str) -> bytes:
    for p, _kvno, etype, key in read_keytab(path):
        if p == principal and etype == ETYPE_AES256:
            return key
    raise ValueError(f"keytab {path}: no aes256 key for {principal}")


# ======================================================================
# KRB structures
# ======================================================================


def enc_principal(comps: list[str], name_type: int = NT_PRINCIPAL) -> bytes:
    return der_seq(
        der_ctx(0, der_int(name_type)),
        der_ctx(1, der_seq(*[der_gstring(c) for c in comps])))


def dec_principal(v: DerView) -> list[str]:
    _, seq = der_unwrap(v)
    f = seq.fields()
    _, names = der_unwrap(f[1])
    out = []
    while not names.at_end():
        out.append(names.read_gstring())
    return out


def enc_encrypted_data(etype: int, cipher: bytes,
                       kvno: int | None = None) -> bytes:
    items = [der_ctx(0, der_int(etype))]
    if kvno is not None:
        items.append(der_ctx(1, der_int(kvno)))
    items.append(der_ctx(2, der_octets(cipher)))
    return der_seq(*items)


def dec_encrypted_data(v: DerView) -> tuple[int, bytes]:
    _, seq = der_unwrap(v)
    f = seq.fields()
    return DerView(f[0].bytes_()).read_int(), \
        DerView(f[2].bytes_()).read_octets()


def enc_key(keytype: int, key: bytes) -> bytes:
    return der_seq(der_ctx(0, der_int(keytype)),
                   der_ctx(1, der_octets(key)))


def dec_key(v: DerView) -> tuple[int, bytes]:
    _, seq = der_unwrap(v)
    f = seq.fields()
    return DerView(f[0].bytes_()).read_int(), \
        DerView(f[1].bytes_()).read_octets()


class Ticket:
    __slots__ = ("realm", "sname", "etype", "cipher", "raw")

    def __init__(self, realm, sname, etype, cipher, raw):
        self.realm = realm
        self.sname = sname
        self.etype = etype
        self.cipher = cipher
        self.raw = raw  # verbatim DER (APPLICATION 1)


def dec_ticket(raw: bytes) -> Ticket:
    tag, inner = der_unwrap(raw, 0x61)
    _, seq = der_unwrap(inner)
    f = seq.fields()
    realm = DerView(f[1].bytes_()).read_gstring()
    sname = dec_principal(DerView(f[2].bytes_()))
    etype, cipher = dec_encrypted_data(DerView(f[3].bytes_()))
    return Ticket(realm, sname, etype, cipher, raw)


def enc_ticket(realm: str, sname: list[str], cipher: bytes,
               kvno: int = 1) -> bytes:
    return der_app(1, der_seq(
        der_ctx(0, der_int(5)),
        der_ctx(1, der_gstring(realm)),
        der_ctx(2, enc_principal(sname, NT_SRV_INST)),
        der_ctx(3, enc_encrypted_data(ETYPE_AES256, cipher, kvno))))


class KrbError(RuntimeError):
    def __init__(self, code: int, text: str = ""):
        super().__init__(f"KRB-ERROR {code}: {text}")
        self.code = code


def _dec_kdc_rep(raw: bytes, app: int, key: bytes, usage: int):
    """-> (session_key, ticket, enc_part_fields)."""
    tag, inner = der_unwrap(raw)
    if tag == 0x7E:  # KRB-ERROR (APPLICATION 30)
        _, seq = der_unwrap(inner)
        f = seq.fields()
        code = DerView(f[6].bytes_()).read_int()
        etext = ""
        if 11 in f:
            etext = DerView(f[11].bytes_()).read_gstring()
        raise KrbError(code, etext)
    if tag != (0x60 | app):
        raise ValueError(f"unexpected KDC reply tag {tag:#x}")
    _, seq = der_unwrap(inner)
    f = seq.fields()
    ticket_raw = f[5].bytes_()
    ticket = dec_ticket(ticket_raw)
    _etype, cipher = dec_encrypted_data(DerView(f[6].bytes_()))
    plain = krb_decrypt(key, usage, cipher)
    ptag, pinner = der_unwrap(plain)
    _, pseq = der_unwrap(pinner)
    pf = pseq.fields()
    _keytype, session = dec_key(DerView(pf[0].bytes_()))
    return session, ticket, pf


def _kdc_req(app: int, msg_type: int, padata: list[bytes],
             cname: list[str] | None, realm: str, sname: list[str],
             nonce: int, etypes: list[int]) -> bytes:
    body_items = [der_ctx(0, der_bitstring32(0x40000000))]  # forwardable
    if cname is not None:
        body_items.append(der_ctx(1, enc_principal(cname)))
    body_items += [
        der_ctx(2, der_gstring(realm)),
        der_ctx(3, enc_principal(sname, NT_SRV_INST)),
        der_ctx(5, der_gentime(time.time() + 8 * 3600)),
        der_ctx(7, der_int(nonce)),
        der_ctx(8, der_seq(*[der_int(e) for e in etypes])),
    ]
    items = [der_ctx(1, der_int(5)), der_ctx(2, der_int(msg_type))]
    if padata:
        items.append(der_ctx(3, der_seq(*padata)))
    items.append(der_ctx(4, der_seq(*body_items)))
    return der_app(app, der_seq(*items))


def _pa_data(patype: int, value: bytes) -> bytes:
    return der_seq(der_ctx(1, der_int(patype)),
                   der_ctx(2, der_octets(value)))


def kdc_exchange(kdc_addr: str, req: bytes, timeout: float = 10.0) -> bytes:
    """RFC 4120 7.2.2 TCP transport: 4-byte length prefix."""
    import socket

    from seatunnel_spark.net import apply_host_aliases

    url = apply_host_aliases(f"tcp://{kdc_addr}")
    hostpart = url.split("://", 1)[-1]
    h, _, p = hostpart.rpartition(":")
    with socket.create_connection((h, int(p or 88)), timeout=timeout) as s:
        s.sendall(struct.pack(">I", len(req)) + req)
        head = b""
        while len(head) < 4:
            head += s.recv(4 - len(head))
        (n,) = struct.unpack(">I", head)
        out = b""
        while len(out) < n:
            chunk = s.recv(n - len(out))
            if not chunk:
                raise ConnectionError("KDC closed connection")
            out += chunk
        return out


def as_exchange(kdc_addr: str, principal: str, key: bytes,
                realm: str | None = None) -> tuple[bytes, Ticket]:
    """AS-REQ with PA-ENC-TIMESTAMP -> (tgt_session_key, tgt)."""
    comps, prealm = parse_principal(principal)
    realm = realm or prealm
    ts = der_seq(der_ctx(0, der_gentime()),
                 der_ctx(1, der_int(0)))
    pa_enc_ts = enc_encrypted_data(
        ETYPE_AES256, krb_encrypt(key, 1, ts))
    nonce = secrets.randbelow(1 << 31)
    req = _kdc_req(10, 10, [_pa_data(2, pa_enc_ts)], comps, realm,
                   ["krbtgt", realm], nonce, [ETYPE_AES256])
    rep = kdc_exchange(kdc_addr, req)
    session, ticket, _pf = _dec_kdc_rep(rep, 11, key, 3)
    return session, ticket


def _authenticator(crealm: str, cname: list[str],
                   cksum: bytes | None = None,
                   subkey: bytes | None = None,
                   seq_number: int | None = None) -> bytes:
    items = [der_ctx(0, der_int(5)),
             der_ctx(1, der_gstring(crealm)),
             der_ctx(2, enc_principal(cname))]
    if cksum is not None:
        # GSS channel-binding checksum rides cksumtype 0x8003
        items.append(der_ctx(3, der_seq(der_ctx(0, der_int(0x8003)),
                                        der_ctx(1, der_octets(cksum)))))
    items += [der_ctx(4, der_int(0)),
              der_ctx(5, der_gentime())]
    if subkey is not None:
        items.append(der_ctx(6, enc_key(ETYPE_AES256, subkey)))
    if seq_number is not None:
        items.append(der_ctx(7, der_int(seq_number)))
    return der_app(2, der_seq(*items))


def build_ap_req(ticket: Ticket, session_key: bytes, principal: str,
                 usage: int = 11, cksum: bytes | None = None,
                 seq_number: int | None = None,
                 mutual: bool = False) -> bytes:
    comps, realm = parse_principal(principal)
    auth = _authenticator(realm, comps, cksum=cksum,
                          seq_number=seq_number)
    options = 0x20000000 if mutual else 0  # mutual-required
    return der_app(14, der_seq(
        der_ctx(0, der_int(5)),
        der_ctx(1, der_int(14)),
        der_ctx(2, der_bitstring32(options)),
        der_ctx(3, ticket.raw),
        der_ctx(4, enc_encrypted_data(
            ETYPE_AES256, krb_encrypt(session_key, usage, auth)))))


def tgs_exchange(kdc_addr: str, tgt: Ticket, tgt_session: bytes,
                 principal: str, service: list[str],
                 realm: str | None = None) -> tuple[bytes, Ticket]:
    """TGS-REQ (PA-TGS-REQ AP-REQ, authenticator usage 7) ->
    (service_session_key, service_ticket)."""
    comps, prealm = parse_principal(principal)
    realm = realm or prealm
    ap_req = build_ap_req(tgt, tgt_session, principal, usage=7)
    nonce = secrets.randbelow(1 << 31)
    req = _kdc_req(12, 12, [_pa_data(1, ap_req)], None, realm, service,
                   nonce, [ETYPE_AES256])
    rep = kdc_exchange(kdc_addr, req)
    session, ticket, _pf = _dec_kdc_rep(rep, 13, tgt_session, 8)
    return session, ticket


def dec_ap_rep(raw: bytes, session_key: bytes) -> dict:
    tag, inner = der_unwrap(raw, 0x6F)  # APPLICATION 15
    _, seq = der_unwrap(inner)
    f = seq.fields()
    _etype, cipher = dec_encrypted_data(DerView(f[2].bytes_()))
    plain = krb_decrypt(session_key, 12, cipher)
    ptag, pinner = der_unwrap(plain, 0x7B)  # EncAPRepPart (APP 27)
    _, pseq = der_unwrap(pinner)
    pf = pseq.fields()
    out = {}
    if 2 in pf:
        _kt, out["subkey"] = dec_key(DerView(pf[2].bytes_()))
    if 3 in pf:
        out["seq_number"] = DerView(pf[3].bytes_()).read_int()
    return out


# ======================================================================
# GSS-API krb5 mech (RFC 4121) + SASL GSSAPI (RFC 4752)
# ======================================================================

GSS_KRB5_OID = bytes.fromhex("06092a864886f712010202")
TOK_AP_REQ = b"\x01\x00"
TOK_AP_REP = b"\x02\x00"
TOK_WRAP = b"\x05\x04"

# RFC 4121 key usages
KG_USAGE_ACCEPTOR_SEAL = 22
KG_USAGE_INITIATOR_SEAL = 24


def gss_initial_token(ap_req: bytes) -> bytes:
    body = GSS_KRB5_OID + TOK_AP_REQ + ap_req
    return der(0x60, body)


def gss_parse_initial(token: bytes) -> bytes:
    """-> the AP-REQ inside an InitialContextToken."""
    tag, inner = der_unwrap(token, 0x60)
    body = inner.bytes_()
    if not body.startswith(GSS_KRB5_OID):
        raise ValueError("not a krb5 GSS token")
    rest = body[len(GSS_KRB5_OID):]
    if rest[:2] != TOK_AP_REQ:
        raise ValueError(f"unexpected GSS token id {rest[:2]!r}")
    return rest[2:]


def gss_ap_rep_token(ap_rep: bytes) -> bytes:
    body = GSS_KRB5_OID + TOK_AP_REP + ap_rep
    return der(0x60, body)


def gss_parse_ap_rep(token: bytes) -> bytes:
    tag, inner = der_unwrap(token, 0x60)
    body = inner.bytes_()
    rest = body[len(GSS_KRB5_OID):]
    if rest[:2] != TOK_AP_REP:
        raise ValueError(f"unexpected GSS token id {rest[:2]!r}")
    return rest[2:]


def gss_checksum_deleg(flags: int = 0x32) -> bytes:
    """RFC 4121 authenticator checksum field: 16-byte zero bindings +
    flags (default: mutual | replay | sequence... 0x32 = GSS_C_MUTUAL
    (0x02) | GSS_C_SEQUENCE (0x10) | GSS_C_INTEG (0x20))."""
    return struct.pack("<I", 16) + b"\x00" * 16 + struct.pack("<I", flags)


def gss_wrap(key: bytes, data: bytes, initiator: bool,
             seq: int = 0, seal: bool = True) -> bytes:
    """RFC 4121 4.2.4 Wrap token (acceptor-subkey flag unset; the
    context key is the service-ticket session key both ends hold)."""
    flags = (0x00 if initiator else 0x01) | (0x02 if seal else 0x00)
    usage = KG_USAGE_INITIATOR_SEAL if initiator \
        else KG_USAGE_ACCEPTOR_SEAL
    if seal:
        header = TOK_WRAP + bytes([flags, 0xFF]) \
            + struct.pack(">HHQ", 0, 0, seq)
        enc = krb_encrypt(key, usage, data + header)
        return header + enc
    cksum = krb_checksum(key, usage, data + TOK_WRAP
                         + bytes([flags, 0xFF])
                         + struct.pack(">HHQ", 12, 0, seq))
    header = TOK_WRAP + bytes([flags, 0xFF]) \
        + struct.pack(">HHQ", 12, 0, seq)
    return header + data + cksum


def gss_unwrap(key: bytes, token: bytes, initiator_sent: bool) -> bytes:
    if token[:2] != TOK_WRAP:
        raise ValueError("not a Wrap token")
    flags = token[2]
    sealed = bool(flags & 0x02)
    usage = KG_USAGE_INITIATOR_SEAL if initiator_sent \
        else KG_USAGE_ACCEPTOR_SEAL
    ec, _rrc, seq = struct.unpack_from(">HHQ", token, 4)
    body = token[16:]
    if sealed:
        plain = krb_decrypt(key, usage, body)
        # plaintext || header(16)
        return plain[:-16]
    data, cksum = body[:-12], body[-12:]
    header = token[:16]
    if krb_checksum(key, usage, data + header) != cksum:
        raise ValueError("gss_unwrap: bad checksum")
    return data


def kinit(principal: str, keytab_path: str, krb5_conf_path: str
          ) -> tuple[bytes, Ticket]:
    """The UserGroupInformation.loginUserFromKeytab analog: read the
    key from the keytab, find the realm's KDC in krb5.conf, run the AS
    exchange. Returns (tgt_session_key, tgt); raises on bad keytab /
    unknown principal / unreachable KDC — the same failures a JVM
    kerberos login surfaces."""
    from seatunnel_spark.sources.file import resolve_path_aliases

    key = keytab_key(resolve_path_aliases(keytab_path), principal)
    conf = parse_krb5_conf(resolve_path_aliases(krb5_conf_path))
    _comps, realm = parse_principal(principal)
    realm = realm or conf.get("default_realm", "")
    kdc = conf["realms"].get(realm, {}).get("kdc")
    if not kdc:
        raise ValueError(f"krb5.conf: no kdc for realm {realm!r}")
    return as_exchange(kdc, principal, key, realm)


__all__ = [
    "kinit",
    "ETYPE_AES256", "CKSUM_HMAC_SHA1_AES256", "NT_PRINCIPAL",
    "NT_SRV_INST", "KrbError", "Ticket",
    "der", "der_seq", "der_ctx", "der_app", "der_int", "der_octets",
    "der_gstring", "der_gentime", "der_bitstring32", "DerView",
    "der_unwrap", "dk", "krb_encrypt", "krb_decrypt", "krb_checksum",
    "string_to_key", "parse_principal", "principal_salt",
    "parse_krb5_conf", "write_keytab", "read_keytab", "keytab_key",
    "enc_principal", "dec_principal", "enc_encrypted_data",
    "dec_encrypted_data", "enc_key", "dec_key", "enc_ticket",
    "dec_ticket", "as_exchange", "tgs_exchange", "build_ap_req",
    "dec_ap_rep", "kdc_exchange", "gss_initial_token",
    "gss_parse_initial", "gss_ap_rep_token", "gss_parse_ap_rep",
    "gss_checksum_deleg", "gss_wrap", "gss_unwrap",
]
