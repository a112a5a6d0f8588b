"""LZO1X decompressor + lzop container reader, pure Python.

Written from the public bitstream description (the LZO1X format notes
distributed with the Linux kernel, Documentation/lzo.txt, and the lzop
file-format spec from lzop.org). The reference's lzo read confs
(compress_codec = "lzo" on text/json files) consume lzop-framed
fixtures; the compressor closes the write side (CompressFormat.LZO's
.lzo suffix on text/json sinks) and makes the codec round-trip
property-testable.

Instruction summary (state = literals copied by the previous op):
    0..15   state 0   long literal run, len = 3 + L(ext)
            state 1-3 copy 2 @ <=1 kB:  d = (H<<2)+D+1
            state 4   copy 3 @ 2-3 kB:  d = (H<<2)+D+2049
    16..31  copy @ 16-48 kB: len = 2 + L(ext), LE16 follows,
            d = 16384 + ((b&8)<<11) + (le>>2); d == 16384 => EOF
    32..63  copy @ <=16 kB: len = 2 + L(ext), LE16, d = (le>>2)+1
    64..127 copy 3-4 @ <=2 kB: d = (H<<3)+D+1
    128..255 copy 5-8 @ <=2 kB: d = (H<<3)+D+1
Each op's low 2 bits (S) are trailing literals; state = S after.
"""

from __future__ import annotations

import struct
import zlib

LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"

_F_ADLER32_D = 0x0001
_F_ADLER32_C = 0x0002
_F_H_FILTER = 0x0800
_F_CRC32_D = 0x0100
_F_CRC32_C = 0x0200


def lzo1x_decompress(src: bytes) -> bytes:
    out = bytearray()
    ip = 0
    n = len(src)

    def ext_len(base: int) -> int:
        nonlocal ip
        ln = 0
        while src[ip] == 0:
            ln += 255
            ip += 1
        ln += base + src[ip]
        ip += 1
        return ln

    def copy_match(dist: int, ln: int) -> None:
        pos = len(out) - dist
        if pos < 0:
            raise ValueError("lzo: match distance before stream start")
        for _ in range(ln):  # byte-wise: overlapping copies replicate
            out.append(out[pos])
            pos += 1

    state = 0
    b = src[ip]
    if b > 17:  # first byte: immediate literal run of (b - 17)
        ip += 1
        t = b - 17
        out += src[ip:ip + t]
        ip += t
        state = 4 if t >= 4 else t
    while ip < n:
        b = src[ip]
        ip += 1
        if b <= 15:
            if state == 0:
                ln = 3 + (b if b else ext_len(15))
                out += src[ip:ip + ln]
                ip += ln
                state = 4
                continue
            h = src[ip]
            ip += 1
            if state == 4:
                copy_match((h << 2) + ((b >> 2) & 3) + 2049, 3)
            else:
                copy_match((h << 2) + ((b >> 2) & 3) + 1, 2)
            s = b & 3
        elif b <= 31:
            ln = 2 + ((b & 7) if b & 7 else ext_len(7))
            le = src[ip] | (src[ip + 1] << 8)
            ip += 2
            dist = 16384 + ((b & 8) << 11) + (le >> 2)
            if dist == 16384:
                return bytes(out)  # end-of-stream marker
            copy_match(dist, ln)
            s = le & 3
        elif b <= 63:
            ln = 2 + ((b & 31) if b & 31 else ext_len(31))
            le = src[ip] | (src[ip + 1] << 8)
            ip += 2
            copy_match((le >> 2) + 1, ln)
            s = le & 3
        else:
            if b <= 127:
                ln = 3 + ((b >> 5) & 1)
            else:
                ln = 5 + ((b >> 5) & 3)
            h = src[ip]
            ip += 1
            copy_match((h << 3) + ((b >> 2) & 7) + 1, ln)
            s = b & 3
        if s:
            out += src[ip:ip + s]
            ip += s
        state = s
    return bytes(out)


def lzo1x_compress(src: bytes) -> bytes:
    """Valid (if unambitious) LZO1X: greedy back-references via a
    4-byte-prefix hash emitting M3 copies (opcode 32..63, <= 16 kB
    distance) between state-0 long literal runs. Any conformant
    decompressor — including lzo1x_decompress above — reads it;
    liblzo2 finds more matches, same bitstream.

    State discipline: literal runs only ever follow stream start or an
    op with S=0 (state 0); runs are always >= 4 literals (matches are
    shortened so a 1..3-byte tail never occurs); <= 3-byte inputs use
    the first-byte form (valid at stream start only)."""
    n = len(src)
    out = bytearray()

    def emit_literals(chunk: bytes) -> None:
        ln = len(chunk)
        if ln == 0:
            return
        if 4 <= ln <= 18:
            out.append(ln - 3)
        else:
            out.append(0)
            rem = ln - 18
            while rem > 255:
                out.append(0)
                rem -= 255
            out.append(rem)
        out.extend(chunk)

    if n <= 3:  # first-byte literal form, then EOF
        if n:
            out.append(17 + n)
            out.extend(src)
        out += b"\x11\x00\x00"
        return bytes(out)

    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0
    while i + 4 <= n:
        key = src[i:i + 4]
        cand = table.get(key)
        table[key] = i
        dist = i - cand if cand is not None else None
        run = i - lit_start
        if dist is not None and 0 < dist <= 16384 \
                and (run == 0 or run >= 4):
            m = 4
            while i + m < n and m < 255 and src[cand + m] == src[i + m]:
                m += 1
            tail = n - (i + m)
            if 0 < tail < 4:
                m -= 4 - tail  # never strand a 1..3-byte literal tail
            if m >= 4:
                emit_literals(src[lit_start:i])
                ln = m - 2
                if ln <= 31:
                    out.append(32 | ln)
                else:
                    out.append(32)
                    rem = ln - 31
                    while rem > 255:
                        out.append(0)
                        rem -= 255
                    out.append(rem)
                le = (dist - 1) << 2  # S=0: no trailing literals
                out.append(le & 0xFF)
                out.append((le >> 8) & 0xFF)
                for k in range(i + 1, min(i + m, n - 3)):
                    table[src[k:k + 4]] = k
                i += m
                lit_start = i
                continue
        i += 1
    emit_literals(src[lit_start:])
    out += b"\x11\x00\x00"  # EOF marker (M4, distance 16384)
    return bytes(out)


def lzop_compress(data: bytes, block: int = 256 * 1024) -> bytes:
    """Frame `data` as an lzop file (flags=0: no checksums beyond the
    mandatory header one — which readers with flags=0 skip-verify)."""
    fields = (struct.pack(">HHH", 0x1040, 0x2080, 0x0940)
              + b"\x01\x05"                       # method LZO1X_1, level
              + struct.pack(">I", 0)              # flags
              + struct.pack(">II", 0o100644, 0)   # mode, mtime
              + struct.pack(">I", 0)              # mtime_high
              + b"\x00")                          # no filename
    # mandatory header checksum: adler32 over version..filename (lzop.c
    # header_write; verified by lzop CLI and hadoop-lzo LzopInputStream)
    header = (LZOP_MAGIC + fields
              + struct.pack(">I", zlib.adler32(fields) & 0xFFFFFFFF))
    out = bytearray(header)
    for off in range(0, len(data), block) or [0]:
        chunk = data[off:off + block]
        comp = lzo1x_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack(">II", len(chunk), len(comp)) + comp
        else:  # stored block
            out += struct.pack(">II", len(chunk), len(chunk)) + chunk
    out += struct.pack(">I", 0)
    return bytes(out)


def lzop_decompress(blob: bytes) -> bytes:
    """Unframe an lzop file (possibly multi-block) and decompress."""
    if not blob.startswith(LZOP_MAGIC):
        raise ValueError("not an lzop file (bad magic)")
    i = len(LZOP_MAGIC)
    (version,) = struct.unpack_from(">H", blob, i)
    i += 2
    i += 2  # lib_version
    if version >= 0x0940:
        i += 2  # version_needed_to_extract
    i += 1      # method
    if version >= 0x0940:
        i += 1  # level
    (flags,) = struct.unpack_from(">I", blob, i)
    i += 4
    if flags & _F_H_FILTER:
        i += 4
    i += 4 + 4  # mode, mtime_low
    if version >= 0x0940:
        i += 4  # mtime_high
    fn_len = blob[i]
    i += 1 + fn_len
    # header checksum: adler32 (crc32 when F_H_CRC32=0x1000 is set)
    # over version..filename — verified, matching lzop CLI / hadoop-lzo
    (hchk,) = struct.unpack_from(">I", blob, i)
    fields = blob[len(LZOP_MAGIC):i]
    want = (zlib.crc32(fields) if flags & 0x1000
            else zlib.adler32(fields)) & 0xFFFFFFFF
    if hchk != want:
        raise ValueError(
            f"lzop header checksum mismatch: {hchk:#x} != {want:#x}")
    i += 4

    out = b""
    while True:
        (ulen,) = struct.unpack_from(">I", blob, i)
        i += 4
        if ulen == 0:
            return out
        (clen,) = struct.unpack_from(">I", blob, i)
        i += 4
        if flags & _F_ADLER32_D:
            i += 4
        if flags & _F_CRC32_D:
            i += 4
        if clen < ulen:  # compressed checksum only for compressed blocks
            if flags & _F_ADLER32_C:
                i += 4
            if flags & _F_CRC32_C:
                i += 4
            chunk = lzo1x_decompress(blob[i:i + clen])
            if len(chunk) != ulen:
                raise ValueError(
                    f"lzo: block decompressed to {len(chunk)}, "
                    f"header says {ulen}")
            out += chunk
        else:  # stored
            out += blob[i:i + clen]
        i += clen


__all__ = ["lzo1x_decompress", "lzo1x_compress", "lzop_decompress",
           "lzop_compress", "LZOP_MAGIC"]
