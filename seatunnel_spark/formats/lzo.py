"""LZO1X decompressor + lzop container reader, pure Python.

Written from the public bitstream description (the LZO1X format notes
distributed with the Linux kernel, Documentation/lzo.txt, and the lzop
file-format spec from lzop.org). Only decompression — the reference's
lzo read confs (compress_codec = "lzo" on text/json files) consume
lzop-framed fixtures; the e2e never writes lzo.

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
    i += 4      # header checksum (adler32 or crc32)

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


__all__ = ["lzo1x_decompress", "lzop_decompress", "LZOP_MAGIC"]
