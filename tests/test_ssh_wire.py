"""SSH2 transport + SFTP v3 unit tests beyond the conf-level e2e
(tests/test_sftp_confs.py): encryption/MAC integrity, auth rejection,
large-payload channel chunking, the lzop/LZO1X decompressor against
hand-framed streams."""

import os
import socket
import threading

import pytest

from seatunnel_spark.ssh_wire import SshTransport, connect_sftp
from seatunnel_spark.testing.sftp_server import start_mini_sftp


@pytest.fixture()
def server(tmp_path):
    root = tmp_path / "root"
    root.mkdir()
    port, stop = start_mini_sftp("u", "pw", str(root))
    yield str(root), port
    stop()


def test_sftp_large_file_roundtrip(server):
    """A payload much larger than one channel window/packet survives
    write_file/read_file (SFTP chunking + channel-data reassembly +
    CTR keystream continuity across many packets)."""
    root, port = server
    blob = os.urandom(1 << 20)  # 1 MiB
    cl = connect_sftp("127.0.0.1", port, "u", "pw")
    try:
        cl.mkdirs("deep/dir/tree")
        cl.write_file("deep/dir/tree/blob.bin", blob)
        assert cl.read_file("deep/dir/tree/blob.bin") == blob
        assert cl.stat("deep/dir/tree/blob.bin")["size"] == len(blob)
    finally:
        cl.close()


def test_wrong_password_rejected(server):
    _root, port = server
    with pytest.raises(PermissionError):
        connect_sftp("127.0.0.1", port, "u", "WRONG")


def test_tampered_packet_fails_mac(server):
    """Flipping one ciphertext bit after kex must be caught by
    hmac-sha2-256 — the server drops the connection instead of acting
    on the forged packet."""
    _root, port = server
    sock = socket.create_connection(("127.0.0.1", port), timeout=10)
    tr = SshTransport(sock)
    peer = tr.exchange_versions()
    tr.client_kex(peer)

    # encrypt a valid SERVICE_REQUEST, then corrupt one byte of the
    # ciphertext (not the MAC) before sending — sockets are read-only,
    # so swap in a corrupting proxy for the one send
    class Corrupt:
        def __init__(self, s):
            self._s = s

        def sendall(self, data):
            data = bytearray(data)
            data[4] ^= 0xFF
            self._s.sendall(bytes(data))

        def __getattr__(self, name):
            return getattr(self._s, name)

    from seatunnel_spark.ssh_wire import MSG_SERVICE_REQUEST, sstr

    tr.sock = Corrupt(sock)
    tr.send_packet(bytes([MSG_SERVICE_REQUEST]) + sstr(b"ssh-userauth"))
    tr.sock = sock
    with pytest.raises((ConnectionError, OSError)):
        tr.recv_packet()  # server hung up on MAC failure
    sock.close()


def test_concurrent_sessions(server):
    """The accept loop serves several authenticated sessions at once
    (each with its own kex keys)."""
    root, port = server
    results = {}

    def worker(i):
        cl = connect_sftp("127.0.0.1", port, "u", "pw")
        try:
            cl.write_file(f"f{i}.txt", f"payload-{i}".encode() * 100)
            results[i] = cl.read_file(f"f{i}.txt")
        finally:
            cl.close()

    ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(results[i] == f"payload-{i}".encode() * 100
               for i in range(4))


def test_lzo_stored_block_and_literal_stream():
    """lzop framing with a STORED block (clen == ulen) and an LZO1X
    stream that is one long literal run both decode; truncated-magic
    input raises."""
    import struct

    from seatunnel_spark.formats.lzo import (LZOP_MAGIC, lzo1x_decompress,
                                             lzop_decompress)

    import zlib

    payload = b"The quick brown fox jumps over the lazy dog. " * 10
    fields = (struct.pack(">HHH", 0x1040, 0x2080, 0x0940)
              + b"\x01\x05" + struct.pack(">I", 0)       # method/level/flags
              + struct.pack(">II", 0o100644, 0)           # mode, mtime
              + struct.pack(">I", 0)                      # mtime_high
              + b"\x00")                                  # fname
    # the mandatory header checksum is verified since round 5
    header = LZOP_MAGIC + fields \
        + struct.pack(">I", zlib.adler32(fields) & 0xFFFFFFFF)
    stored = header + struct.pack(">II", len(payload), len(payload)) \
        + payload + struct.pack(">I", 0)
    assert lzop_decompress(stored) == payload

    # literal-only LZO1X stream: first-byte run (3..) + EOF marker
    lit = b"abcdefghij"
    stream = bytes([17 + len(lit)]) + lit + b"\x11\x00\x00"
    assert lzo1x_decompress(stream) == lit

    with pytest.raises(ValueError):
        lzop_decompress(b"not an lzop stream")


def test_lzo_sink_write_source_read_roundtrip(spark, tmp_path):
    """compress_codec=lzo text write -> .lzo part files -> lzo text
    read: full sink/source round trip through the stdlib codec."""
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source

    out = str(tmp_path / "lzo_out")
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)], "id int, name string")
    get_sink("LocalFile", {
        "path": out, "file_format_type": "text",
        "field_delimiter": ",", "compress_codec": "lzo"}).write(df)
    import glob

    parts = glob.glob(f"{out}/**/part-*", recursive=True)
    assert parts and all(p.endswith(".lzo") for p in parts), parts

    back = get_source("LocalFile", {
        "path": out, "file_format_type": "text",
        "field_delimiter": ",", "compress_codec": "lzo",
        "schema": {"fields": {"id": "int", "name": "string"}},
    }).read(spark)
    got = {r["id"]: r["name"] for r in back.collect()}
    assert got == {i: f"name{i}" for i in range(50)}
