"""Tablestore (OTS) connector: PlainBuffer codec, signed wire calls,
range scans, and RowKind batch writes vs the mini backend."""

import pytest

from seatunnel_spark.sources.tablestore import (
    INF_MAX,
    INF_MIN,
    OtsClient,
    crc8,
    decode_rows,
    encode_row,
    plainbuffer,
)
from seatunnel_spark.testing.ots_server import start_mini_ots


def test_crc8_and_plainbuffer_roundtrip():
    assert crc8(b"") == 0
    assert crc8(b"a") != crc8(b"b")
    rows = plainbuffer([
        encode_row([("id", 1), ("k", "x")],
                   [("name", "a"), ("w", 1.5), ("ok", True),
                    ("blob", b"\x00\x01"), ("n", None)]),
        encode_row([("id", 2), ("k", "y")], None, delete=True),
    ])
    got = decode_rows(rows)
    assert got[0]["pk"] == {"id": 1, "k": "x"}
    assert got[0]["attrs"]["name"] == "a"
    assert got[0]["attrs"]["w"] == 1.5
    assert got[0]["attrs"]["ok"] is True
    assert got[0]["attrs"]["blob"] == b"\x00\x01"
    assert got[0]["attrs"]["n"] is None
    assert got[1]["delete"] is True and got[1]["pk"] == {"id": 2, "k": "y"}


def test_put_get_range_delete():
    ots, port, stop = start_mini_ots(secret="sk")
    try:
        cl = OtsClient(f"127.0.0.1:{port}", "inst", "ak", "sk")
        for i in range(9):
            cl.put_row("t", [("id", i)], [("v", f"v{i}")])
        rows, nxt = cl.get_range(
            "t", [("id", INF_MIN)], [("id", INF_MAX)], limit=4)
        assert [r["pk"]["id"] for r in rows] == [0, 1, 2, 3]
        assert nxt is not None
        resumed = decode_rows(nxt)[0]["pk"]
        rows2, _ = cl.get_range(
            "t", list(resumed.items()), [("id", INF_MAX)], limit=100)
        assert [r["pk"]["id"] for r in rows2] == [4, 5, 6, 7, 8]
        cl.delete_row("t", [("id", 4)])
        rows3, _ = cl.get_range(
            "t", [("id", 4)], [("id", 6)], limit=100)
        assert [r["pk"]["id"] for r in rows3] == [5]
        bad = OtsClient(f"127.0.0.1:{port}", "inst", "ak", "WRONG")
        with pytest.raises(RuntimeError, match="401"):
            bad.put_row("t", [("id", 1)], [])
        assert ots.bad_signatures == 1
    finally:
        stop()


def test_sink_rowkind_and_source_scan(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source
    from seatunnel_spark.types import ROW_KIND_COL

    ots, port, stop = start_mini_ots()
    try:
        base = {"endPoint": f"127.0.0.1:{port}", "instanceName": "inst",
                "accessKeyId": "ak", "accessKeySecret": "sk",
                "table": "users", "primaryKeys": ["id"]}
        df = spark.createDataFrame(
            [(i, f"n{i}", float(i)) for i in range(30)],
            "id long, name string, w double").repartition(4)
        get_sink("Tablestore", {**base, "batchSize": 7}).write(df)
        assert len(ots.tables["users"]) == 30

        # changelog: -D removes, +U upserts
        chg = spark.createDataFrame(
            [(0, "x", 0.0, "-D"), (1, "upd", 9.9, "+U")],
            f"id long, name string, w double, {ROW_KIND_COL} string")
        get_sink("Tablestore", base).write(chg)
        assert (0,) not in ots.tables["users"]
        assert ots.tables["users"][(1,)]["attrs"]["name"] == "upd"

        src = get_source("Tablestore", {
            **base, "batchSize": 8,
            "schema": {"fields": {"id": "bigint", "name": "string",
                                  "w": "double"}}})
        out = src.read(spark)
        rows = {r["id"]: r for r in out.collect()}
        assert len(rows) == 29 and rows[1]["name"] == "upd"
        assert rows[2]["w"] == 2.0
    finally:
        stop()
