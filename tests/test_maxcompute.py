"""MaxCompute Tunnel connector vs the mini ODPS backend."""

import datetime

import pytest

from seatunnel_spark.sources.maxcompute import (
    OdpsTunnelClient,
    decode_records,
    encode_records,
)
from seatunnel_spark.testing.maxcompute_server import start_mini_odps

SCHEMA = [{"name": "id", "type": "bigint"},
          {"name": "name", "type": "string"},
          {"name": "w", "type": "double"},
          {"name": "ok", "type": "boolean"}]


def test_record_stream_codec_roundtrip():
    types = ["bigint", "string", "double", "boolean"]
    rows = [(1, "a", 1.5, True), (-7, None, -2.25, False),
            (None, "only-name", None, None)]
    assert decode_records(encode_records(rows, types), types) == rows


def test_tunnel_client_sessions_and_signature():
    odps, port, stop = start_mini_odps(secret="sk")
    try:
        odps.seed("t1", SCHEMA, [(i, f"n{i}", i / 2, i % 2 == 0)
                                 for i in range(7)])
        cl = OdpsTunnelClient(f"127.0.0.1:{port}", "proj", "ak", "sk")
        s = cl.create_download("t1")
        assert s["RecordCount"] == 7
        types = [c["type"] for c in s["Schema"]["columns"]]
        rows = cl.read_rows("t1", s["DownloadID"], 2, 3, types)
        assert [r[0] for r in rows] == [2, 3, 4]
        bad = OdpsTunnelClient(f"127.0.0.1:{port}", "proj", "ak", "WRONG")
        with pytest.raises(RuntimeError, match="401"):
            bad.create_download("t1")
    finally:
        stop()


def test_source_split_reads(spark):
    from seatunnel_spark.sources import get_source

    odps, port, stop = start_mini_odps()
    try:
        odps.seed("big", SCHEMA, [(i, f"n{i}", i * 0.5, True)
                                  for i in range(25)])
        src = get_source("Maxcompute", {
            "endpoint": f"127.0.0.1:{port}", "project": "proj",
            "accessId": "ak", "accesskey": "sk", "table_name": "big",
            "split_row": 10})
        df = src.read(spark)
        assert df.columns == ["id", "name", "w", "ok"]
        rows = df.collect()
        assert sorted(r["id"] for r in rows) == list(range(25))
        assert rows[0]["w"] is not None
    finally:
        stop()


def test_sink_blocks_commit_and_overwrite(spark):
    from seatunnel_spark.sinks import get_sink

    odps, port, stop = start_mini_odps()
    try:
        odps.seed("out", SCHEMA, [(999, "old", 0.0, False)])
        base = {"endpoint": f"127.0.0.1:{port}", "project": "proj",
                "accessId": "ak", "accesskey": "sk", "table_name": "out"}
        df = spark.createDataFrame(
            [(i, f"n{i}", i * 1.5, i % 2 == 0) for i in range(12)],
            "id long, name string, w double, ok boolean").repartition(3)
        get_sink("Maxcompute", {**base, "overwrite": True}).write(df)
        rows = odps.tables["out"]["rows"]
        assert sorted(r[0] for r in rows) == list(range(12))  # old row gone
        # append mode keeps existing rows
        df2 = spark.createDataFrame([(100, "x", 1.0, True)],
                                    "id long, name string, w double, ok boolean")
        get_sink("Maxcompute", base).write(df2)
        assert len(odps.tables["out"]["rows"]) == 13
    finally:
        stop()


def test_sink_datetime_roundtrip(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source

    odps, port, stop = start_mini_odps()
    try:
        schema = [{"name": "id", "type": "bigint"},
                  {"name": "ts", "type": "datetime"}]
        odps.seed("evt", schema, [])
        base = {"endpoint": f"127.0.0.1:{port}", "project": "proj",
                "accessId": "ak", "accesskey": "sk", "table_name": "evt"}
        dt = datetime.datetime(2024, 3, 1, 10, 30, 0)
        df = spark.createDataFrame([(1, dt)], "id long, ts timestamp")
        get_sink("Maxcompute", base).write(df)
        out = get_source("Maxcompute", base).read(spark).collect()
        # datetime rides as epoch millis -> timestamp cast on read is
        # driven by the declared ODPS type
        assert out[0]["id"] == 1
    finally:
        stop()
