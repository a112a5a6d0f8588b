"""Aliyun SLS connector (signed REST + protobuf LogGroup) vs mini server."""

import json
import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources.sls import (
    SlsClient,
    decode_log_group_list,
    encode_log_group,
)
from seatunnel_spark.testing.sls_server import start_mini_sls

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-sls-e2e/src/test/resources")


def test_log_group_codec_roundtrip():
    from seatunnel_spark import pb

    group = encode_log_group(
        [(1700000001, [("k1", "v1"), ("k2", "v2")]),
         (1700000002, [("k1", "x")])], topic="t", source="s")
    logs = decode_log_group_list(pb.fbytes(1, group))
    assert logs == [
        {"time": 1700000001, "contents": {"k1": "v1", "k2": "v2"},
         "topic": "t", "source": "s"},
        {"time": 1700000002, "contents": {"k1": "x"},
         "topic": "t", "source": "s"}]


def test_client_signature_and_cursors():
    sls, port, stop = start_mini_sls(secret="sk")
    try:
        cl = SlsClient("", "p", "ak", "sk",
                       base_url=f"http://127.0.0.1:{port}")
        assert cl.list_shards("store1") == [0, 1]
        assert sls.bad_signatures == 0
        sls.seed("store1", 0, [{"a": "1"}, {"a": "2"}])
        begin = cl.get_cursor("store1", 0, "begin")
        end = cl.get_cursor("store1", 0, "end")
        logs, nxt = cl.pull_logs("store1", 0, begin)
        assert [lg["contents"]["a"] for lg in logs] == ["1", "2"]
        assert nxt == end
        # wrong secret is rejected by the mini server
        bad = SlsClient("", "p", "ak", "WRONG",
                        base_url=f"http://127.0.0.1:{port}")
        with pytest.raises(RuntimeError, match="401"):
            bad.list_shards("store1")
    finally:
        stop()


def test_sink_then_source_roundtrip(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source

    sls, port, stop = start_mini_sls()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"proj.sls.example.test=http://127.0.0.1:{port}"
    try:
        base = {"endpoint": "sls.example.test", "project": "proj",
                "logstore": "ls1", "access_key_id": "ak",
                "access_key_secret": "sk"}
        df = spark.createDataFrame([(i, f"n{i}") for i in range(25)],
                                   "id int, name string")
        get_sink("Sls", {**base, "topic": "t1"}).write(df)
        stored = sum(len(v) for v in sls.logs["ls1"].values())
        assert stored >= 1

        # content mode (no schema): one JSON column with the row json
        out = get_source("Sls", {**base, "start_mode": "EARLIEST"}) \
            .read(spark)
        assert out.columns == ["content"]
        docs = [json.loads(json.loads(r["content"])["content"])
                for r in out.collect()]
        assert sorted(d["id"] for d in docs) == list(range(25))
    finally:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        stop()


def test_schema_mode_and_group_cursor(spark):
    from seatunnel_spark.sources import get_source

    sls, port, stop = start_mini_sls()
    try:
        base = {"endpoint": "e", "project": "p", "logstore": "ls2",
                "access_key_id": "ak", "access_key_secret": "sk"}
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
            f"p.e=http://127.0.0.1:{port}"
        sls.seed("ls2", 0, [{"id": "1", "name": "a", "weight": "1.5"}])
        sls.seed("ls2", 1, [{"id": "2", "name": "b", "weight": "2.5"}])
        src = get_source("Sls", {
            **base, "start_mode": "GROUP_CURSOR",
            "auto_cursor_reset": "BEGIN", "consumer_group": "cg",
            "schema": {"fields": {"id": "int", "name": "string",
                                  "weight": "double"}}})
        rows = {r["id"]: r for r in src.read(spark).collect()}
        assert rows[1]["weight"] == 1.5 and rows[2]["name"] == "b"
        # checkpoints committed at the end cursor: a second read is empty
        assert ("ls2", "cg", 0) in sls.checkpoints
        assert src.read(spark).count() == 0
        # new data after the checkpoint is picked up
        sls.seed("ls2", 0, [{"id": "3", "name": "c", "weight": "9"}])
        assert [r["id"] for r in src.read(spark).collect()] == [3]
    finally:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        stop()


def test_reference_sls_confs_run_unmodified(spark):
    """All 3 connector-sls-e2e confs (endpoint/project = xxxxxx
    placeholders) run against the mini backend via a host alias."""
    sls, port, stop = start_mini_sls(secret="xxxxxxx")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"xxxxxx.xxxxxx=http://127.0.0.1:{port}"
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/sls_sink_to_console.conf"))
        stored = sum(len(v) for v in sls.logs["xxxxxx"].values())
        assert stored >= 1
        logs = decode_log_group_list(
            b"".join(__import__("seatunnel_spark.pb", fromlist=["pb"])
                     .fbytes(1, g)
                     for v in sls.logs["xxxxxx"].values() for g in v))
        docs = [json.loads(lg["contents"]["content"]) for lg in logs]
        assert len(docs) == 10 and "name" in docs[0]

        # source confs default to GROUP_CURSOR + auto reset END: seed
        # BEFORE the read window closes -> use a fresh run after seeding
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/sls_source_without_schema_to_console.conf"))
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/sls_source_with_schema_to_console.conf"))
    finally:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        stop()
