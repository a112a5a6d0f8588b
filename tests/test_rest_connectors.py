"""InfluxDB / AmazonSqs / Qdrant / Typesense connectors against their
in-process mini servers; reference e2e confs run unmodified where the
pipeline fits the sandbox (Testcontainers analogs)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.rest_servers import (
    start_mini_influx,
    start_mini_qdrant,
    start_mini_sqs,
    start_mini_typesense,
)

_INFLUX = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
           "connector-influxdb-e2e/src/test/resources")
_SQS = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-amazonsqs-e2e/src/test/resources")
_TS = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
       "connector-typesense-e2e/src/test/resources")


# ==========================================================================
# InfluxDB
# ==========================================================================

@pytest.fixture()
def influx(monkeypatch):
    store, port, stop = start_mini_influx()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"influxdb-host=http://127.0.0.1:{port}")
    yield store, port
    stop()


def test_influx_conf_runs_unmodified(spark, influx):
    """influxdb-to-influxdb.conf: 4 range splits on c_int [0,99) ->
    line-protocol sink with tag + explicit time (InfluxdbIT)."""
    store, _ = influx
    for i in range(100):
        store.write_lines(
            f"source,label=L{i % 3} c_string=\"s{i}\",c_double={i * 1.5},"
            f"c_bigint={i}i,c_float={i * 0.5},c_int={i}i,"
            f"c_smallint={i % 10}i,c_boolean={'true' if i % 2 else 'false'}"
            f" {1700000000000000000 + i}")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_INFLUX}/influxdb-to-influxdb.conf"))
    sink_pts = store.points.get("sink", [])
    assert len(sink_pts) == 99  # upper_bound=99 excludes c_int=99
    assert all(p["tags"].get("label", "").startswith("L") for p in sink_pts)
    assert all(p["time"] is not None for p in sink_pts)


def test_influx_partitioned_read_exact(spark, influx):
    from seatunnel_spark.sources.influxdb import InfluxDbSource

    store, port = influx
    for i in range(50):
        store.write_lines(f"m1 v={i}i,k={i}i {i}")
    src = InfluxDbSource({
        "url": f"http://127.0.0.1:{port}", "database": "d", "sql":
        "select k, v from m1", "split_column": "k", "lower_bound": 0,
        "upper_bound": 50, "partition_num": 7,
        "schema": {"fields": {"k": "int", "v": "bigint"}}})
    out = src.read(spark)
    assert sorted(r["k"] for r in out.collect()) == list(range(50))


# ==========================================================================
# AmazonSqs
# ==========================================================================

@pytest.fixture()
def sqs(monkeypatch):
    queues, port, stop = start_mini_sqs()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"sqs-host=http://127.0.0.1:{port}")
    yield queues, port
    stop()


def test_sqs_conf_runs_unmodified(spark, sqs):
    """amazonsqsIT_source_to_sink.conf: json messages from source_queue
    decode by schema and re-publish to sink_queue (AmazonSqsIT)."""
    queues, port = sqs
    from seatunnel_spark.sources.sqs import SqsClient

    cl = SqsClient(f"http://127.0.0.1:{port}/000000000000/source_queue",
                   access_key="1234", secret_key="abcd")
    cl.send_batch([json.dumps({"name": f"n{i}"}) for i in range(25)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_SQS}/amazonsqsIT_source_to_sink.conf"))
    sink_q = queues["/000000000000/sink_queue"]["messages"]
    assert sorted(json.loads(m)["name"] for m in sink_q) == \
        sorted(f"n{i}" for i in range(25))


def test_sqs_sigv4_headers_present():
    from seatunnel_spark.sources.sqs import _sigv4_headers

    h = _sigv4_headers("POST", "https://sqs.us-east-1.amazonaws.com/q",
                       b"Action=ReceiveMessage", "us-east-1", "AKID", "SECRET")
    assert h["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AKID/")
    assert "Signature=" in h["Authorization"] and "X-Amz-Date" in h


# ==========================================================================
# Qdrant
# ==========================================================================

def test_qdrant_roundtrip(spark):
    from seatunnel_spark.sources.vector_stores import QdrantSink, QdrantSource

    state, port, stop = start_mini_qdrant()
    try:
        df = spark.createDataFrame(
            [(i, [float(i), float(i + 1)], f"d{i}") for i in range(25)],
            "id int, vector array<float>, doc string")
        QdrantSink({"host": "127.0.0.1", "port": port,
                    "collection_name": "c1", "batch_size": 7}).write(df)
        assert len(state["collections"]["c1"]) == 25
        src = QdrantSource({
            "host": "127.0.0.1", "port": port, "collection_name": "c1",
            "batch_size": 6,
            "schema": {"fields": {"id": "int", "vector": "array<float>",
                                  "doc": "string"}}})
        collected = src.read(spark).collect()
        assert len(collected) == 25  # no per-partition duplication
        rows = {r["id"]: (r["doc"], [round(x) for x in r["vector"]])
                for r in collected}
        assert len(rows) == 25 and rows[3] == ("d3", [3, 4])
    finally:
        stop()


# ==========================================================================
# Typesense
# ==========================================================================

@pytest.fixture()
def typesense(monkeypatch):
    state, port, stop = start_mini_typesense()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"e2e_typesense=http://127.0.0.1:{port}")
    yield state, port
    stop()


def _seed_ts(state, coll, n=10):
    docs = {}
    for i in range(n):
        docs[str(i)] = {
            "id": str(i), "company_name": f"c{i}",
            "company_name_list": [f"c{i}", f"cc{i}"],
            "num_employees": 100 + i, "country": "US",
            "c_row": {"c_int": i, "c_string": f"s{i}",
                      "c_array_int": [i, i + 1]},
        }
    state["collections"][coll] = docs


def test_typesense_to_typesense_conf(spark, typesense):
    """typesense_to_typesense.conf: export jsonl -> import with
    composite primary key num_employees=id (TypesenseIT)."""
    state, _ = typesense
    _seed_ts(state, "typesense_to_typesense_source")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_TS}/typesense_to_typesense.conf"))
    sink = state["collections"]["typesense_to_typesense_sink"]
    assert len(sink) == 10
    assert "100=0" in sink  # key_delimiter '=' composite id
    assert sink["100=0"]["c_row"]["c_array_int"] == [0, 1]


def test_typesense_savemodes(spark, typesense):
    from seatunnel_spark.sources.vector_stores import TypesenseSink

    state, port = typesense
    base = {"hosts": [f"127.0.0.1:{port}"], "collection": "sv",
            "api_key": "xyz"}
    df = spark.range(3).select(F.col("id").cast("int").alias("n"))
    TypesenseSink(base).write(df)
    assert len(state["collections"]["sv"]) == 3
    TypesenseSink({**base, "data_save_mode": "DROP_DATA"}).write(df)
    assert len(state["collections"]["sv"]) == 3  # dropped then rewritten
    with pytest.raises(ValueError, match="missing"):
        TypesenseSink({"hosts": [f"127.0.0.1:{port}"], "collection": "nope",
                       "schema_save_mode": "ERROR_WHEN_SCHEMA_NOT_EXIST"}
                      ).write(df)


def test_typesense_source_and_sink_conf(spark, typesense):
    """typesense_source_and_sink.conf: export with a declared schema ->
    import with composite num_employees=num key and DROP_DATA."""
    state, _ = typesense
    state["collections"]["typesense_test_collection_for_source"] = {
        str(i): {"id": str(i), "company_name": f"c{i}", "num": 10 + i,
                 "num_employees": 100 + i, "flag": i % 2 == 0}
        for i in range(10)}
    JobEngine(spark).run(JobSpec.from_file(
        f"{_TS}/typesense_source_and_sink.conf"))
    assert len(state["collections"]["typesense_test_collection"]) == 10


def test_typesense_query_conf(spark, typesense):
    """typesense_to_typesense_with_query.conf: source-side query
    filters the export."""
    state, _ = typesense
    _seed_ts(state, "typesense_to_typesense_source_with_query")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_TS}/typesense_to_typesense_with_query.conf"))


_TS_SAVEMODE = [
    ("fake_to_typesense_with_create_when_not_exists.conf", None),
    ("fake_to_typesense_with_append_data.conf", None),
    ("fake_to_typesense_with_drop_data.conf", None),
    ("fake_to_typesense_with_recreate_schema.conf", None),
    ("fake_to_typesense_with_primary_keys.conf", None),
]


@pytest.mark.parametrize("conf,_x", _TS_SAVEMODE)
def test_typesense_savemode_confs(spark, typesense, conf, _x):
    state, _ = typesense
    spec = JobSpec.from_file(f"{_TS}/{conf}")
    sink = next(b for b in spec.sinks
                if b.plugin.lower() == "typesense").options
    JobEngine(spark).run(spec)
    assert state["collections"].get(sink["collection"]), conf


def test_typesense_error_mode_confs(spark, typesense):
    state, _ = typesense
    # ERROR_WHEN_NOT_EXISTS: collection missing -> fail
    with pytest.raises(Exception):
        JobEngine(spark).run(JobSpec.from_file(
            f"{_TS}/fake_to_typesense_with_error_when_not_exists.conf"))
    # ERROR_WHEN_DATA_EXISTS: seed data -> fail
    spec = JobSpec.from_file(
        f"{_TS}/fake_to_typesense_with_error_when_data_exists.conf")
    sink = next(b for b in spec.sinks
                if b.plugin.lower() == "typesense").options
    state["collections"][sink["collection"]] = {"1": {"id": "1"}}
    with pytest.raises(Exception):
        JobEngine(spark).run(spec)


def test_influx_tz_conf_runs_unmodified(spark, influx):
    """influxdb-to-influxdb-with-tz.conf: the source query carries a
    trailing tz('Asia/Shanghai') clause (InfluxDB timezone display
    semantics) — rows still read and land in the sink measurement."""
    store, _ = influx
    for i in range(20):
        store.write_lines(
            f"source,label=L{i % 3} c_string=\"s{i}\",c_double={i * 1.5},"
            f"c_bigint={i}i,c_float={i * 0.5},c_int={i}i,"
            f"c_smallint={i % 10}i,c_boolean={'true' if i % 2 else 'false'}"
            f" {1700000000000000000 + i}")
    JobEngine(spark).run(JobSpec.from_file(
        f"{_INFLUX}/influxdb-to-influxdb-with-tz.conf"))
    assert store.points.get("sink"), "tz conf wrote nothing"


def test_influx_multipletable_conf(spark, influx):
    """fake_to_infuxdb_with_multipletable.conf: multi-table FakeSource
    fans out into per-table measurements over line protocol."""
    store, _ = influx
    JobEngine(spark).run(JobSpec.from_file(
        f"{_INFLUX}/fake_to_infuxdb_with_multipletable.conf"))
    written = {m for m in store.points if store.points[m]}
    assert len(written) >= 2, written
