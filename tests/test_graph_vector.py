"""Milvus (REST v2) and Neo4j (HTTP Cypher) connectors against mini
servers."""

from pyspark.sql import types as T

from seatunnel_spark.testing.rest_servers import (
    start_mini_milvus,
    start_mini_neo4j,
)


def test_milvus_roundtrip(spark):
    from seatunnel_spark.sources.graph_vector import MilvusSink, MilvusSource

    state, port, stop = start_mini_milvus()
    try:
        url = f"http://127.0.0.1:{port}"
        df = spark.createDataFrame(
            [(i, [float(i), float(i) + 0.5], f"d{i}") for i in range(30)],
            "id int, vector array<float>, title string")
        MilvusSink({"url": url, "collection": "c1", "token": "root:Milvus",
                    "batch_size": 8}).write(df)
        assert len(state[("default", "c1")]) == 30
        src = MilvusSource({
            "url": url, "collection": "c1", "batch_size": 7,
            "schema": {"fields": {"id": "int", "vector": "array<float>",
                                  "title": "string"}}})
        rows = src.read(spark).collect()
        assert len(rows) == 30
        got = {r["id"]: r["title"] for r in rows}
        assert got[4] == "d4"
    finally:
        stop()


def test_milvus_upsert_mode(spark):
    from seatunnel_spark.sources.graph_vector import MilvusSink

    state, port, stop = start_mini_milvus()
    try:
        url = f"http://127.0.0.1:{port}"
        df = spark.createDataFrame([(1, "a"), (1, "b")], "id int, v string") \
            .coalesce(1)
        MilvusSink({"url": url, "collection": "up",
                    "enable_upsert": True}).write(df)
        assert len(state[("default", "up")]) == 1  # keyed upsert
    finally:
        stop()


def test_neo4j_write_and_read(spark):
    from seatunnel_spark.sources.graph_vector import Neo4jSink, Neo4jSource

    state, port, stop = start_mini_neo4j()
    try:
        uri = f"http://127.0.0.1:{port}"
        df = spark.createDataFrame(
            [(i, f"p{i}", 20 + i) for i in range(40)],
            "id int, name string, age int")
        Neo4jSink({"uri": uri, "username": "neo4j", "password": "x",
                   "query": ("UNWIND $batch AS row CREATE (n:Person) "
                             "SET n = row"),
                   "max_batch_size": 16}).write(df)
        assert len(state["Person"]) == 40
        src = Neo4jSource({
            "uri": uri, "username": "neo4j", "password": "x",
            "query": "MATCH (n:Person) RETURN n.id AS id, n.name AS name",
            "schema": {"fields": {"id": "int", "name": "string"}}})
        rows = src.read(spark).collect()
        assert sorted(r["id"] for r in rows) == list(range(40))
    finally:
        stop()


def test_neo4j_bolt_uri_maps_to_http(spark):
    from seatunnel_spark.sources.graph_vector import _neo4j_base

    assert _neo4j_base("bolt://neo4j-host:7687") == "http://neo4j-host:7474"
    assert _neo4j_base("http://x:7474/") == "http://x:7474"


def test_neo4j_one_by_one_mode(spark):
    from seatunnel_spark.sources.graph_vector import Neo4jSink

    state, port, stop = start_mini_neo4j()
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
        Neo4jSink({"uri": f"http://127.0.0.1:{port}",
                   "query": "CREATE (n:Item {id: $id, v: $v})"}).write(df)
        assert sorted(n["id"] for n in state["Item"]) == [1, 2]
    finally:
        stop()


# -- reference conf runs (connector-milvus-e2e) ------------------------

_MILVUS_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
               "connector-milvus-e2e/src/test/resources")


def test_milvus_confs_run_unmodified(spark, monkeypatch):
    """fake-to-milvus.conf (vector-typed FakeSource columns into a
    database-only sink: collection = source table name),
    multi-fake-to-milvus.conf (float + binary vectors), and
    milvus-to-milvus.conf (schema-less source via collection
    describe)."""
    import os

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.sources.graph_vector import MilvusSink

    state, port, stop = start_mini_milvus()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"milvus-e2e=http://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_MILVUS_RES}/fake-to-milvus.conf"))
        assert len(state[("test1", "simple_example_1")]) == 10
        ent = next(iter(state[("test1", "simple_example_1")].values()))
        assert len(ent["book_intro"]) == 4  # vector.dimension honored

        JobEngine(spark).run(JobSpec.from_file(
            f"{_MILVUS_RES}/multi-fake-to-milvus.conf"))
        assert len(state[("test2", "simple_example_2")]) == 10

        # seed default.simple_example (the IT's pymilvus setup), then
        # the schema-less source round-trips it through describe
        url = f"http://127.0.0.1:{port}"
        seed = spark.createDataFrame(
            [(i, [float(i)] * 4, f"b{i}") for i in range(6)],
            "book_id bigint, book_intro array<float>, book_title string")
        MilvusSink({"url": url, "collection": "simple_example"}
                   ).write(seed)
        JobEngine(spark).run(JobSpec.from_file(
            f"{_MILVUS_RES}/milvus-to-milvus.conf"))
        assert len(state[("test", "simple_example")]) == 6
    finally:
        stop()


_NEO4J_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
              "connector-neo4j-e2e/src/test/resources/neo4j")


def test_neo4j_batch_write_conf(spark, monkeypatch):
    """fake_to_neo4j_batch_write.conf: 1000 rows through UNWIND $batch
    in max_batch_size=101 chunks."""
    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec

    state, port, stop = start_mini_neo4j()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"neo4j-host=http://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_NEO4J_RES}/fake_to_neo4j_batch_write.conf"))
        assert len(state["BatchLabel"]) == 1000
        assert {"name", "age"} <= set(state["BatchLabel"][0])
    finally:
        stop()


def test_neo4j_to_neo4j_conf(spark, monkeypatch):
    """neo4j_to_neo4j.conf: the full-type MATCH with a `t{.int}` map
    projection reads seeded Test nodes; the sink binds $params by
    queryParamPosition into CREATE (tt:TestTest ...)."""
    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.sources.graph_vector import neo4j_tx

    state, port, stop = start_mini_neo4j()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"neo4j-host=http://127.0.0.1:{port}")
    try:
        # seed Test nodes over the same tx-commit wire (the IT's driver
        # session.run CREATE)
        for i in range(3):
            neo4j_tx(f"http://127.0.0.1:{port}", "neo4j", [{
                "statement": "CREATE (t:Test) SET t = $params",
                "parameters": {
                    "string": f"s{i}", "boolean": i % 2 == 0,
                    "long": 10 ** 12 + i, "double": i * 1.5,
                    "byteArray": [1, 2, i], "date": "2024-03-19",
                    "localDateTime": "2024-03-19T12:00:00",
                    "int": i, "float": i * 0.5,
                    "list": [i, i + 1]}}], {})
        JobEngine(spark).run(JobSpec.from_file(
            f"{_NEO4J_RES}/neo4j_to_neo4j.conf"))
        out = state["TestTest"]
        assert len(out) == 3
        byname = {d["string"]: d for d in out}
        assert byname["s1"]["int"] == 1
        assert byname["s1"]["map"] == {"int": 1}   # map projection rode
        assert byname["s1"]["list"] == [1, 2]
        assert byname["s1"]["byteArray"] == [1, 2, 1]
    finally:
        stop()
