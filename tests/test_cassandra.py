"""Cassandra connector over the CQL native protocol v4 vs the mini
server."""

from seatunnel_spark.testing.cql_server import start_mini_cql


def test_cql_wire_roundtrip():
    from seatunnel_spark.cql import CqlConnection

    store, port, stop = start_mini_cql()
    try:
        cl = CqlConnection("127.0.0.1", port)
        cl.query("INSERT INTO ks.t (id, name, score) "
                 "VALUES (1, 'a''b', 2.5)")
        cols, rows = cl.query("SELECT id, name, score FROM ks.t")
        assert [c[0] for c in cols] == ["id", "name", "score"]
        assert rows == [[1, "a'b", 2.5]]
        cl.close()
    finally:
        stop()


def test_cassandra_sink_batches_and_source(spark):
    from seatunnel_spark.sources.cassandra import (
        CassandraSink,
        CassandraSource,
    )

    store, port, stop = start_mini_cql()
    try:
        base = {"host": f"127.0.0.1:{port}", "keyspace": "ks"}
        df = spark.createDataFrame(
            [(i, f"n{i}", i * 1.5, i % 2 == 0) for i in range(60)],
            "id bigint, name string, score double, flag boolean")
        CassandraSink({**base, "table": "users",
                       "batch_size": 13}).write(df)
        assert len(store.tables[("ks", "users")]) == 60
        src = CassandraSource({**base, "cql": "SELECT * FROM ks.users"})
        rows = src.read(spark).collect()
        assert len(rows) == 60
        got = {r["id"]: (r["name"], r["flag"]) for r in rows}
        assert got[7] == ("n7", False)
    finally:
        stop()


def test_cassandra_fields_projection(spark):
    from seatunnel_spark.sources.cassandra import CassandraSink

    store, port, stop = start_mini_cql()
    try:
        df = spark.createDataFrame([(1, "x", "drop-me")],
                                   "id int, keep string, junk string")
        CassandraSink({"host": f"127.0.0.1:{port}", "keyspace": "ks",
                       "table": "slim", "fields": ["id", "keep"]}).write(df)
        assert store.tables[("ks", "slim")] == [{"id": 1, "keep": "x"}]
    finally:
        stop()
