"""MySQL wire client + Doris/StarRocks FE sources vs the mini server."""

import datetime
import decimal

import pytest

from seatunnel_spark.mysql_wire import MySqlClient, native_scramble
from seatunnel_spark.testing.mysql_server import start_mini_mysql


def test_native_password_scramble_shape():
    s = native_scramble("secret", b"a" * 20)
    assert len(s) == 20
    assert native_scramble("", b"a" * 20) == b""
    assert s != native_scramble("other", b"a" * 20)


def test_handshake_query_and_types():
    srv, port, stop = start_mini_mysql(user="u", password="pw")
    try:
        srv.tables["t1"] = (
            ["id", "name", "w", "d", "ts"],
            [8, 253, 5, 10, 12],
            [(1, "a", 1.5, datetime.date(2024, 1, 2),
              datetime.datetime(2024, 1, 2, 3, 4, 5)),
             (2, None, 2.5, None, None)])
        cl = MySqlClient("127.0.0.1", port, "u", "pw")
        cols, types, rows = cl.query("SELECT * FROM t1")
        assert cols == ["id", "name", "w", "d", "ts"]
        assert rows[0] == (1, "a", 1.5, datetime.date(2024, 1, 2),
                           datetime.datetime(2024, 1, 2, 3, 4, 5))
        assert rows[1][1] is None and rows[1][3] is None
        # projection
        cols2, _, rows2 = cl.query("SELECT name, id FROM t1")
        assert cols2 == ["name", "id"] and rows2[0] == ("a", 1)
        assert cl.execute("SET query_timeout = 60") == 0
        cl.close()
        # wrong password -> access denied
        with pytest.raises(RuntimeError, match="1045"):
            MySqlClient("127.0.0.1", port, "u", "bad")
        assert srv.auth_failures == 1
    finally:
        stop()


def test_doris_source_projection_filter(spark):
    from seatunnel_spark.sources import get_source

    srv, port, stop = start_mini_mysql(user="root", password="r00t")
    try:
        srv.tables["orders"] = (
            ["o_id", "o_total", "o_date"],
            [8, 246, 10],
            [(i, decimal.Decimal(f"{i}.50"), datetime.date(2024, 1, 1))
             for i in range(10)])
        src = get_source("Doris", {
            "fenodes": "doris-fe:8030", "query-port": port,
            "username": "root", "password": "r00t",
            "table.identifier": "db.orders",
            "doris.read.field": "o_id, o_total",
            "doris.filter.query": "o_id >= 5",
        })
        import os

        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = "doris-fe=127.0.0.1"
        try:
            df = src.read(spark)
        finally:
            os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        assert df.columns == ["o_id", "o_total"]
        rows = df.collect()
        assert sorted(r["o_id"] for r in rows) == [5, 6, 7, 8, 9]
        assert rows[0]["o_total"] is not None
        # pushdown: the SELECT sent to the FE carries proj + filter
        sent = [s for s in srv.statements if "WHERE" in s]
        assert any("o_id, o_total" in s and "o_id >= 5" in s for s in sent)
    finally:
        stop()


def test_starrocks_source_partitioned_read(spark):
    from seatunnel_spark.sources import get_source

    srv, port, stop = start_mini_mysql()
    try:
        srv.tables["events"] = (
            ["e_id", "v"], [3, 253],
            [(i, f"v{i}") for i in range(20)])
        src = get_source("StarRocks", {
            "nodeUrls": [f"127.0.0.1:{port}"], "query-port": port,
            "database": "db", "table": "events",
            "partition_column": "e_id", "partition_num": 4,
        })
        df = src.read(spark)
        # the mini server ignores MOD predicates, so dedupe to check
        # content; the slice SQL shape is asserted below
        assert sorted({r["e_id"] for r in df.collect()}) == list(range(20))
        mods = [s for s in srv.statements if "MOD(e_id, 4)" in s]
        assert len(mods) == 4
    finally:
        stop()
