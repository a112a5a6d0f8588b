"""JDBC sink/source over the stdlib wire clients: upsert statements,
XA 2PC ordering, driverless reads — the connector-jdbc exactly-once
(XaFacade) and cdc-sink features exercised against mini pg/mysql."""

import re

import pytest

from seatunnel_spark.testing.mysql_server import start_mini_mysql
from seatunnel_spark.testing.pg_server import start_mini_pg
from seatunnel_spark.types import ROW_KIND_COL


def test_wire_insert_append_pg(spark):
    from seatunnel_spark.sinks import get_sink

    pg, port, stop = start_mini_pg(user="u", password="pw")
    try:
        df = spark.createDataFrame(
            [(1, "a"), (2, "o'brien")], "id int, name string")
        get_sink("Jdbc", {
            "url": f"jdbc:postgresql://127.0.0.1:{port}/db",
            "user": "u", "password": "pw", "table": "t1",
        }).write(df)
        inserts = [s for s in pg.statements if "INSERT INTO" in s]
        joined = ";".join(inserts)
        assert "o''brien" in joined  # literal escaping
        assert joined.count("INSERT INTO") == 2
    finally:
        stop()


def test_changelog_upsert_statements_pg(spark):
    from seatunnel_spark.sinks import get_sink

    pg, port, stop = start_mini_pg(user="u", password="pw")
    try:
        # event order is the explicit __offset feed position (the
        # changelog-determinism contract; arrival order is not a thing
        # in a distributed frame)
        df = spark.createDataFrame(
            [(1, "a", "+I", 0), (1, "b", "+U", 1),
             (2, "c", "+I", 2), (2, "c", "-D", 3)],
            f"id int, name string, {ROW_KIND_COL} string, __offset long")
        get_sink("Jdbc", {
            "url": f"jdbc:postgresql://127.0.0.1:{port}/db",
            "user": "u", "password": "pw", "table": "t2",
            "primary_keys": ["id"],
        }).write(df)
        ups = [s for s in ";".join(pg.statements).split(";")
               if "INSERT INTO" in s]
        # compacted: id=1 upserted with last value b; id=2 deleted -> absent
        assert len(ups) == 1 and "'b'" in ups[0]
        assert "ON CONFLICT" in ups[0].upper()
    finally:
        stop()


def test_exactly_once_2pc_pg_ordering(spark):
    from seatunnel_spark.sinks import get_sink

    pg, port, stop = start_mini_pg(user="u", password="pw")
    try:
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(40)],
            "id int, name string").repartition(4)
        get_sink("Jdbc", {
            "url": f"jdbc:postgresql://127.0.0.1:{port}/db",
            "user": "u", "password": "pw", "table": "t3",
            "is_exactly_once": True,
        }).write(df)
        flat = [p.strip() for s in pg.statements for p in s.split(";")]
        prepares = [i for i, s in enumerate(flat)
                    if s.startswith("PREPARE TRANSACTION")]
        commits = [i for i, s in enumerate(flat)
                   if s.startswith("COMMIT PREPARED")]
        assert len(prepares) == 4 and len(commits) == 4
        assert max(prepares) < min(commits)  # ALL prepared before ANY commit
        xids = {re.search(r"'(.+)'", flat[i]).group(1) for i in prepares}
        assert xids == {re.search(r"'(.+)'", flat[i]).group(1)
                        for i in commits}
        assert any(s == "BEGIN" for s in flat)
    finally:
        stop()


def test_exactly_once_2pc_mysql_xa(spark):
    from seatunnel_spark.sinks import get_sink

    srv, port, stop = start_mini_mysql(user="u", password="pw")
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")],
                                   "id int, name string").repartition(2)
        get_sink("Jdbc", {
            "url": f"jdbc:mysql://127.0.0.1:{port}/db",
            "user": "u", "password": "pw", "table": "t4",
            "is_exactly_once": True,
        }).write(df)
        seq = [s for s in srv.statements if s.startswith("XA ")]
        starts = [s for s in seq if s.startswith("XA START")]
        prepares = [i for i, s in enumerate(seq)
                    if s.startswith("XA PREPARE")]
        commits = [i for i, s in enumerate(seq)
                   if s.startswith("XA COMMIT")]
        assert len(starts) == len(prepares) == len(commits) == 2
        assert max(prepares) < min(commits)
    finally:
        stop()


def test_driverless_source_read_pg(spark):
    from seatunnel_spark.sources import get_source

    pg, port, stop = start_mini_pg(user="u", password="pw")
    try:
        pg.canned["SELECT * FROM"] = (
            ["id", "name", "w"], [23, 25, 701],
            [(1, "a", "1.5"), (2, "b", "2.5"), (3, None, None)])
        src = get_source("Jdbc", {
            "url": f"jdbc:postgresql://127.0.0.1:{port}/db",
            "user": "u", "password": "pw", "table_path": "t5"})
        df = src.read(spark)
        assert df.columns == ["id", "name", "w"]
        assert [f.dataType.simpleString() for f in df.schema.fields] \
            == ["int", "string", "double"]
        rows = {r["id"]: r for r in df.collect()}
        assert rows[1]["w"] == 1.5 and rows[3]["name"] is None
    finally:
        stop()


def test_driverless_source_partitioned_read_mysql(spark):
    from seatunnel_spark.sources import get_source

    srv, port, stop = start_mini_mysql()
    try:
        srv.tables["t6"] = (["id", "v"], [8, 253],
                            [(i, f"v{i}") for i in range(10)])
        src = get_source("Mysql", {
            "url": f"jdbc:mysql://127.0.0.1:{port}/db", "user": "root",
            "table_path": "t6", "partition_column": "id",
            "partition_lower_bound": 0, "partition_upper_bound": 9,
            "partition_num": 3})
        df = src.read(spark)
        assert df.columns == ["id", "v"]
        got = {r["id"] for r in df.collect()}
        assert got == set(range(10))
        slices = [s for s in srv.statements if "st_src" in s]
        assert len(slices) == 3
        assert any("id >= 0" in s for s in slices)
    finally:
        stop()
