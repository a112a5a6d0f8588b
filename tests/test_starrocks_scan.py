"""StarRocks native scan path: FE _query_plan REST + BE thrift Arrow
scan (the reference's StarRocksSourceReader flow), including
starrocks-thrift-to-starrocks-streamload.conf UNMODIFIED — thrift
source into the Stream-Load sink with RECREATE_SCHEMA save mode."""

import datetime
from decimal import Decimal

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.starrocks_scan_server import (
    start_mini_starrocks_scan,
)

_SR = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
       "connector-starrocks-e2e/src/test/resources")

_COLS = ["BIGINT_COL", "LARGEINT_COL", "SMALLINT_COL", "TINYINT_COL",
         "BOOLEAN_COL", "DECIMAL_COL", "DOUBLE_COL", "FLOAT_COL",
         "INT_COL", "CHAR_COL", "VARCHAR_11_COL", "STRING_COL",
         "DATETIME_COL", "DATE_COL"]


def _row(i):
    return (10_000_000_000 + i, str(1 << 70), 100 + i, i % 100, i % 2 == 0,
            Decimal(f"{i}.5"), i * 1.25, float(i) / 2, i,
            f"c{i}", f"v{i}", f"s{i}",
            datetime.datetime(2023, 9, 4, 10, 30, i % 60),
            datetime.date(2023, 9, 4))


@pytest.fixture()
def sr(monkeypatch):
    srv, fe_port, be_port, stop = start_mini_starrocks_scan("root", "")
    srv.tables[("test", "e2e_table_source")] = (list(_COLS),
                                                [_row(i)
                                                 for i in range(10)])
    yield srv, fe_port, be_port
    stop()


def test_scan_partition_roundtrip(spark, sr):
    """Plan fetch -> least-loaded BE tablet assignment -> thrift
    open/get_next/close with Arrow decode, full type matrix."""
    from seatunnel_spark.starrocks_scan import (
        assign_tablets,
        fetch_query_plan,
        scan_partition,
    )

    srv, fe_port, _ = sr
    plan, partitions = fetch_query_plan(
        f"127.0.0.1:{fe_port}", "test", "e2e_table_source",
        "select " + ", ".join(f"`{c}`" for c in _COLS)
        + " from `test`.`e2e_table_source`", "root", "")
    assert len(partitions) == 3  # three tablets
    parts = assign_tablets(partitions)
    rows = []
    for be, tablets in parts:
        rows += list(scan_partition(be, "test", "e2e_table_source",
                                    tablets, plan, "root", ""))
    assert sorted(r[0] for r in rows) == [10_000_000_000 + i
                                          for i in range(10)]
    first = min(rows, key=lambda r: r[0])
    assert first == _row(0)
    assert srv.scan_opens and srv.scan_opens[0]["db"] == "test"


def test_scan_auth_reject(sr):
    from seatunnel_spark.starrocks_scan import (
        StarRocksScanError,
        fetch_query_plan,
        scan_partition,
    )

    srv, fe_port, be_port = sr
    with pytest.raises(Exception):  # 401 from the FE
        fetch_query_plan(f"127.0.0.1:{fe_port}", "test",
                         "e2e_table_source", "select 1", "root", "bad")
    assert srv.auth_failures >= 1
    plan, _ = fetch_query_plan(
        f"127.0.0.1:{fe_port}", "test", "e2e_table_source",
        "select `BIGINT_COL` from t", "root", "")
    with pytest.raises(StarRocksScanError, match="auth"):
        list(scan_partition(f"127.0.0.1:{be_port}", "test",
                            "e2e_table_source", [10000], plan,
                            "root", "bad"))


def test_thrift_conf_runs_unmodified(spark, sr, monkeypatch):
    """starrocks-thrift-to-starrocks-streamload.conf: native scan
    source (FE _query_plan + BE thrift Arrow) -> RECREATE_SCHEMA DDL
    via the conf's save_mode_create_template on the FE SQL port ->
    Stream Load JSON sink on the same FE HTTP port (the real 8030
    serves both endpoints; StarRocksIT.testStarRocksSource shape)."""
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    srv, fe_port, be_port = sr
    fesql, my_port, my_stop = start_mini_mysql("root", "")
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_HOST_ALIASES",
        f"starrocks_e2e:8030=http://127.0.0.1:{fe_port},"
        f"starrocks_e2e:9030=tcp://127.0.0.1:{my_port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_SR}/starrocks-thrift-to-starrocks-streamload.conf"))
    finally:
        my_stop()
    # source really went through the native scan path
    assert any("_query_plan" not in s and "select" in s.lower()
               for s in srv.statements)
    assert srv.scan_opens, "BE thrift scan never opened"
    # RECREATE_SCHEMA DDL used the conf's save_mode_create_template
    ddl = " ".join(fesql.statements).upper()
    assert "CREATE TABLE" in ddl and "E2E_TABLE_SINK" in ddl
    # all 10 source rows landed through stream load
    rows = srv.loaded.get(("test", "e2e_table_sink"), [])
    assert len(rows) == 10
    assert {r["BIGINT_COL"] for r in rows} == {
        10_000_000_000 + i for i in range(10)}
