"""Reference connector-hbase-e2e confs running UNMODIFIED against the
mini HBase REST gateway (the `hbase rest` surface; the confs'
zookeeper_quorum host doubles as the gateway address under a host
alias — the reference's ZK + HBase-RPC client is the production path,
the gateway the no-native-client stand-in)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.hbase_server import start_mini_hbase

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-hbase-e2e/src/test/resources")


@pytest.fixture()
def hbase(monkeypatch):
    srv, port, stop = start_mini_hbase()
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"hbase_e2e:2181=http://127.0.0.1:{port}")
    yield srv
    stop()


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


def test_fake_to_hbase_and_read_back_confs(spark, hbase):
    """fake-to-hbase.conf writes 5 rows keyed by name into family
    `info`; hbase-to-assert.conf and the batch-query variant read them
    back through family-qualified columns + the conf's Assert rules."""
    _run(spark, "fake-to-hbase.conf")
    assert len(hbase.tables.get("seatunnel_test", {})) == 5
    _run(spark, "hbase-to-assert.conf")
    _run(spark, "hbase-source-to-assert-with-batch-query.conf")


def test_assign_cf_conf(spark, hbase):
    """fake-to-assign-cf-hbase.conf: family_name assigns c_double to
    cf1 and c_bigint to cf2 per column (HbaseIT.testAssignCf...)."""
    _run(spark, "fake-to-assign-cf-hbase.conf")
    rows = hbase.tables.get("assign_cf_table", {})
    assert rows
    key = next(iter(rows))
    cols = {__import__("base64").b64decode(c["column"]).decode()
            for c in rows[key]}
    fams = {c.split(":")[0] for c in cols}
    assert ("cf1" in fams) and ("cf2" in fams)
    assert any(c == "cf1:c_double" for c in cols)
    assert any(c == "cf2:c_bigint" for c in cols)


def test_array_conf(spark, hbase):
    """fake-to-hbase-array.conf: ARRAY cells serialize as the
    brackets-stripped comma join ("a,b,c"), matching
    HbaseSinkWriter.convertColumnToBytes."""
    _run(spark, "fake-to-hbase-array.conf")
    table = next(iter(hbase.tables))
    rows = hbase.tables[table]
    assert rows
    vals = [hbase.cell_text(table, k, c)
            for k in rows
            for c in {__import__("base64").b64decode(cc["column"]).decode()
                      for cc in rows[k]}]
    assert "a,b,c" in vals or "1,2,3" in vals, vals


def test_multipletable_write_and_read_confs(spark, hbase):
    """fake-to-hbase-with-multipletable.conf fans ${table_name} out to
    hbase_sink_1/2 (one row each, HbaseIT.testHbaseMultiTableSink).
    hbase-to-assert-with-multipletable.conf is ORPHANED in the
    reference (no IT references it); it reads seatunnel_test expecting
    exactly 11 rows, so the test seeds that table directly — the operator
    step an IT would have performed."""
    import base64 as _b64

    _run(spark, "fake-to-hbase-with-multipletable.conf")
    assert set(hbase.tables) >= {"hbase_sink_1", "hbase_sink_2"}
    assert len(hbase.tables["hbase_sink_1"]) == 1
    assert len(hbase.tables["hbase_sink_2"]) == 1

    def cell(qual, v):
        return {"column": _b64.b64encode(f"info:{qual}".encode()).decode(),
                "$": _b64.b64encode(str(v).encode()).decode()}

    t = hbase.tables.setdefault("seatunnel_test", {})
    for i in range(11):
        key = _b64.b64encode(f"n{i}".encode()).decode()
        t[key] = [cell("age", 20 + i), cell("c_double", 1.5),
                      cell("c_boolean", "true"), cell("c_bigint", 9),
                      cell("c_smallint", 2), cell("c_tinyint", 1),
                      cell("c_float", 0.5)]
    _run(spark, "hbase-to-assert-with-multipletable.conf")


def test_savemode_confs(spark, hbase):
    """The SchemaSaveMode × DataSaveMode conf family over the gateway's
    /schema DDL endpoints."""
    with pytest.raises(ValueError, match="ERROR_WHEN_SCHEMA_NOT_EXIST"):
        _run(spark, "fake_to_hbase_with_error_when_not_exists.conf")
    _run(spark, "fake_to_hbase_with_create_when_not_exists.conf")
    _run(spark, "fake_to_hbase_with_append_data.conf")
    _run(spark, "fake_to_hbase_with_recreate_schema.conf")
    _run(spark, "fake_to_hbase_with_drop_data.conf")
    with pytest.raises(ValueError, match="ERROR_WHEN_DATA_EXISTS"):
        _run(spark, "fake_to_hbase_with_error_when_data_exists.conf")
