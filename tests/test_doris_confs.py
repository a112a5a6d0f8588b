"""Reference doris-e2e confs unmodified against the mini Stream Load
FE (DorisCDCSinkIT / DorisIT analogs)."""

import json
import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.rest_servers import start_mini_streamload

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-doris-e2e/src/test/resources")


def _ev(op, table, pos, ts, before=None, after=None, db="mysql_cdc"):
    return json.dumps({"before": before, "after": after, "op": op,
                       "ts_ms": ts,
                       "source": {"db": db, "table": table, "pos": pos}})


@pytest.fixture()
def doris(monkeypatch, tmp_path):
    state, port, stop = start_mini_streamload()
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"doris_e2e=http://127.0.0.1:{port}")
    # debezium replay feed for mysql_cdc.mysql_cdc_e2e_source_table
    t = tmp_path / "mysql_cdc.mysql_cdc_e2e_source_table"
    t.mkdir(parents=True)
    lines = [
        _ev("r", "mysql_cdc_e2e_source_table", 101, 1001,
            after={"id": 1, "f_int": 10, "f_varchar": "v1"}),
        _ev("r", "mysql_cdc_e2e_source_table", 102, 1002,
            after={"id": 2, "f_int": 20, "f_varchar": "v2"}),
        _ev("u", "mysql_cdc_e2e_source_table", 200, 2000,
            before={"id": 2, "f_int": 20, "f_varchar": "v2"},
            after={"id": 2, "f_int": 21, "f_varchar": "v2b"}),
        _ev("d", "mysql_cdc_e2e_source_table", 210, 2100,
            before={"id": 1, "f_int": 10, "f_varchar": "v1"}),
    ]
    (t / "changelog.jsonl").write_text("\n".join(lines) + "\n")
    (t / "schema.json").write_text(json.dumps(
        {"id": "int", "f_int": "int", "f_varchar": "string"}))
    monkeypatch.setenv("SEATUNNEL_SPARK_CDC_REPLAY", str(tmp_path))
    yield state, port
    stop()


def test_write_cdc_changelog_to_doris_conf(spark, doris):
    """write-cdc-changelog-to-doris.conf: MySQL-CDC (replay feed) ->
    Doris CSV stream load with sink.enable-delete — the batches carry
    the __DORIS_DELETE_SIGN__ bit for -U/-D rows (DorisCDCSinkIT)."""
    state, _ = doris
    spec = JobSpec.from_file(f"{_RES}/write-cdc-changelog-to-doris.conf")
    spec.env["streaming.await.timeout"] = 10
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()
    rows = state[("test", "e2e_table_sink")]
    assert rows, "stream load received no batches"
    # final per-key event: id=2 upserted (f_int 21), id=1 delete-signed
    last = {}
    for r in rows:
        last[r.get("id")] = r
    assert str(last[1].get("__DORIS_DELETE_SIGN__")) == "1"
    assert str(last[2].get("__DORIS_DELETE_SIGN__")) == "0"
    assert last[2].get("f_int") == 21


def test_doris_sink_timeout_error_conf(spark, monkeypatch):
    """fake_source_and_doris_sink_timeout_error.conf: the FE endpoint
    is unreachable; with job.retry.times=0 the job must fail (the IT
    asserts a non-zero exit)."""
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        "doris_e2e=http://127.0.0.1:1")  # closed port
    with pytest.raises(Exception):
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/fake_source_and_doris_sink_timeout_error.conf"))


# ---------------------------------------------------------------------------
# Doris SOURCE confs: FE mysql-protocol reads (mini MySQL on the 9030
# alias) fanned into the Stream Load sink (mini FE on the 8030 alias) —
# exercises the port-aware host aliases.
# ---------------------------------------------------------------------------

from seatunnel_spark.testing.mysql_server import start_mini_mysql  # noqa: E402

_LONGLONG, _VARSTR = 8, 253


def _seed_unique_table(mysql, name, n, start=1):
    spec = JobSpec.from_file(f"{_RES}/doris_source_and_sink.conf")
    proj = [c.strip() for c in
            spec.sources[0].options["doris.read.field"].split(",")]
    types = [_LONGLONG if c == "F_ID" else _VARSTR for c in proj]
    rows = [tuple(i if c == "F_ID" else f"x{i}" for c in proj)
            for i in range(start, start + n)]
    mysql.tables[name] = (proj, types, rows)
    return proj


@pytest.fixture()
def doris_both(monkeypatch):
    state, sl_port, sl_stop = start_mini_streamload()
    mysql, my_port, my_stop = start_mini_mysql(user="root", password="")
    monkeypatch.setitem(
        os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
        f"doris_e2e:8030=http://127.0.0.1:{sl_port},"
        f"doris_e2e:9030=tcp://127.0.0.1:{my_port}")
    yield state, mysql
    sl_stop()
    my_stop()


@pytest.mark.parametrize("conf", ["doris_source_and_sink.conf",
                                  "doris_source_and_sink_2pc_false.conf"])
def test_doris_source_and_sink_confs(spark, doris_both, conf):
    """FE read with doris.read.field projection + doris.filter.query
    pushdown (F_ID > 50 over ids 1..100 -> 50 rows) stream-loaded into
    the sink table (DorisIT.testDorisSourceAndSink)."""
    state, mysql = doris_both
    proj = _seed_unique_table(mysql, "doris_e2e_unique_table", 100)
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
    rows = state[("e2e_sink", "doris_e2e_unique_table")]
    assert len(rows) == 50
    assert all(r["F_ID"] > 50 for r in rows)
    assert set(rows[0].keys()) == set(proj)
    # the filter reached the FE SELECT (pushdown, not post-scan)
    assert any("F_ID > 50" in s for s in mysql.statements)
    state.clear()


def test_doris_multi_source_to_assert_conf(spark, doris_both):
    """table_list with two FE tables routed per table into Assert's
    tables_configs row rules (50 and 40 rows)."""
    _state, mysql = doris_both
    # table0 filter F_ID >= 50 must yield 50 rows; table1 F_ID < 40 -> 40
    _seed_unique_table(mysql, "doris_e2e_unique_table_0", 60, start=40)
    _seed_unique_table(mysql, "doris_e2e_unique_table_1", 60, start=0)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/doris_multi_source_to_assert.conf"))


def test_doris_source_no_schema_conf(spark, doris_both):
    """doris_source_no_schema.conf: FE read WITHOUT doris.read.field
    (SELECT *), filter pushdown, RECREATE_SCHEMA on the sink — the
    save-mode handler drops + recreates the sink table over the FE SQL
    port before stream loading."""
    state, mysql = doris_both
    _seed_unique_table(mysql, "doris_e2e_unique_table", 100)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/doris_source_no_schema.conf"))
    rows = state[("e2e_sink", "doris_e2e_unique_table")]
    assert len(rows) == 50 and all(r["F_ID"] > 50 for r in rows)
    drops = [s for s in mysql.statements if s.upper().startswith(
        "DROP TABLE IF EXISTS") and "doris_e2e_unique_table" in s]
    creates = [s for s in mysql.statements
               if s.upper().startswith("CREATE TABLE") and
               "doris_e2e_unique_table" in s]
    assert drops and creates
    state.clear()


def test_doris_custom_sql_savemode_conf(spark, doris_both):
    """doris_source_and_sink_with_custom_sql.conf: FakeSource ->
    data_save_mode=CUSTOM_PROCESSING executes the conf's custom_sql
    over the FE SQL port, and the custom save_mode_create_template
    (unique-key DDL with placeholders) renders with the frame's
    columns."""
    state, mysql = doris_both
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/doris_source_and_sink_with_custom_sql.conf"))
    rows = state[("e2e_sink", "doris_e2e_unique_table")]
    assert len(rows) == 100
    customs = [s for s in mysql.statements if "VALUES (1, 123," in s]
    assert customs, "custom_sql did not reach the FE"
    creates = [s for s in mysql.statements
               if s.upper().startswith("CREATE TABLE")]
    assert creates and "unique KEY (`F_ID`)" in creates[-1]
    assert "`F_DECIMAL` DECIMAL(10,2)" in creates[-1]
    assert "${rowtype_fields}" not in creates[-1]
    state.clear()


def test_doris_type_convertor_conf(spark, doris_both):
    """doris_source_to_doris_sink_type_convertor.conf: duplicate-key
    table read -> ${table_name} placeholder sink with RECREATE_SCHEMA
    and a duplicate-key template (${rowtype_duplicate_key})."""
    state, mysql = doris_both
    _seed_unique_table(mysql, "doris_duplicate_table", 10)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/doris_source_to_doris_sink_type_convertor.conf"))
    # ${table_name} resolves to the source table's name
    key = next(k for k in state if k[0] == "e2e_sink")
    assert key[1] == "doris_duplicate_table"
    assert len(state[key]) == 10
    creates = [s for s in mysql.statements
               if s.upper().startswith("CREATE TABLE")]
    assert creates and "duplicate KEY (`F_ID`)" in creates[-1]
    state.clear()


@pytest.mark.parametrize("conf", ["doris_multi_source_to_sink.conf",
                                  "doris_multi_source_to_sink_2pc_false.conf"])
def test_doris_multi_source_to_sink_confs(spark, doris_both, conf):
    """table_list with two FE tables, each filtered, routed into the
    ${table_name} sink — one stream-load target per source table."""
    state, mysql = doris_both
    _seed_unique_table(mysql, "doris_e2e_unique_table_0", 60, start=40)
    _seed_unique_table(mysql, "doris_e2e_unique_table_1", 60, start=0)
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
    t0 = state[("e2e_sink", "doris_e2e_unique_table_0")]
    t1 = state[("e2e_sink", "doris_e2e_unique_table_1")]
    assert len(t0) == 50 and all(r["F_ID"] >= 50 for r in t0)
    assert len(t1) == 40 and all(r["F_ID"] < 40 for r in t1)
    state.clear()


def test_live_mysqlcdc_to_doris_schema_change_conf(spark, monkeypatch):
    """mysqlcdc_to_doris_with_schema_change.conf runs UNMODIFIED live:
    binlog tail (with a mid-stream ALTER) into the Doris stream-load
    sink — post-DDL rows carry the added column, deletes ride the
    delete sign."""
    from seatunnel_spark import mysql_binlog as B
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    state, sl_port, sl_stop = start_mini_streamload()
    srv, my_port, my_stop = start_mini_mysql("st_user_source", "mysqlpw")
    try:
        cols = ["id", "name", "description", "weight"]
        srv.tables["products"] = (cols, [3, 253, 253, 5], [
            (101, "scooter", "Small 2-wheel scooter", 3.14)])
        srv.primary_keys["products"] = ["id"]
        bcols = [(B.T_LONG, None), (B.T_VARCHAR, 400),
                 (B.T_VARCHAR, 2000), (B.T_DOUBLE, None)]
        srv.binlog_table("shop", "products", bcols)
        srv.mark_snapshot()
        srv.binlog_ddl("shop", "ALTER TABLE products ADD COLUMN "
                               "add_column1 varchar(64)")
        srv.binlog_table("shop", "products", bcols + [(B.T_VARCHAR, 256)])
        srv.binlog_insert("shop", "products",
                          [(103, "hammer", "12oz", 0.75, "yy")])
        srv.binlog_delete("shop", "products",
                          [(101, "scooter", "Small 2-wheel scooter",
                            3.14, None)])
        monkeypatch.setitem(
            os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
            f"doris_e2e=http://127.0.0.1:{sl_port},"
            f"mysql_cdc_e2e=tcp://127.0.0.1:{my_port}")
        spec = JobSpec.from_file(
            f"{_RES}/mysqlcdc_to_doris_with_schema_change.conf")
        JobEngine(spark).run(spec)

        rows = state[("shop", "products")]
        last = {}
        for r in rows:
            last[r.get("id")] = r
        assert str(last[101]["__DORIS_DELETE_SIGN__"]) == "1"
        assert last[103]["add_column1"] == "yy"
        assert str(last[103]["__DORIS_DELETE_SIGN__"]) == "0"
    finally:
        sl_stop()
        my_stop()
