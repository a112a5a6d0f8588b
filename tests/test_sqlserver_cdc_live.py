"""SqlServer-CDC LIVE over the TDS wire: the reference's own
connector-cdc-sqlserver-e2e confs run UNMODIFIED against the mini
SQL Server (PRELOGIN/LOGIN7 auth, snapshot SELECT, fn_cdc_get_max_lsn
watermark, fn_cdc_get_all_changes_<instance> poll) — no replay dir.
The sink side (jdbc:sqlserver) runs over the same TDS client: MERGE
upserts captured by the mini server."""

import datetime
from decimal import Decimal

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources.cdc_replay import CdcReplaySource
from seatunnel_spark.types import ROW_KIND_COL

_E2E = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-cdc-sqlserver-e2e/src/test/resources")

_FT_COLS = ["id", "val_varchar", "val_nvarchar", "val_decimal", "val_bit",
            "val_int", "val_bigint", "val_date", "val_datetime2",
            "val_money"]
_FT_DECLS = ["int", "varchar(1000)", "nvarchar(1000)", "decimal(6,3)",
             "bit", "int", "bigint", "date", "datetime2(7)", "money"]


def _row(i, **over):
    base = {"id": i, "val_varchar": f"vc{i}", "val_nvarchar": f"nv{i}",
            "val_decimal": Decimal("1.123"), "val_bit": True,
            "val_int": i * 100, "val_bigint": i * 10_000,
            "val_date": datetime.date(2018, 7, 13),
            "val_datetime2": datetime.datetime(2018, 7, 13, 11, 23, 45),
            "val_money": Decimal("6.3230")}
    base.update(over)
    return tuple(base[c] for c in _FT_COLS)


def _seed(srv, table, pk=("id",)):
    srv.tables[table] = (list(_FT_COLS), list(_FT_DECLS),
                         [_row(0), _row(1), _row(2)])
    srv.primary_keys[table] = list(pk)


@pytest.fixture()
def live_sqlserver(monkeypatch):
    from seatunnel_spark.testing.tds_server import start_mini_sqlserver

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    srv, port, stop = start_mini_sqlserver("sa", "Password!")
    for t in ("full_types", "full_types_custom_primary_key",
              "full_types_no_primary_key"):
        _seed(srv, t, pk=() if t == "full_types_no_primary_key"
              else ("id",))
    srv.mark_snapshot()
    # concurrent changes AFTER the snapshot watermark
    for t in ("full_types", "full_types_custom_primary_key",
              "full_types_no_primary_key"):
        srv.cdc_insert("dbo", t, [_row(3)])
        srv.cdc_update("dbo", t, [(_row(2), _row(2, val_int=999,
                                                 val_varchar="vc2b"))])
        srv.cdc_delete("dbo", t, [_row(1)])
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"sqlserver-host=tcp://127.0.0.1:{port}")
    yield srv, port
    stop()


def test_live_ct_poll_stitch(spark, live_sqlserver):
    """Snapshot + post-watermark CT changes stitch to the correct
    changelog: snapshot rows as +I, the fn_cdc_get_all_changes rows
    (op 2/3+4/1) as +I/-U+U/-D with exact decoded values."""
    src = CdcReplaySource({
        "base-url": "jdbc:sqlserver://sqlserver-host:1433;"
                    "databaseName=column_type_test",
        "username": "sa", "password": "Password!",
        "database-names": ["column_type_test"],
        "table-names": ["column_type_test.dbo.full_types"],
    })
    src.plugin_name = "SqlServer-CDC"
    df = src.read(spark)
    rows = df.collect()
    kinds = sorted(r[ROW_KIND_COL] for r in rows)
    assert kinds == ["+I", "+I", "+I", "+I", "+U", "-D", "-U"]

    from seatunnel_spark.sources.cdc import final_state

    final = {r["id"]: r for r in final_state(
        df, ["id"], "__offset").collect()}
    assert set(final) == {0, 2, 3}  # 1 deleted
    assert final[2]["val_int"] == 999
    assert final[2]["val_varchar"] == "vc2b"
    assert final[2]["val_decimal"] == Decimal("1.1230000000")
    assert final[3]["val_bigint"] == 30_000
    assert final[3]["val_date"] == datetime.date(2018, 7, 13)
    # PK discovered over INFORMATION_SCHEMA (no table-names-config)
    assert src.discovered_keys["full_types"] == ["id"]
    # the watermark + poll really hit the documented CDC surface
    srv, _ = live_sqlserver
    assert any("fn_cdc_get_max_lsn" in s for s in srv.statements)
    assert any("fn_cdc_get_all_changes_dbo_full_types" in s
               for s in srv.statements)


def test_sqlservercdc_to_console_conf(spark, live_sqlserver):
    """sqlservercdc_to_console.conf runs UNMODIFIED live: SqlServer-CDC
    source over TDS + jdbc:sqlserver sink over TDS (MERGE upserts into
    dbo.full_types_sink, captured by the mini server)."""
    spec = JobSpec.from_file(f"{_E2E}/sqlservercdc_to_console.conf")
    JobEngine(spark).run(spec)
    srv, _ = live_sqlserver
    merges = [s for s in srv.statements if "full_types_sink" in s]
    assert merges, "jdbc sink produced no statements"
    blob = " ".join(merges)
    assert "999" in blob       # the updated val_int arrived
    assert "vc3" in blob       # the CT-inserted row arrived
    assert "MERGE INTO" in blob.upper()  # dialect upsert, not plain insert
    # the declared sink database is part of the target identifier
    assert "column_type_test" in blob


def test_sqlservercdc_custom_primary_key_conf(spark, live_sqlserver):
    """sqlservercdc_to_sqlserver_with_custom_primary_key.conf:
    table-names-config primaryKeys drive the upsert key — no
    INFORMATION_SCHEMA discovery needed."""
    spec = JobSpec.from_file(
        f"{_E2E}/sqlservercdc_to_sqlserver_with_custom_primary_key.conf")
    JobEngine(spark).run(spec)
    srv, _ = live_sqlserver
    merges = [s for s in srv.statements if "full_types_sink" in s]
    assert merges
    assert any("MERGE INTO" in s.upper() for s in merges)


def test_sqlservercdc_no_primary_key_conf(spark, live_sqlserver):
    """sqlservercdc_to_sqlserver_with_no_primary_key.conf: the source
    table has no PK; the sink conf still declares primary_keys=[id]
    (the reference IT's shape) so the changelog applies by that key."""
    spec = JobSpec.from_file(
        f"{_E2E}/sqlservercdc_to_sqlserver_with_no_primary_key.conf")
    JobEngine(spark).run(spec)
    srv, _ = live_sqlserver
    assert any("full_types_sink" in s for s in srv.statements)


def test_sqlservercdc_metadata_trans_conf(spark, live_sqlserver):
    """sqlservercdc_to_metadata_trans.conf: Metadata transform over the
    live CT feed; Assert NOT_NULL rules all pass."""
    spec = JobSpec.from_file(f"{_E2E}/sqlservercdc_to_metadata_trans.conf")
    JobEngine(spark).run(spec)
    srv, _ = live_sqlserver
    assert any("fn_cdc_get_all_changes_dbo_full_types_custom_primary_key"
               in s for s in srv.statements)


def test_tds_auth_failure_fails_job(spark, live_sqlserver):
    srv, port = live_sqlserver
    src = CdcReplaySource({
        "base-url": "jdbc:sqlserver://sqlserver-host:1433",
        "username": "sa", "password": "wrong",
        "table-names": ["column_type_test.dbo.full_types"],
    })
    src.plugin_name = "SqlServer-CDC"
    with pytest.raises(Exception, match="[Ll]ogin"):
        src.read(spark)
    assert srv.auth_failures >= 1


def test_snapshot_and_watermark_share_a_transaction(spark,
                                                    live_sqlserver):
    """The max_lsn watermark is read INSIDE the same REPEATABLE-READ
    transaction as the snapshot SELECT (Debezium's
    SqlServerSnapshotChangeEventSource contract; repeatable_read is
    its default because SNAPSHOT isolation needs a non-default
    database option) — a watermark taken outside would double-apply
    changes committed in between."""
    srv, _ = live_sqlserver
    src = CdcReplaySource({
        "base-url": "jdbc:sqlserver://sqlserver-host:1433;"
                    "databaseName=column_type_test",
        "username": "sa", "password": "Password!",
        "database-names": ["column_type_test"],
        "table-names": ["column_type_test.dbo.full_types"],
    })
    src.plugin_name = "SqlServer-CDC"
    src.read(spark)
    stmts = [s.upper() for s in srv.statements]
    begin = next(i for i, s in enumerate(stmts)
                 if s.startswith("BEGIN TRANSACTION"))
    commit = next(i for i, s in enumerate(stmts)
                  if s.startswith("COMMIT"))
    wm = next(i for i, s in enumerate(stmts)
              if "FN_CDC_GET_MAX_LSN" in s)
    snap = next(i for i, s in enumerate(stmts)
                if "FROM [COLUMN_TYPE_TEST].[DBO].[FULL_TYPES]" in s)
    assert begin < wm < snap < commit
    assert any(s.startswith("SET TRANSACTION ISOLATION LEVEL "
                            "REPEATABLE READ")
               for s in stmts)


def test_dangling_update_before_raises(spark, live_sqlserver):
    """An op-3 (update-before) with no op-4 partner at the end of the
    CT poll is a truncated feed — the source must fail loudly, not
    drop the update."""
    srv, _ = live_sqlserver
    inst = srv._cdc["dbo_full_types"]
    inst.append((srv._next_lsn(), 3, _row(0)))  # op-3, no op-4
    src = CdcReplaySource({
        "base-url": "jdbc:sqlserver://sqlserver-host:1433;"
                    "databaseName=column_type_test",
        "username": "sa", "password": "Password!",
        "database-names": ["column_type_test"],
        "table-names": ["column_type_test.dbo.full_types"],
    })
    src.plugin_name = "SqlServer-CDC"
    with pytest.raises(ValueError, match="dangling update-before"):
        src.read(spark)
