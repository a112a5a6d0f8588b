"""Postgres-CDC LIVE over pgoutput logical replication: the reference's
connector-cdc-postgres-e2e confs run unmodified against the mini PG
master (replication-mode startup, CREATE_REPLICATION_SLOT,
START_REPLICATION, XLogData/pgoutput decode) — no replay directory.
The conf's `decoding.plugin.name = decoderbufs` picks the server-side
plugin on a real cluster; the mini master speaks pgoutput."""

import datetime as dt
import os
from decimal import Decimal

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.pg_server import start_mini_pg

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-cdc-postgres-e2e/src/test/resources")

_COLS = ["id", "f_bytea", "f_small", "f_int", "f_big", "f_real",
         "f_double_precision", "f_numeric", "f_decimal", "f_boolean",
         "f_text", "f_char", "f_character", "f_character_varying",
         "f_timestamp3", "f_timestamp6", "f_date", "f_time",
         "f_default_numeric", "f_inet"]
_OIDS = [23, 17, 21, 23, 20, 700, 701, 1700, 1700, 16, 25, 1042, 1042,
         1043, 1114, 1114, 1082, 1083, 1700, 869]


def _row(i):
    return (i, r"\x0102", 100 + i, i * 10, 2 ** 40 + i, 1.5, 2.25,
            Decimal("3.14159"), Decimal("9.1"), "t", f"text{i}", "c",
            "abc", f"vc{i}", "2024-03-19 12:00:00", "2024-03-19 12:00:00",
            "2024-03-19", "13:30:01", Decimal("7"), "10.0.0.1")


def _wal_row(i):
    # text-format pgoutput cells (server-side representation)
    return [str(v) for v in _row(i)]


@pytest.fixture()
def live_pg(monkeypatch):
    from seatunnel_spark.pg_logical import lsn_str

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    pg, port, stop = start_mini_pg("postgres", "postgres")
    pg.wal_table("inventory", "postgres_cdc_table_1",
                 list(zip(_COLS, _OIDS)))
    pg.mark_snapshot()
    # concurrent changes after the snapshot mark
    pg.wal_insert("inventory", "postgres_cdc_table_1", [_wal_row(3)])
    pg.wal_update("inventory", "postgres_cdc_table_1",
                  [(_wal_row(2),
                    [str(v) for v in (2, r"\x0102", 102, 999, 2 ** 40 + 2,
                                      1.5, 2.25, Decimal("3.14159"),
                                      Decimal("9.1"), "t", "text2b", "c",
                                      "abc", "vc2", "2024-03-19 12:00:00",
                                      "2024-03-19 12:00:00", "2024-03-19",
                                      "13:30:01", Decimal("7"),
                                      "10.0.0.1")])])
    pg.wal_delete("inventory", "postgres_cdc_table_1", [_wal_row(1)])
    pg.canned["SELECT PG_CURRENT_WAL_LSN"] = (
        ["pg_current_wal_lsn"], [25], [(lsn_str(pg.snapshot_lsn),)])
    pg.canned["SELECT * FROM INVENTORY.POSTGRES_CDC_TABLE_1"] = (
        _COLS, _OIDS, [_row(1), _row(2)])
    pg.canned["SELECT A.ATTNAME"] = (["attname"], [25], [("id",)])
    # the jdbc sink's schema probe: sink table exists with same columns
    pg.canned["SELECT * FROM INVENTORY.SINK_POSTGRES_CDC_TABLE_1"] = (
        _COLS, _OIDS, [])
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"postgres_cdc_e2e=tcp://127.0.0.1:{port}")
    yield pg, port
    stop()


def test_live_pg_logical_stitch(spark, live_pg):
    """Snapshot + pgoutput-tailed WAL stitch to the correct final
    state: post-watermark insert/update/delete applied over the
    snapshot with typed values (numeric/date/timestamp through the
    text-format tuple decode)."""
    from seatunnel_spark.sources.cdc import final_state
    from seatunnel_spark.sources.cdc_replay import CdcReplaySource

    src = CdcReplaySource({
        "base-url": "jdbc:postgresql://postgres_cdc_e2e:5432/"
                    "postgres_cdc?loggerLevel=OFF",
        "username": "postgres", "password": "postgres",
        "table-names": ["postgres_cdc.inventory.postgres_cdc_table_1"],
    })
    src.plugin_name = "Postgres-CDC"
    df = src.read(spark)
    kinds = sorted(r["__row_kind"] for r in df.collect())
    assert kinds == ["+I", "+I", "+I", "+U", "-D", "-U"]
    final = {r["id"]: r for r in final_state(df, ["id"],
                                             "__offset").collect()}
    assert set(final) == {2, 3}  # 1 deleted, 3 inserted
    assert final[2]["f_int"] == 999 and final[2]["f_text"] == "text2b"
    assert final[3]["f_numeric"] == Decimal("3.14159")
    assert final[3]["f_date"] == dt.date(2024, 3, 19)
    assert src.discovered_keys["postgres_cdc_table_1"] == ["id"]


def test_live_pgcdc_to_postgres_conf_runs_unmodified(spark, live_pg):
    """postgrescdc_to_postgres.conf: Postgres-CDC (live logical
    replication) -> jdbc pg sink with generate_sink_sql; the sink's
    upserts land over the pg wire and reflect the post-watermark
    changes."""
    pg, _ = live_pg
    spec = JobSpec.from_file(f"{_RES}/postgrescdc_to_postgres.conf")
    JobEngine(spark).run(spec)
    assert any("START_REPLICATION" in s for s in pg.statements)
    writes = [s for s in pg.statements
              if "sink_postgres_cdc_table_1" in s.lower()
              and s.upper().startswith(("INSERT", "UPDATE", "DELETE"))]
    assert writes, "jdbc sink produced no DML"
    blob = " ".join(writes)
    assert "999" in blob and "text2b" in blob  # updated row arrived
    assert "text3" in blob                     # inserted row arrived


def test_live_pgcdc_metadata_trans_conf(spark, live_pg):
    """postgrescdc_to_metadata_trans.conf: live replication feed
    through the Metadata transform + Assert NOT_NULL rules."""
    spec = JobSpec.from_file(f"{_RES}/postgrescdc_to_metadata_trans.conf")
    JobEngine(spark).run(spec)


def test_live_opengauss_metadata_trans_conf(spark, monkeypatch):
    """opengausscdc_to_meatadata_trans.conf runs UNMODIFIED live:
    OpenGauss speaks the PG wire + pgoutput, so the same logical
    replication path serves it (jdbc:opengauss:// base-url routes to
    the pg live mode)."""
    from seatunnel_spark.pg_logical import lsn_str

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    pg, port, stop = start_mini_pg("gaussdb", "openGauss@123")
    pg.users["dailai"] = "openGauss@123"  # the confs' sink role
    try:
        cols = ["id", "name", "description", "weight"]
        oids = [23, 25, 25, 701]
        pg.wal_table("inventory", "opengauss_cdc_table_1",
                     list(zip(cols, oids)))
        pg.mark_snapshot()
        pg.wal_insert("inventory", "opengauss_cdc_table_1",
                      [["110", "spare tire", "24 inch", "22.2"]])
        pg.canned["SELECT PG_CURRENT_WAL_LSN"] = (
            ["pg_current_wal_lsn"], [25], [(lsn_str(pg.snapshot_lsn),)])
        pg.canned["SELECT * FROM INVENTORY.OPENGAUSS_CDC_TABLE_1"] = (
            cols, oids, [(101, "scooter", "small", 3.14)])
        pg.canned["SELECT A.ATTNAME"] = (["attname"], [25], [("id",)])
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"opengauss_cdc_e2e=tcp://127.0.0.1:{port}")
        conf = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
                "connector-cdc-opengauss-e2e/src/test/resources/"
                "opengausscdc_to_meatadata_trans.conf")
        JobEngine(spark).run(JobSpec.from_file(conf))
        assert any("START_REPLICATION" in s for s in pg.statements)
    finally:
        stop()


def _pg_seed_simple(pg, schema, table, snapshot_rows):
    from seatunnel_spark.pg_logical import lsn_str

    cols = [("id", 23), ("name", 25)]
    pg.wal_table(schema, table, cols)
    pg.canned[f"SELECT * FROM {schema.upper()}.{table.upper()}"] = (
        ["id", "name"], [23, 25], snapshot_rows)
    return cols


@pytest.mark.parametrize("conf,tables", [
    ("pgcdc_to_pg_with_multi_table_mode_one_table",
     ["postgres_cdc_table_1"]),
    ("pgcdc_to_pg_with_multi_table_mode_two_table",
     ["postgres_cdc_table_1", "postgres_cdc_table_2"]),
    ("postgrescdc_to_postgres_with_custom_primary_key",
     ["full_types_no_primary_key"]),
    ("postgrescdc_to_postgres_with_no_primary_key",
     ["full_types_no_primary_key"]),
    ("postgrescdc_to_postgres_test_add_Filed",
     ["postgres_cdc_table_3"]),
])
def test_live_pgcdc_variant_confs(spark, monkeypatch, conf, tables):
    """The remaining pgcdc conf variants run UNMODIFIED live over
    pgoutput: multi-table mode, custom primary keys via
    table-names-config, no-primary-key append, and the add-field
    table."""
    from seatunnel_spark.pg_logical import lsn_str

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    pg, port, stop = start_mini_pg("postgres", "postgres")
    try:
        for t in tables:
            _pg_seed_simple(pg, "inventory", t, [(1, "a")])
        pg.mark_snapshot()
        for t in tables:
            pg.wal_insert("inventory", t, [["9", "new9"]])
        pg.canned["SELECT PG_CURRENT_WAL_LSN"] = (
            ["pg_current_wal_lsn"], [25], [(lsn_str(pg.snapshot_lsn),)])
        pg.canned["SELECT A.ATTNAME"] = (["attname"], [25], [("id",)])
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"postgres_cdc_e2e=tcp://127.0.0.1:{port}")
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}.conf"))
        ins = " ".join(s for s in pg.statements
                       if s.upper().startswith("INSERT"))
        assert "new9" in ins
    finally:
        stop()


_OG_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
           "connector-cdc-opengauss-e2e/src/test/resources")


@pytest.mark.parametrize("conf,tables", [
    ("opengausscdc_to_opengauss", ["opengauss_cdc_table_1"]),
    ("opengausscdc_to_opengauss_test_add_Filed",
     ["opengauss_cdc_table_3"]),
    ("opengausscdc_to_opengauss_with_custom_primary_key",
     ["full_types_no_primary_key"]),
    ("opengausscdc_to_opengauss_with_no_primary_key",
     ["full_types_no_primary_key"]),
    ("opengausscdc_to_opengauss_with_multi_table_mode_one_table",
     ["opengauss_cdc_table_1"]),
    ("opengausscdc_to_opengauss_with_multi_table_mode_two_table",
     ["opengauss_cdc_table_1", "opengauss_cdc_table_2"]),
])
def test_live_opengausscdc_variant_confs(spark, monkeypatch, conf, tables):
    """The six opengausscdc_to_opengauss confs run UNMODIFIED live:
    openGauss speaks the postgres wire + pgoutput, so the same
    replication client serves them (jdbc:postgresql base-url with the
    opengauss_cdc_e2e host alias); single-table upserts, custom/no
    primary keys, add-field, and ${tablePrefix} multi-table fan-out."""
    from seatunnel_spark.pg_logical import lsn_str

    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    pg, port, stop = start_mini_pg("gaussdb", "openGauss@123")
    pg.users["dailai"] = "openGauss@123"  # the confs' sink role
    try:
        for t in tables:
            _pg_seed_simple(pg, "inventory", t, [(1, "a")])
        pg.mark_snapshot()
        for t in tables:
            pg.wal_insert("inventory", t, [["9", "new9"]])
        pg.canned["SELECT PG_CURRENT_WAL_LSN"] = (
            ["pg_current_wal_lsn"], [25], [(lsn_str(pg.snapshot_lsn),)])
        pg.canned["SELECT A.ATTNAME"] = (["attname"], [25], [("id",)])
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"opengauss_cdc_e2e=tcp://127.0.0.1:{port}")
        JobEngine(spark).run(JobSpec.from_file(f"{_OG_RES}/{conf}.conf"))
        ins = " ".join(s for s in pg.statements
                       if s.upper().startswith("INSERT"))
        assert "new9" in ins
        if "multi_table" in conf:  # ${tablePrefix} routing
            for t in tables:
                assert f"sink_{t}" in ins
    finally:
        stop()
