"""More lakehouse + pulsar-cdc reference confs unmodified."""

import json
import os
import shutil

import duckdb
import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources import get_source

_E2E = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e"
_HUDI = f"{_E2E}/connector-hudi-e2e/src/test/resources/hudi"
_ICE = f"{_E2E}/connector-iceberg-e2e/src/test/resources"
_PULSAR = f"{_E2E}/connector-pulsar-e2e/src/test/resources"


def _hudi_read(spark, opts):
    base = str(opts.get("table_dfs_path", "/tmp/hudi")).replace("file://", "")
    return get_source("Hudi", {
        "table_dfs_path": base,
        "database": opts.get("database", "default"),
        "table_name": opts["table_name"]}).read(spark)


def test_fake_to_hudi_conf(spark):
    spec = JobSpec.from_file(f"{_HUDI}/fake_to_hudi.conf")
    sink = next(b for b in spec.sinks if b.plugin.lower() == "hudi").options
    shutil.rmtree("/tmp/hudi", ignore_errors=True)
    JobEngine(spark).run(spec)
    src = spec.sources[0].options
    expected = (len(src["rows"]) if src.get("rows")
                else int(src.get("row.num", 5)))  # FakeSource default
    assert _hudi_read(spark, sink).count() == expected


def test_multi_fake_to_hudi_conf(spark):
    """multi_fake_to_hudi.conf: tables_configs fan out to per-table
    hudi tables (${table_name} resolution)."""
    spec = JobSpec.from_file(f"{_HUDI}/multi_fake_to_hudi.conf")
    sink = next(b for b in spec.sinks if b.plugin.lower() == "hudi").options
    shutil.rmtree(str(sink.get("table_dfs_path", "/tmp/hudi"))
                  .replace("file://", ""), ignore_errors=True)
    JobEngine(spark).run(spec)
    for entry in sink["table_list"]:
        out = _hudi_read(spark, {**sink, **entry})
        assert out.count() > 0, entry["table_name"]


def test_hudi_omit_config_item_conf(spark):
    spec = JobSpec.from_file(f"{_HUDI}/fake_to_hudi_with_omit_config_item.conf")
    sink = next(b for b in spec.sinks if b.plugin.lower() == "hudi").options
    shutil.rmtree(str(sink.get("table_dfs_path", "/tmp/hudi"))
                  .replace("file://", ""), ignore_errors=True)
    JobEngine(spark).run(spec)


def test_iceberg_branch_conf(spark):
    """fake_to_iceberg_with_branch.conf: branch writes land (the
    versioned-parquet backend treats the branch as extra options)."""
    spec = JobSpec.from_file(f"{_ICE}/iceberg/fake_to_iceberg_with_branch.conf")
    sink = next(b for b in spec.sinks if b.plugin.lower() == "iceberg").options
    cat = sink.get("iceberg.catalog.config") or {}
    wh = str(sink.get("warehouse") or cat.get("warehouse", "/tmp/iceberg")) \
        .replace("file://", "")
    shutil.rmtree(wh, ignore_errors=True)
    JobEngine(spark).run(spec)


def test_pulsar_canal_cdc_to_pg_conf(spark, monkeypatch):
    """cdc_canal_pulsar_to_pg.conf: canal envelopes consumed over the
    pulsar BINARY protocol, upserted into pg by primary key — final
    table equals the canal ground truth (PulsarIT's canal path)."""
    from seatunnel_spark.testing.pg_server import start_mini_pg
    from seatunnel_spark.testing.pulsar_server import start_mini_pulsar

    broker, pport, pstop = start_mini_pulsar()
    pg, pgport, pgstop = start_mini_pg(user="test", password="test")
    monkeypatch.setitem(
        os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
        f"pulsar.e2e=tcp://127.0.0.1:{pport},"
        f"postgresql=tcp://127.0.0.1:{pgport}")
    try:
        from seatunnel_spark.pulsar_wire import PulsarClient

        canal = (f"{_E2E}/connector-kafka-e2e/src/test/resources/"
                 "canal/canal_data.txt")
        with open(canal) as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        cl = PulsarClient(f"pulsar://127.0.0.1:{pport}")
        pid = cl.create_producer("test-cdc_mds")
        for i, ln in enumerate(lines):
            cl.send(pid, ln.encode(), i)
        cl.close()
        JobEngine(spark).run(
            JobSpec.from_file(f"{_PULSAR}/cdc_canal_pulsar_to_pg.conf"))
        con = duckdb.connect()
        con.execute("CREATE SCHEMA IF NOT EXISTS public")
        con.execute("CREATE TABLE public.sink (id INTEGER PRIMARY KEY, "
                    "name VARCHAR, description VARCHAR, weight VARCHAR)")
        for sql in pg.statements:
            head = sql.split()[0].upper() if sql.split() else ""
            if head in ("INSERT", "UPDATE", "DELETE"):
                con.execute(sql)
        got = con.execute("SELECT id FROM public.sink ORDER BY id").fetchall()
        assert [r[0] for r in got] == [1101, 1102, 1103, 1104, 1105,
                                       1106, 1107, 1108]
    finally:
        pstop()
        pgstop()
