"""Reference clickhouse-e2e confs unmodified vs the mini ClickHouse
HTTP server (ClickhouseIT / ClickhouseSinkCDCChangelogIT analogs).
Changelog confs are checked against the generic ground truth computed
from their own FakeSource rows."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.rest_servers import start_mini_clickhouse

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-clickhouse-e2e/src/test/resources")


@pytest.fixture()
def ch(monkeypatch):
    tables, port, stop = start_mini_clickhouse()
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"clickhouse=http://127.0.0.1:{port}")
    yield tables, port
    stop()


def _ground_truth(rows, pks, fields):
    state = {}
    for r in rows:
        kind = str(r.get("kind", "INSERT")).upper()
        vals = dict(zip(fields, r["fields"]))
        key = tuple(vals[k] for k in pks)
        if kind in ("INSERT", "UPDATE_AFTER"):
            state[key] = tuple(vals[c] for c in fields)
        elif kind in ("DELETE", "UPDATE_BEFORE"):
            state.pop(key, None)
    return set(state.values())


def _run_changelog_conf(spark, tables, conf):
    spec = JobSpec.from_file(f"{_RES}/{conf}")
    src = spec.sources[0].options
    sink = next(b for b in spec.sinks
                if b.plugin.lower() == "clickhouse").options
    JobEngine(spark).run(spec)
    fields = list(src["schema"]["fields"].keys())
    pks = [k.strip() for k in str(sink["primary_key"]).split(",")]
    got = {tuple(r[c] for c in fields)
           for r in tables[(sink["database"], sink["table"])]}
    want = _ground_truth(src["rows"], pks, fields)
    assert got == want, conf


def test_fake_to_clickhouse_conf(spark, ch):
    """fake_to_clickhouse.conf: composite primary_key (pk_id, name),
    support_upsert + lightweight delete — dedup of the triple insert,
    the -U/+U pair, and the DELETE land as the reference expects."""
    tables, _ = ch
    _run_changelog_conf(spark, tables, "fake_to_clickhouse.conf")


@pytest.mark.parametrize("conf", ["clickhouse_sink_cdc_changelog_case1.conf",
                                  "clickhouse_sink_cdc_changelog_case2.conf"])
def test_clickhouse_cdc_changelog_confs(spark, ch, conf):
    tables, _ = ch
    _run_changelog_conf(spark, tables, conf)


def test_clickhouse_to_clickhouse_and_console_confs(spark, ch):
    """Seed source_table like the IT's init SQL, then the copy conf and
    the console conf read it back through the HTTP SELECT path."""
    tables, _ = ch
    tables[("default", "source_table")] = [
        {"pk_id": i, "name": f"n{i}", "score": 100} for i in range(20)]
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/clickhouse_to_clickhouse.conf"))
    assert len(tables[("default", "sink_table")]) == 20
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/clickhouse_to_console.conf"))


_SAVEMODE_CONFS = [
    "clickhouse_with_create_schema_when_not_exist.conf",
    "clickhouse_with_create_schema_when_not_exist_and_drop_data.conf",
    "clickhouse_with_recreate_schema_and_append_data.conf",
    "clickhouse_with_recreate_schema_and_custom.conf",
    "clickhouse_with_create_schema_when_comment.conf",
]


@pytest.mark.parametrize("conf", _SAVEMODE_CONFS)
def test_clickhouse_savemode_confs(spark, ch, conf):
    tables, _ = ch
    # the IT's init SQL seeds source_table before the savemode jobs
    tables[("default", "source_table")] = [
        {"pk_id": i, "name": f"n{i}", "score": 100} for i in range(20)]
    spec = JobSpec.from_file(f"{_RES}/{conf}")
    sink = next(b for b in spec.sinks
                if b.plugin.lower() == "clickhouse").options
    JobEngine(spark).run(spec)
    assert len(tables[(sink["database"], sink["table"])]) > 0, conf


def test_clickhouse_error_when_schema_not_exist_conf(spark, ch):
    with pytest.raises(Exception):
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/clickhouse_with_error_when_schema_not_exist.conf"))


def test_clickhouse_error_when_data_exists_conf(spark, ch):
    tables, _ = ch
    spec = JobSpec.from_file(
        f"{_RES}/clickhouse_with_error_when_data_exists.conf")
    sink = next(b for b in spec.sinks
                if b.plugin.lower() == "clickhouse").options
    tables[(sink["database"], sink["table"])] = [{"pk_id": 1}]
    with pytest.raises(Exception, match="has data"):
        JobEngine(spark).run(spec)
