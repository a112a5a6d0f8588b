"""PaimonSinkCDCIT changelog-producer cases: tables written with
`paimon.table.write-props.changelog-producer` record their event log
at write time, and a streaming Paimon source serves that log verbatim
(testChangelogLookup / testChangelogFullCompaction, run bounded: the
DML jobs land first, then the streaming reader catches up in one
microbatch instead of tailing concurrently)."""

import shutil

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sinks.lakehouse import LakehouseTable

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-paimon-e2e/src/test/resources")
_NS = "/tmp/paimon/seatunnel_namespace"


@pytest.fixture(autouse=True)
def clean_ns():
    for t in ("st_test_lookup", "st_test_sink", "st_test_full"):
        shutil.rmtree(f"{_NS}/{t}", ignore_errors=True)
    yield
    for t in ("st_test_lookup", "st_test_sink", "st_test_full"):
        shutil.rmtree(f"{_NS}/{t}", ignore_errors=True)


def _run(spark, conf):
    spec = JobSpec.from_file(f"{_RES}/{conf}")
    # the IT runs the Streaming jobs concurrently and cancels them;
    # bounded here — each emits its catch-up microbatch and stops
    spec.env["streaming.await.timeout"] = 10
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()


def test_changelog_lookup_confs(spark):
    """DDL + insert + update/delete jobs against the lookup-producer
    table, then changelog_paimon_to_paimon.conf streams the RECORDED
    changelog through RowKindExtractor into the append sink: 8 events
    in write order, and the lookup table's final state is 2 rows
    (the IT's exact expectations)."""
    _run(spark, "changelog_fake_cdc_sink_paimon_case1_ddl.conf")
    _run(spark, "changelog_fake_cdc_sink_paimon_case1_insert_data.conf")
    _run(spark, "changelog_fake_cdc_sink_paimon_case1_update_data.conf")
    _run(spark, "changelog_paimon_to_paimon.conf")

    sink = LakehouseTable(f"{_NS}/st_test_sink").read(spark)
    rows = [(r["op"], r["pk_id"], r["name"], r["score"])
            for r in sink.collect()]
    assert sorted(rows) == sorted([
        ("+I", 1, "A", 100), ("+I", 2, "B", 100), ("+I", 3, "C", 100),
        ("-U", 1, "A", 100), ("+U", 1, "Aa", 200),
        ("+I", 2, "Bb", 90), ("-D", 3, "C", 100)]), rows
    assert len(rows) == 7

    lookup = {r["pk_id"]: (r["name"], r["score"]) for r in
              LakehouseTable(f"{_NS}/st_test_lookup")
              .read(spark).collect()}
    assert lookup == {1: ("Aa", 200), 2: ("Bb", 90)}


def test_changelog_full_compaction_conf(spark):
    """changelog_fake_cdc_sink_paimon_case2.conf (changelog-producer =
    full-compaction, streaming): the 7-event FakeSource changelog
    merges to the IT's final 2-row state, and the recorded log holds
    every event."""
    _run(spark, "changelog_fake_cdc_sink_paimon_case2.conf")
    t = LakehouseTable(f"{_NS}/st_test_full")
    final = {r["pk_id"]: (r["name"], r["score"])
             for r in t.read(spark).collect()}
    assert final == {1: ("Aa", 200), 2: ("Bb", 90)}
    log = t.read_changelog_log(spark)
    assert log is not None and log.count() == 7
