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


def test_changelog_recording_is_per_bucket(spark, tmp_path):
    """Layout/scale test: record_changelog materializes per PARTITION
    (paimon's per-bucket changelog files), not through a coalesce(1)
    funnel — a multi-partition frame produces multiple part files, and
    the replayed log preserves (partition, local-seq) order."""
    from pyspark.sql import functions as F

    from seatunnel_spark.types import ROW_KIND_COL

    t = LakehouseTable(str(tmp_path / "clog_t"))
    df = (spark.range(0, 400, 1, 8)
          .withColumn(ROW_KIND_COL, F.lit("+I"))
          .withColumn("v", F.col("id") * 2))
    v = t.commit(df.drop(ROW_KIND_COL))
    t.record_changelog(df, v)

    import glob

    parts = glob.glob(str(tmp_path / "clog_t" / "changelog" / f"c{v}"
                          / "part-*.parquet"))
    assert len(parts) > 1, "changelog write collapsed to one partition"

    log = t.read_changelog_log(spark)
    rows = log.collect()
    assert len(rows) == 400
    # within each original partition, arrival (id) order is preserved
    ids = [r["id"] for r in rows]
    per_part = {}
    for r in rows:
        per_part.setdefault(r["id"] // 50, []).append(r["id"])
    for grp in per_part.values():
        assert grp == sorted(grp)
    assert sorted(ids) == list(range(400))
