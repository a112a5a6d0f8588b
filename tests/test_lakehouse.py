"""Lakehouse (Iceberg/Paimon/Hudi) changelog MERGE sink + source over
the versioned-parquet backend; the reference's own iceberg e2e confs
run unmodified (their hadoop catalogs already point at local file://
warehouses)."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sinks.lakehouse import LakehouseSink, LakehouseTable
from seatunnel_spark.types import ROW_KIND_COL

_ICE = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-iceberg-e2e/src/test/resources/iceberg")


def test_merge_apply_semantics(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    b1 = spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I"), (3, "c", "+I")],
        ["id", "v", ROW_KIND_COL])
    t.merge_apply(spark, b1.coalesce(1), ["id"])
    b2 = spark.createDataFrame(
        [(2, "b", "-U"), (2, "b2", "+U"), (3, "c", "-D"), (4, "d", "+I")],
        ["id", "v", ROW_KIND_COL])
    t.merge_apply(spark, b2.coalesce(1), ["id"])
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}
    assert t.head() == 1  # two commits -> v0, v1


def test_merge_apply_order_column_and_reinsert(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    batch = spark.createDataFrame(
        [(1, "old", "+U", 10), (1, "new", "+U", 20),
         (2, "x", "+I", 5), (2, "x", "-D", 6), (2, "back", "+I", 7)],
        ["id", "v", ROW_KIND_COL, "off"])
    t.merge_apply(spark, batch, ["id"], order_col="off")
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == {1: "new", 2: "back"}
    assert "off" not in t.read(spark).columns  # order col is metadata


def test_partitioned_commit_type_fidelity(spark, tmp_path):
    t = LakehouseTable(str(tmp_path / "t"))
    df = spark.sql("SELECT id, timestamp'2024-03-19 12:00:00' + make_interval(0,0,0,0,0,0,id) AS ts FROM range(4)")
    t.commit(df, partition_keys=["ts"])
    back = t.read(spark)
    assert dict(back.dtypes)["ts"] == "timestamp"  # no partition-inference decay
    assert back.count() == 4


def test_fake_to_iceberg_conf_runs_unmodified(spark):
    shutil.rmtree("/tmp/seatunnel/iceberg/hadoop-sink", ignore_errors=True)
    JobEngine(spark).run(JobSpec.from_file(f"{_ICE}/fake_to_iceberg.conf"))
    t = LakehouseTable("/tmp/seatunnel/iceberg/hadoop-sink/"
                       "seatunnel_namespace/iceberg_sink_table")
    df = t.read(spark)
    assert df.count() == 100
    assert "c_timestamp" in df.columns


def test_iceberg_source_conf_runs_unmodified(spark):
    shutil.rmtree("/tmp/seatunnel/iceberg/hadoop", ignore_errors=True)
    seed = spark.range(100).select(
        F.col("id").alias("f1"),
        (F.col("id") % 2 == 0).alias("f2"),
        F.col("id").cast("int").alias("f3"),
    )
    LakehouseTable("/tmp/seatunnel/iceberg/hadoop/database1/source") \
        .commit(seed)
    JobEngine(spark).run(JobSpec.from_file(f"{_ICE}/iceberg_source.conf"))


def test_mysql_cdc_to_iceberg_conf_with_replay(spark, tmp_path, monkeypatch):
    """mysql_cdc_to_iceberg.conf: STREAMING MySQL-CDC feed -> Iceberg
    upsert-mode sink with primary key id and partition key f_datetime
    (IT asserts the final table state after inserts/updates/deletes)."""
    t = tmp_path / "mysql_cdc.mysql_cdc_e2e_source_table"
    t.mkdir(parents=True)

    def ev(op, pos, before=None, after=None):
        return json.dumps({"before": before, "after": after, "op": op,
                           "ts_ms": pos,
                           "source": {"db": "mysql_cdc",
                                      "table": "mysql_cdc_e2e_source_table",
                                      "pos": pos}})

    def doc(i, v, dt="2024-03-19 12:00:00"):
        return {"id": i, "f_int": v, "f_varchar": f"s{i}", "f_datetime": dt}

    lines = [
        ev("r", 1, after=doc(1, 10)), ev("r", 2, after=doc(2, 20)),
        ev("c", 10, after=doc(3, 30, "2024-03-20 08:00:00")),
        ev("u", 11, before=doc(2, 20), after=doc(2, 21)),
        ev("d", 12, before=doc(1, 10)),
    ]
    (t / "changelog.jsonl").write_text("\n".join(lines) + "\n")
    (t / "schema.json").write_text(json.dumps(
        {"id": "int", "f_int": "int", "f_varchar": "string",
         "f_datetime": "timestamp"}))
    monkeypatch.setenv("SEATUNNEL_SPARK_CDC_REPLAY", str(tmp_path))
    shutil.rmtree("/tmp/seatunnel/iceberg/hadoop-cdc-sink", ignore_errors=True)

    spec = JobSpec.from_file(f"{_ICE}/mysql_cdc_to_iceberg.conf")
    spec.env["streaming.await.timeout"] = 10
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()
    table = LakehouseTable("/tmp/seatunnel/iceberg/hadoop-cdc-sink/"
                           "seatunnel_namespace/iceberg_sink_table")
    got = {r["id"]: (r["f_int"], r["f_varchar"])
           for r in table.read(spark).collect()}
    assert got == {2: (21, "s2"), 3: (30, "s3")}


def test_savemode_paths(spark, tmp_path):
    wh = str(tmp_path / "wh")
    base = {"warehouse": wh, "table": "t1", "database": "db"}
    df = spark.range(3).withColumnRenamed("id", "k")
    s = LakehouseSink(base)
    s.plugin_name = "Paimon"
    s.write(df)
    s.write(df)  # append
    t = LakehouseTable(f"{wh}/db/t1")
    assert t.read(spark).count() == 6
    s2 = LakehouseSink({**base, "data_save_mode": "DROP_DATA"})
    s2.plugin_name = "Paimon"
    s2.write(df)
    assert t.read(spark).count() == 3
    s3 = LakehouseSink({**base, "data_save_mode": "ERROR_WHEN_DATA_EXISTS"})
    s3.plugin_name = "Paimon"
    with pytest.raises(ValueError, match="ERROR_WHEN_DATA_EXISTS"):
        s3.write(df)


def test_hudi_option_names(spark, tmp_path):
    s = LakehouseSink({"table_dfs_path": str(tmp_path), "table_name": "h1",
                       "record_key_fields": "id"})
    s.plugin_name = "Hudi"
    df = spark.createDataFrame([(1, "a", "+I"), (1, "a2", "+U")],
                               ["id", "v", ROW_KIND_COL]).coalesce(1)
    s.write(df)
    t = LakehouseTable(str(tmp_path / "default" / "h1"))
    assert {r["id"]: r["v"] for r in t.read(spark).collect()} == {1: "a2"}


def test_merge_apply_layout_invariance(spark, tmp_path):
    """The per-key winner must not depend on partition layout: the same
    changelog batch applied as 1 partition and as 32 partitions yields
    the identical final table (the no-order_col tie chain is pure row
    content, never monotonically_increasing_id)."""
    rows = [(i % 7, f"v{i}", "+I" if i % 3 else "+U") for i in range(60)]
    rows += [(3, "gone", "-D"), (5, "gone", "-D")]
    batch = spark.createDataFrame(rows, ["id", "v", ROW_KIND_COL])

    t1 = LakehouseTable(str(tmp_path / "t1"))
    t1.merge_apply(spark, batch.repartition(1), ["id"])
    t32 = LakehouseTable(str(tmp_path / "t32"))
    t32.merge_apply(spark, batch.repartition(32), ["id"])

    a = sorted(map(tuple, t1.read(spark).collect()))
    b = sorted(map(tuple, t32.read(spark).collect()))
    assert a == b


def test_merge_apply_schema_evolution_add_column(spark, tmp_path):
    """CDC ADD-COLUMN drift flows into the lakehouse table: a batch
    carrying an evolved schema merges over the old snapshot; untouched
    rows read the new column as null (the reference's schema-evolution
    sink support for paimon/iceberg)."""
    t = LakehouseTable(str(tmp_path / "t"))
    b1 = spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I")], ["id", "v", ROW_KIND_COL])
    t.merge_apply(spark, b1, ["id"])
    b2 = spark.createDataFrame(
        [(3, "c", "yy", "+I"), (2, "b2", "zz", "+U")],
        ["id", "v", "add_column1", ROW_KIND_COL])
    t.merge_apply(spark, b2, ["id"])
    got = {r["id"]: (r["v"], r["add_column1"])
           for r in t.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b2", "zz"), 3: ("c", "yy")}


def test_incremental_changelog_read(spark, tmp_path):
    """Paimon streaming-read semantics over the versioned backend: the
    changelog between snapshot N and HEAD converges a keyed follower to
    HEAD — +I for new keys, -U/+U for changed payloads, -D for
    vanished keys; replaying it through merge_apply reproduces HEAD."""
    t = LakehouseTable(str(tmp_path / "t"))
    t.merge_apply(spark, spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I"), (3, "c", "+I")],
        ["id", "v", ROW_KIND_COL]), ["id"])          # v0
    t.merge_apply(spark, spark.createDataFrame(
        [(2, "b2", "+U"), (3, "c", "-D"), (4, "d", "+I")],
        ["id", "v", ROW_KIND_COL]), ["id"])          # v1

    # initial scan: no from-version -> whole HEAD as +I
    init = t.read_changelog_since(spark, None, ["id"])
    assert {(r["id"], r[ROW_KIND_COL]) for r in init.collect()} == {
        (1, "+I"), (2, "+I"), (4, "+I")}

    log = t.read_changelog_since(spark, 0, ["id"])
    got = {(r["id"], r[ROW_KIND_COL], r["v"]) for r in log.collect()}
    assert got == {(2, "-U", "b"), (2, "+U", "b2"),
                   (3, "-D", "c"), (4, "+I", "d")}

    # replaying the changelog over the old snapshot reproduces HEAD
    follower = LakehouseTable(str(tmp_path / "f"))
    follower.commit(t.read_version(spark, 0))
    follower.merge_apply(spark, log, ["id"])
    a = sorted(map(tuple, follower.read(spark).collect()))
    b = sorted(map(tuple, t.read(spark).collect()))
    assert a == b


def test_lakehouse_source_changelog_scan_mode(spark, tmp_path):
    """Source-level surface: scan.mode=changelog + scan.snapshot-id
    reads the incremental diff (the bounded microbatch of a paimon
    streaming read)."""
    from seatunnel_spark.sinks.lakehouse import LakehouseSource

    t = LakehouseTable(str(tmp_path / "wh" / "db" / "orders"))
    t.merge_apply(spark, spark.createDataFrame(
        [(1, 10, "+I")], ["id", "amt", ROW_KIND_COL]), ["id"])
    t.merge_apply(spark, spark.createDataFrame(
        [(1, 99, "+U"), (2, 20, "+I")], ["id", "amt", ROW_KIND_COL]),
        ["id"])

    src = LakehouseSource({
        "warehouse": str(tmp_path / "wh"), "database": "db",
        "table": "orders", "primary_keys": "id",
        "scan.mode": "changelog", "scan.snapshot-id": 0})
    src.plugin_name = "Paimon"
    out = {(r["id"], r[ROW_KIND_COL]) for r in src.read(spark).collect()}
    assert out == {(1, "-U"), (1, "+U"), (2, "+I")}
