"""MySQL-CDC end-to-end over a debezium replay feed: the reference's
own cdc e2e confs run unmodified (connector-cdc-mysql-e2e +
connector-elasticsearch-e2e resources), with the binlog replaced by a
replay directory — the same decode/stitch/changelog path a Kafka-fed
deployment uses."""

import json
import os

import pytest
from pyspark.sql import functions as F

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources.cdc_replay import CdcReplaySource, apply_ddl
from seatunnel_spark.types import EVENT_TS_COL, ROW_KIND_COL, TABLE_ID_COL

_CDC_E2E = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
            "connector-cdc-mysql-e2e/src/test/resources")
_ES_E2E = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
           "connector-elasticsearch-e2e/src/test/resources/elasticsearch")


def _ev(op, table, pos, ts, before=None, after=None, db="mysql_cdc"):
    return json.dumps({"before": before, "after": after, "op": op,
                       "ts_ms": ts,
                       "source": {"db": db, "table": table, "pos": pos}})


@pytest.fixture()
def replay_dir(tmp_path):
    """Feed for mysql_cdc.mysql_cdc_e2e_source_table (snapshot op=r
    rows + inserts/updates/deletes — the DML the reference IT runs
    against MySQL)."""
    t = tmp_path / "mysql_cdc.mysql_cdc_e2e_source_table"
    t.mkdir(parents=True)
    lines = []
    for i in range(1, 4):  # snapshot phase (debezium op=r)
        lines.append(_ev("r", "mysql_cdc_e2e_source_table", 100 + i, 1000 + i,
                         after={"id": i, "f_int": i * 10, "f_varchar": f"v{i}"}))
    lines.append(_ev("c", "mysql_cdc_e2e_source_table", 200, 2000,
                     after={"id": 4, "f_int": 40, "f_varchar": "v4"}))
    lines.append(_ev("u", "mysql_cdc_e2e_source_table", 210, 2100,
                     before={"id": 2, "f_int": 20, "f_varchar": "v2"},
                     after={"id": 2, "f_int": 21, "f_varchar": "v2b"}))
    lines.append(_ev("d", "mysql_cdc_e2e_source_table", 220, 2200,
                     before={"id": 1, "f_int": 10, "f_varchar": "v1"}))
    (t / "changelog.jsonl").write_text("\n".join(lines) + "\n")
    (t / "schema.json").write_text(json.dumps(
        {"id": "int", "f_int": "int", "f_varchar": "string"}))
    return str(tmp_path)


def test_batch_read_decodes_changelog(spark, replay_dir):
    src = CdcReplaySource({
        "replay.dir": replay_dir,
        "table-names": ["mysql_cdc.mysql_cdc_e2e_source_table"],
    })
    df = src.read(spark)
    rows = {(r["id"], r[ROW_KIND_COL]) for r in df.collect()}
    assert rows == {(1, "+I"), (2, "+I"), (3, "+I"), (4, "+I"),
                    (2, "-U"), (2, "+U"), (1, "-D")}
    ts = {r["id"]: r[EVENT_TS_COL] for r in df.filter("__row_kind = '+U'").collect()}
    assert ts == {2: 2100}
    assert df.select(TABLE_ID_COL).distinct().collect()[0][0] == \
        "mysql_cdc.mysql_cdc_e2e_source_table"


def test_final_state_after_replay(spark, replay_dir):
    from seatunnel_spark.sources.cdc import final_state

    src = CdcReplaySource({
        "replay.dir": replay_dir,
        "table-names": ["mysql_cdc.mysql_cdc_e2e_source_table"],
    })
    df = src.read(spark).drop(EVENT_TS_COL, TABLE_ID_COL)
    state = final_state(df, ["id"], "__offset")
    got = {r["id"]: (r["f_int"], r["f_varchar"]) for r in state.collect()}
    assert got == {2: (21, "v2b"), 3: (30, "v3"), 4: (40, "v4")}


def test_metadata_trans_conf_runs_unmodified(spark, replay_dir, monkeypatch):
    """mysqlcdc_to_metadata_trans.conf: MySQL-CDC -> Metadata transform
    (Database/Table/RowKind/EventTime/Delay) -> Assert NOT_NULL rules,
    STREAMING (the IT submits, asserts row counts, cancels)."""
    monkeypatch.setenv("SEATUNNEL_SPARK_CDC_REPLAY", replay_dir)
    spec = JobSpec.from_file(f"{_CDC_E2E}/mysqlcdc_to_metadata_trans.conf")
    spec.env["streaming.await.timeout"] = 10
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()


def test_mysqlcdc_to_elasticsearch_schema_change_conf(spark, tmp_path,
                                                      monkeypatch):
    """mysqlcdc_to_elasticsearch_with_schema_change.conf: shop.products
    feed including ALTER TABLE DDL events; new columns decode (older
    events null) and ES dynamic mapping evolves — the reference IT's
    schema-evolution assertion (MysqlCDCIT add_columns path)."""
    from seatunnel_spark.testing.es_server import start_mini_es

    server, port, stop = start_mini_es()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"elasticsearch=http://127.0.0.1:{port}")
    t = tmp_path / "shop.products"
    t.mkdir(parents=True)
    lines = [
        _ev("r", "products", 10, 1000, db="shop",
            after={"id": 101, "name": "scooter",
                   "description": "Small 2-wheel scooter", "weight": 3.14}),
        _ev("r", "products", 11, 1001, db="shop",
            after={"id": 102, "name": "car battery",
                   "description": "12V car battery", "weight": 8.1}),
        json.dumps({"source": {"db": "shop", "table": "products", "pos": 20},
                    "ts_ms": 1500,
                    "ddl": "ALTER TABLE products ADD COLUMN add_column1 "
                           "varchar(64) NOT NULL DEFAULT 'yy'"}),
        _ev("c", "products", 30, 2000, db="shop",
            after={"id": 103, "name": "hammer", "description": "12oz",
                   "weight": 0.75, "add_column1": "yy"}),
    ]
    (t / "changelog.jsonl").write_text("\n".join(lines) + "\n")
    (t / "schema.json").write_text(json.dumps(
        {"id": "int", "name": "string", "description": "string",
         "weight": "float"}))
    monkeypatch.setenv("SEATUNNEL_SPARK_CDC_REPLAY", str(tmp_path))

    spec = JobSpec.from_file(
        f"{_ES_E2E}/mysqlcdc_to_elasticsearch_with_schema_change.conf")
    spec.env["streaming.await.timeout"] = 10
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()
        stop()
    docs = server.indices["schema_change_index"]["docs"]
    by_id = {d["id"]: d for d in docs.values()}
    assert set(by_id) == {101, 102, 103}
    assert by_id[103]["add_column1"] == "yy"
    assert by_id[101]["add_column1"] is None  # pre-DDL event, evolved schema
    # ES dynamic mapping picked up the evolved column
    assert "add_column1" in server.indices["schema_change_index"]["mapping"]


def test_apply_ddl_forms():
    base = {"id": "int", "name": "string"}
    assert apply_ddl(base, "ALTER TABLE t ADD COLUMN age int")["age"] == "int"
    assert "name" not in apply_ddl(base, "ALTER TABLE t DROP COLUMN name")
    out = apply_ddl(base, "ALTER TABLE t CHANGE COLUMN name full_name varchar(255)")
    assert "name" not in out and out["full_name"] == "string"
    out = apply_ddl(base, "ALTER TABLE t MODIFY COLUMN id bigint")
    assert out["id"] == "bigint"
    out = apply_ddl(base, "ALTER TABLE t ADD COLUMN f1 decimal(16, 2)")
    assert out["f1"] == "decimal(16, 2)"


def test_snapshot_stitch_with_watermark(spark, tmp_path):
    """Chunked-snapshot handoff: events at or before the snapshot
    watermark are dropped (already reflected), later ones replay."""
    t = tmp_path / "db.acct"
    t.mkdir(parents=True)
    spark.createDataFrame([(1, 100), (2, 200)], "id int, bal int") \
        .write.parquet(str(t / "snapshot.parquet"))
    (t / "watermark").write_text("500")
    lines = [
        _ev("u", "acct", 400, 400, before={"id": 1, "bal": 90},
            after={"id": 1, "bal": 100}),   # pre-watermark: dropped
        _ev("u", "acct", 600, 600, before={"id": 2, "bal": 200},
            after={"id": 2, "bal": 250}),   # post-watermark: applied
    ]
    (t / "changelog.jsonl").write_text("\n".join(lines) + "\n")
    (t / "schema.json").write_text(json.dumps({"id": "int", "bal": "int"}))

    from seatunnel_spark.sources.cdc import final_state

    src = CdcReplaySource({"replay.dir": str(tmp_path),
                           "table-names": ["db.acct"]})
    df = src.read(spark)
    kinds = {(r["id"], r[ROW_KIND_COL], r["bal"]) for r in df.collect()}
    assert (1, "+I", 100) in kinds and (2, "+U", 250) in kinds
    assert (1, "-U", 90) not in kinds  # pre-watermark event dropped
    state = final_state(df.drop(EVENT_TS_COL, TABLE_ID_COL), ["id"], "__offset")
    assert {r["id"]: r["bal"] for r in state.collect()} == {1: 100, 2: 250}
