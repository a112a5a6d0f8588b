"""MongoDB-CDC LIVE over `$changeStream` on the OP_MSG wire — the
reference's connector-cdc-mongodb-e2e confs run unmodified against the
mini Mongo (aggregate $changeStream + getMore, fullDocument=
updateLookup), no replay directory. Reference: MongodbScanFetchTask
(snapshot) + MongodbStreamFetchTask (stream) + ChangeStreamOffset."""

import os

import pytest

from seatunnel_spark import bson_codec as bson
from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.mongo_server import start_mini_mongo
from seatunnel_spark.types import ROW_KIND_COL

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-cdc-mongodb-e2e/src/test/resources")


def _products(i, name):
    return {"_id": f"p{i}", "name": name, "description": f"desc{i}",
            "weight": str(i * 1.5)}


@pytest.fixture()
def live_mongo(monkeypatch):
    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    store, port, stop = start_mini_mongo()
    store.seed("inventory", "products",
               [_products(1, "scooter"), _products(2, "hammer")])
    store.seed("inventory", "orders",
               [{"_id": "o1", "order_number": 1001,
                 "order_date": "2024-01-01", "quantity": 2,
                 "product_id": "p1"}])
    store.mark_snapshot()
    # concurrent writes AFTER the snapshot mark — logged to the oplog
    # through the regular command handlers, like a live application
    store.execute({"insert": "products", "$db": "inventory",
                   "documents": [_products(3, "wrench")]})
    store.execute({"update": "products", "$db": "inventory",
                   "updates": [{"q": {"_id": "p2"},
                                "u": {"$set": {"name": "hammer-xl"}}}]})
    store.execute({"delete": "products", "$db": "inventory",
                   "deletes": [{"q": {"_id": "p1"}, "limit": 1}]})
    store.execute({"insert": "orders", "$db": "inventory",
                   "documents": [{"_id": "o2", "order_number": 1002,
                                  "order_date": "2024-01-02",
                                  "quantity": 5, "product_id": "p3"}]})
    monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"mongo0=tcp://127.0.0.1:{port}")
    yield store, port
    stop()


def test_live_change_stream_stitch(spark, live_mongo):
    """Snapshot + change-stream events stitch to the correct changelog:
    snapshot rows +I at the stream-open watermark, post-watermark
    insert/update/delete replayed on top; ObjectId keys stringify."""
    from seatunnel_spark.sources.cdc import final_state
    from seatunnel_spark.sources.cdc_replay import CdcReplaySource

    store, _ = live_mongo
    # one ObjectId-keyed write to prove key conversion
    oid = bson.ObjectId()
    store.execute({"insert": "products", "$db": "inventory",
                   "documents": [{"_id": oid, "name": "bolt",
                                  "description": "d", "weight": "0.1"}]})

    src = CdcReplaySource({
        "hosts": "mongo0:27017",
        "database": ["inventory"],
        "collection": ["inventory.products"],
        "username": "superuser", "password": "superpw",
        "schema": {"primaryKey": {"name": "id", "columnNames": ["_id"]},
                   "fields": {"_id": "string", "name": "string",
                              "description": "string",
                              "weight": "string"}},
    })
    src.plugin_name = "MongoDB-CDC"
    df = src.read(spark)
    kinds = sorted(r[ROW_KIND_COL] for r in df.collect())
    # snapshot: p2, p3, bolt (post-change state; p1 already deleted)
    # stream: +I(p3) +I(bolt) -U/+U(p2) -D(p1)
    assert kinds.count("-D") == 1 and kinds.count("+U") == 1

    final = {r["_id"]: r for r in
             final_state(df, ["_id"], "__offset").collect()}
    assert set(final) == {"p2", "p3", str(oid)}
    assert final["p2"]["name"] == "hammer-xl"
    assert final["p3"]["name"] == "wrench"
    assert src.discovered_keys["inventory.products"] == ["_id"]


def _mini_mysql_sink(monkeypatch, tables):
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    srv, port, stop = start_mini_mysql("st_user", "seatunnel")
    for t, cols in tables.items():
        srv.tables[t] = (cols, [253] * len(cols), [])
        srv.primary_keys[t] = ["_id"]
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       os.environ["SEATUNNEL_SPARK_HOST_ALIASES"]
                       + f",mysql_e2e=tcp://127.0.0.1:{port}")
    return srv, stop


def test_mongodbcdc_to_mysql_conf_live(spark, live_mongo, monkeypatch):
    """mongodbcdc_to_mysql.conf runs UNMODIFIED: live $changeStream
    source, jdbc mysql sink with generate_sink_sql upserts keyed on
    _id."""
    srv, stop = _mini_mysql_sink(
        monkeypatch, {"products": ["_id", "name", "description",
                                   "weight"]})
    try:
        spec = JobSpec.from_file(f"{_RES}/mongodbcdc_to_mysql.conf")
        spec.env["streaming.await.timeout"] = 10
        JobEngine(spark).run(spec)
        stmts = " ".join(srv.statements)
        assert "wrench" in stmts          # stream insert arrived
        assert "hammer-xl" in stmts       # stream update arrived
    finally:
        stop()
        for q in spark.streams.active:
            q.stop()


def test_mongodb_multi_table_cdc_conf_live(spark, live_mongo,
                                           monkeypatch):
    """mongodb_multi_table_cdc_to_mysql.conf runs UNMODIFIED:
    tables_configs declares per-collection schemas, the sink fans out
    via ${table_name}."""
    srv, stop = _mini_mysql_sink(monkeypatch, {
        "products": ["_id", "name", "description", "weight"],
        "orders": ["_id", "order_number", "order_date", "quantity",
                   "product_id"],
    })
    try:
        spec = JobSpec.from_file(
            f"{_RES}/mongodb_multi_table_cdc_to_mysql.conf")
        spec.env["streaming.await.timeout"] = 10
        JobEngine(spark).run(spec)
        stmts = " ".join(srv.statements)
        assert "products" in stmts and "orders" in stmts
        assert "wrench" in stmts          # products stream insert
        assert "1002" in stmts            # orders stream insert
    finally:
        stop()
        for q in spark.streams.active:
            q.stop()
