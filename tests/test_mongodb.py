"""MongoDB connector e2e over OP_MSG/BSON: reference
connector-mongodb-e2e confs run unmodified against an in-process mini
MongoDB (MongodbIT's Testcontainers analog); seed docs mirror its
generateTestDataSet."""

import datetime
import decimal
import os

import pytest

from seatunnel_spark import bson_codec as bson
from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources.mongodb import MongoClientLite, parse_match
from seatunnel_spark.testing.mongo_server import start_mini_mongo

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-mongodb-e2e/src/test/resources")


def _doc(i):
    return {
        "c_map": {"k": f"v{i}"}, "c_array": [i, i + 1],
        "c_string": f"s{i}", "c_boolean": i % 2 == 0,
        "c_int": i, "c_bigint": 10_000_000_000 + i,
        "c_double": i * 1.5,
        "c_row": {"c_map": {"k": f"v{i}"}, "c_array": [i],
                  "c_string": f"s{i}", "c_boolean": True,
                  "c_int": i, "c_bigint": 10_000_000_000 + i,
                  "c_double": i * 1.5},
    }


@pytest.fixture(scope="module")
def mongo():
    store, port, stop = start_mini_mongo()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"e2e_mongodb=mongodb://127.0.0.1:{port}"
    store.seed("test_db", "test_match_op_db", [_doc(i) for i in range(5)])
    yield store, port
    stop()
    os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)


def test_bson_roundtrip():
    doc = {"i32": 5, "i64": 2**40, "f": 1.25, "s": "héllo", "b": True,
           "n": None, "arr": [1, "two", {"three": 3}],
           "sub": {"x": 1}, "bin": b"\x00\x01\x02",
           "dt": datetime.datetime(2024, 3, 19, 12, 30, 45, 123000),
           "dec": decimal.Decimal("123456.789012345678"),
           "oid": bson.ObjectId()}
    back, _ = bson.decode(bson.encode(doc))
    assert back == doc


def test_wire_client_crud(mongo):
    _, port = mongo
    cl = MongoClientLite(f"mongodb://127.0.0.1:{port}")
    cl.insert_many("db1", "c1", [{"_id": i, "v": i * 2} for i in range(250)])
    assert cl.count("db1", "c1") == 250
    got = list(cl.find_all("db1", "c1", {"v": {"$gte": 480}}, batch_size=10))
    assert sorted(d["_id"] for d in got) == [240, 241, 242, 243, 244,
                                            245, 246, 247, 248, 249]
    cl.update("db1", "c1", [{"q": {"_id": 1}, "u": {"_id": 1, "v": -1},
                             "upsert": False, "multi": False}])
    assert next(iter(cl.find_all("db1", "c1", {"_id": 1})))["v"] == -1
    cl.delete("db1", "c1", [{"q": {"_id": 2}, "limit": 1}])
    assert cl.count("db1", "c1") == 249
    cl.close()


def test_parse_match_lenient():
    assert parse_match('{c_int: 2}') == {"c_int": 2}
    assert parse_match('{"a": {"$gte": 3}}') == {"a": {"$gte": 3}}
    assert parse_match('{c_int: {$gte: 10, $lte: 20}}') == \
        {"c_int": {"$gte": 10, "$lte": 20}}


def test_match_query_conf(spark, mongo):
    """matchIT/mongodb_matchQuery_source_to_assert.conf: match.query
    pushdown '{c_int: 2}' -> 1 row -> sink collection (IT
    testMatchQuery)."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_match_op_result_db", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/matchIT/mongodb_matchQuery_source_to_assert.conf"))
    out = store.dbs["test_db"]["test_match_op_result_db"]
    assert len(out) == 1
    d = next(iter(out.values()))
    assert d["c_int"] == 2 and d["c_row"]["c_string"] == "s2"


def test_fake_to_mongodb_and_read_back(spark, mongo):
    """fake_source_to_mongodb.conf then mongodb_source_to_assert.conf:
    write 5 FakeSource rows, read back with the full-type schema and
    Assert row counts (IT testMongodbSourceAndSink)."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_source_sink_table", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/fake_source_to_mongodb.conf"))
    assert len(store.dbs["test_db"]["test_source_sink_table"]) == 5
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/mongodb_source_to_assert.conf"))


def test_update_mode_conf(spark, mongo):
    """updateIT/fake_source_to_update_mongodb.conf: upsert-enable +
    primary-key c_int — re-running must not duplicate (IT
    testUpdateMongodb)."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_update_table", None)
    conf = f"{_RES}/updateIT/fake_source_to_update_mongodb.conf"
    JobEngine(spark).run(JobSpec.from_file(conf))
    n1 = len(store.dbs["test_db"]["test_update_table"])
    JobEngine(spark).run(JobSpec.from_file(conf))
    n2 = len(store.dbs["test_db"]["test_update_table"])
    assert n1 == n2 > 0


def test_split_ranges_cover_everything(spark, mongo):
    """partition.split-key fan-out: ranges must partition the
    collection exactly (no dupes, no gaps)."""
    from seatunnel_spark.sources.mongodb import MongoSource

    store, port = mongo
    store.seed("splits", "big", [{"_id": i, "k": i, "v": f"x{i}"}
                                 for i in range(500)])
    src = MongoSource({
        "uri": f"mongodb://127.0.0.1:{port}", "database": "splits",
        "collection": "big", "partition.split-key": "k",
        "partition.split-size": 100,
        "schema": {"fields": {"k": "int", "v": "string"}},
    })
    rows = src.read(spark).collect()
    assert sorted(r["k"] for r in rows) == list(range(500))


def test_flat_sync_string(spark, mongo):
    from seatunnel_spark.sources.mongodb import MongoSource

    store, port = mongo
    store.seed("flats", "c", [{"_id": 1, "a": 1, "b": "x"}])
    out = MongoSource({"uri": f"mongodb://127.0.0.1:{port}",
                       "database": "flats", "collection": "c",
                       "flat.sync-string": True}).read(spark).collect()
    assert len(out) == 1 and '"a": 1' in out[0]["content"]


def test_sink_rowkind_deletes(spark, mongo):
    from pyspark.sql import types as T

    from seatunnel_spark.sinks.mongodb import MongoSink
    from seatunnel_spark.types import ROW_KIND_COL

    store, port = mongo
    schema = T.StructType([T.StructField("id", T.IntegerType()),
                           T.StructField("v", T.StringType()),
                           T.StructField(ROW_KIND_COL, T.StringType())])
    df = spark.createDataFrame(
        [(1, "a", "+I"), (2, "b", "+I"), (1, "a2", "+U"), (2, "b", "-D")],
        schema).coalesce(1)
    MongoSink({"uri": f"mongodb://127.0.0.1:{port}", "database": "ch",
               "collection": "t", "upsert-enable": True,
               "primary-key": ["id"]}).write(df)
    docs = [{k: v for k, v in d.items() if k != "_id"}
            for d in store.dbs["ch"]["t"].values()]
    assert docs == [{"id": 1, "v": "a2"}]


def test_flat_sink_and_source_confs(spark, mongo):
    """flatIT: fake_source_to_flat_mongodb.conf (flat.sync-string
    writes the whole row as one string field) then
    mongodb_flat_source_to_assert.conf reads it back flattened."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_flat_table", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/flatIT/fake_source_to_flat_mongodb.conf"))
    assert store.dbs["test_db"]["test_flat_table"]
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/flatIT/mongodb_flat_source_to_assert.conf"))


def test_match_projection_conf(spark, mongo):
    """matchIT/mongodb_matchProjection_source_to_assert.conf:
    match.projection prunes fields server-side."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_match_op_result_db", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/matchIT/mongodb_matchProjection_source_to_assert.conf"))
    out = store.dbs["test_db"]["test_match_op_result_db"]
    assert len(out) == 5
    assert all(d.get("c_bigint") is None for d in out.values())


def test_compatible_parameters_confs(spark, mongo):
    """compatibleParametersIT: the legacy matchQuery spelling and the
    legacy update conf run unmodified."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_match_op_result_db", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/compatibleParametersIT/"
        "mongodb_matchQuery_source_to_assert.conf"))
    assert len(store.dbs["test_db"]["test_match_op_result_db"]) == 1
    store.dbs.get("test_db", {}).pop("test_update_table", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/compatibleParametersIT/fake_source_to_update_mongodb.conf"))
    assert store.dbs["test_db"]["test_update_table"]


def test_split_confs(spark, mongo):
    """splitIT: partition.split-key / split-size parallel range reads
    return every row exactly once."""
    store, _ = mongo
    store.seed("test_db", "test_split_op_db", [
        dict(_doc(i), _id=i) for i in range(50)])
    for conf in ("splitIT/mongodb_split_key_source_to_assert.conf",
                 "splitIT/mongodb_split_size_source_to_assert.conf"):
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


def test_update_mode_insert_and_readback_confs(spark, mongo):
    """updateIT: updateMode_insert writes with upsert semantics, then
    update_mongodb_to_assert.conf reads the table back."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_update_table", None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/updateIT/fake_source_to_updateMode_insert_mongodb.conf"))
    assert store.dbs["test_db"]["test_update_table"]
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/updateIT/update_mongodb_to_assert.conf"))


def test_transaction_confs(spark, mongo):
    """transactionIT: transactional sink/upsert confs land every split
    batch; the read-back assert confs verify counts."""
    store, _ = mongo
    store.dbs.get("test_db", {}).pop("test_source_transaction_sink_table",
                                     None)
    store.dbs.get("test_db", {}).pop("test_source_upsert_transaction_table",
                                     None)
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/transactionIT/fake_source_to_transaction_sink_mongodb.conf"))
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/transactionIT/"
        "mongodb_source_transaction_sink_to_assert.conf"))
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/transactionIT/"
        "fake_source_to_transaction_upsert_mongodb.conf"))
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/transactionIT/"
        "mongodb_source_transaction_upsert_to_assert.conf"))


def test_null_and_double_value_confs(spark, mongo):
    """mongodb_null_value.conf (projection drops c_bigint, null fields
    survive) and mongodb_double_value.conf (doubles keep precision)."""
    store, _ = mongo
    store.seed("test_db", "test_null_op_db", [
        {"_id": i, "c_string": None if i % 2 else f"s{i}",
         "c_int": i, "c_bigint": 10_000_000_000 + i,
         "c_double": i * 1.5} for i in range(5)])
    store.dbs.get("test_db", {}).pop("test_null_op_result_db", None)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/mongodb_null_value.conf"))
    store.seed("test_db", "test_double_op_db", [
        {"_id": i, "c_double": i + 0.123456789} for i in range(5)])
    store.dbs.get("test_db", {}).pop("test_double_op_result_db", None)
    JobEngine(spark).run(
        JobSpec.from_file(f"{_RES}/mongodb_double_value.conf"))


def test_cdc_sink_confs(spark, mongo):
    """fake_cdc_sink_mongodb.conf / fake_cdc_upsert_sink_mongodb.conf:
    +I/-U/+U/-D changelogs apply by primary key."""
    store, _ = mongo
    for conf, table in (
            ("fake_cdc_sink_mongodb.conf", "test_cdc_table"),
            ("fake_cdc_upsert_sink_mongodb.conf", "test_cdc_upsert_table")):
        path = f"{_RES}/{conf}"
        if not os.path.exists(path):
            path = f"{_RES}/cdcIT/{conf}"
        spec = JobSpec.from_file(path)
        sink = spec.sinks[0].options
        table = sink.get("collection", table)
        store.dbs.get(sink.get("database", "test_db"), {}).pop(table, None)
        JobEngine(spark).run(spec)
        assert store.dbs[sink.get("database", "test_db")][table], conf
