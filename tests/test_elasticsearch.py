"""Elasticsearch connector e2e: run the REFERENCE'S OWN confs
unmodified (seatunnel-e2e/seatunnel-connector-v2-e2e/
connector-elasticsearch-e2e/src/test/resources/elasticsearch/) against
an in-process mini-ES speaking the real wire protocol — the sandbox
analog of ElasticsearchIT.java's Testcontainers fixture. Seed data
replicates ElasticsearchIT.generateTestDataSet1/2 and the repo's
mapping/data JSON fixtures, loaded through the same `_bulk`/`PUT
index` wire path the IT uses."""

import datetime
import json
import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sources.elasticsearch import EsClient
from seatunnel_spark.testing.es_server import start_mini_es

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-elasticsearch-e2e/src/test/resources/elasticsearch")


def _dataset1(n=100):
    """ElasticsearchIT.generateTestDataSet1 (c_int 0..99; c_bytes is
    jackson's base64 of b"test"; c_timestamp is epoch millis)."""
    now_ms = 1710848400000  # fixed for determinism
    today = datetime.date.today().isoformat()
    return [
        {"_id": str(i),
         "c_map": {"key": i}, "c_array": [1, 2, 3], "c_string": "string",
         "c_boolean": False, "c_tinyint": 1, "c_smallint": 1, "c_bigint": 1,
         "c_float": 1.1, "c_double": 1.1, "c_decimal": 1.1,
         "c_bytes": "dGVzdA==", "c_int": i, "c_date": today,
         "c_timestamp": now_ms, "c_null": None}
        for i in range(n)
    ]


def _dataset2(n=100):
    today = datetime.date.today().isoformat()
    return [{"_id": str(i), "c_int2": i, "c_null2": None, "c_date2": today}
            for i in range(n)]


def _load_json(name):
    with open(f"{_RES}/{name}") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def es():
    server, port, stop = start_mini_es()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"elasticsearch=http://127.0.0.1:{port}"
    server.seed("st_index", _dataset1())
    server.create_index("st_index4", None)
    full_map = _load_json("st_index_full_type_mapping.json")["mappings"]["properties"]
    server.seed("st_index_full_type",
                [dict(_load_json("st_index_full_type_data.json"), _id=str(i))
                 for i in (1, 2)],
                mapping=full_map)
    nest_map = _load_json("st_index_nest_mapping.json")["mappings"]["properties"]
    nest_doc = _load_json("st_index_nest_data.json")
    server.seed("st_index_nest",
                [dict(nest_doc, _id=str(i)) for i in (1, 2, 3)],
                mapping=nest_map)
    server.seed("st_index_nest_copy", [], mapping=nest_map)
    schema_map = _load_json(
        "st_index_source_without_schema_and_sink.json")["mappings"]["properties"]
    server.seed("st_index", [], mapping=schema_map)  # mapping only; docs kept
    server.seed("read_filter_index1", _dataset1())
    server.seed("read_filter_index2", _dataset2())
    yield server, port
    stop()
    os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)


@pytest.fixture(scope="module")
def client(es):
    _, port = es
    return EsClient([f"http://127.0.0.1:{port}"])


def _run(spark, conf):
    spec = JobSpec.from_file(conf)
    if spec.mode == "STREAMING":
        # the IT submits, asserts, then cancels; bound the run instead
        spec.env["streaming.await.timeout"] = 8
    try:
        JobEngine(spark).run(spec)
    finally:
        for q in spark.streams.active:
            q.stop()


def test_source_and_sink_conf(spark, es, client):
    """elasticsearch_source_and_sink.conf: range query c_int 10..20 on
    st_index with the full declared schema -> st_index2 (IT asserts 11
    docs; testElasticsearch in ElasticsearchIT.java:221-229)."""
    _run(spark, f"{_RES}/elasticsearch_source_and_sink.conf")
    client.refresh("st_index2")
    assert client.count("st_index2") == 11
    srv, _ = es
    doc = next(iter(srv.indices["st_index2"]["docs"].values()))
    assert doc["c_map"] == {"key": doc["c_int"]}
    assert doc["c_array"] == [1, 2, 3]
    assert doc["c_bytes"] == "dGVzdA=="
    assert 10 <= doc["c_int"] <= 20


def test_source_without_schema_conf(spark, es, client):
    """elasticsearch_source_without_schema_and_sink.conf: schema
    inferred from the index mapping, c_array override, source=[] = all
    fields -> st_index4 (IT testElasticsearchWithoutSchema)."""
    _run(spark, f"{_RES}/elasticsearch_source_without_schema_and_sink.conf")
    client.refresh("st_index4")
    assert client.count("st_index4") == 11


def test_full_type_conf(spark, es, client):
    """elasticsearch_source_and_sink_full_type.conf: every exotic ES
    mapping type inferred (unknowns -> string), written through
    (IT testCatalog/full-type path asserts docs count)."""
    _run(spark, f"{_RES}/elasticsearch_source_and_sink_full_type.conf")
    client.refresh("st_index_full_type_target")
    assert client.count("st_index_full_type_target") == 2


def test_nest_conf(spark, es, client):
    """elasticsearch_source_and_sink_with_nest.conf: nested object
    schema (address struct) round-trips (IT testElasticsearchWithNest-
    Schema, readSinkDataWithNestSchema)."""
    _run(spark, f"{_RES}/elasticsearch_source_and_sink_with_nest.conf")
    client.refresh("st_index_nest_copy")
    srv, _ = es
    docs = srv.indices["st_index_nest_copy"]["docs"]
    assert len(docs) == 3
    src = _load_json("st_index_nest_data.json")
    got = next(iter(docs.values()))
    assert got["address"] == src["address"]


def test_multi_source_by_filter_conf(spark, es, client):
    """elasticsearch_multi_source_and_sink_by_filter.conf: index_list
    multi-table read (two indices, per-index query/projection) ->
    ${table_name}_copy sinks (IT testElasticsearchWithMultiSource-
    ByFilter asserts 11 docs each)."""
    _run(spark, f"{_RES}/elasticsearch_multi_source_and_sink_by_filter.conf")
    for ix in ("read_filter_index1_copy", "read_filter_index2_copy"):
        client.refresh(ix)
        assert client.count(ix) == 11, ix


def test_fakesource_multi_sink_conf(spark, es, client):
    """fakesource_to_elasticsearch_multi_sink.conf: FakeSource
    tables_configs -> one ES sink, per-table ${table_name} indices
    (IT testFakeSourceToElasticsearchMultiSink)."""
    _run(spark, f"{_RES}/fakesource_to_elasticsearch_multi_sink.conf")
    srv, _ = es
    for ix in ("st_index5", "st_index6"):
        client.refresh(ix)
        assert client.count(ix) > 0, ix


def test_upper_case_index_conf(spark, es, client):
    """fakesource_to_elasticsearch_with_upper_case_index.conf: index
    template st_${table_name} resolves and is LOWERCASED
    (VariableIndexSerializer.java:57; IT testFakeSourceToElastic-
    searchWithUpperCaseIndex)."""
    _run(spark, f"{_RES}/fakesource_to_elasticsearch_with_upper_case_index.conf")
    srv, _ = es
    upper = [n for n in srv.indices if n != n.lower()]
    assert not upper
    created = [n for n in srv.indices if n.startswith("st_") and
               srv.indices[n]["docs"]]
    assert created


def test_sink_changelog_delete(spark, es, client):
    """RowKind semantics (ElasticsearchRowSerializer.java:69-82):
    +I/+U upsert by primary key, -U/-D delete."""
    from pyspark.sql import types as T

    from seatunnel_spark.sinks.elasticsearch import EsSink
    from seatunnel_spark.types import ROW_KIND_COL

    _, port = es
    rows = [(1, "a", "+I"), (2, "b", "+I"), (1, "a2", "+U"), (2, "b", "-D")]
    df = spark.createDataFrame(
        rows, T.StructType([T.StructField("id", T.IntegerType()),
                            T.StructField("v", T.StringType()),
                            T.StructField(ROW_KIND_COL, T.StringType())]))
    # single partition so the bulk order matches the changelog order
    sink = EsSink({"hosts": [f"http://127.0.0.1:{port}"],
                   "index": "chlog", "primary_keys": ["id"]})
    sink.write(df.coalesce(1))
    srv, _ = es
    docs = srv.indices["chlog"]["docs"]
    assert docs == {"1": {"id": 1, "v": "a2"}}


def test_scroll_pagination_and_slices(spark, es, client):
    """scroll_size forces multi-page scrolls; slice_count fans the read
    out — total rows must be exact either way."""
    from seatunnel_spark.sources.elasticsearch import EsSource

    _, port = es
    for slices in (1, 5):
        src = EsSource({"hosts": [f"http://127.0.0.1:{port}"],
                        "index": "st_index", "scroll_size": 7,
                        "slice_count": slices,
                        "schema": {"fields": {"c_int": "int"}}})
        assert src.read(spark).count() == 100


def test_savemode_recreate_and_error(spark, es, client):
    from seatunnel_spark.sinks.elasticsearch import EsSink

    _, port = es
    df = spark.range(3).withColumnRenamed("id", "k")
    base = {"hosts": [f"http://127.0.0.1:{port}"], "index": "sv_index"}
    EsSink(base).write(df)
    client.refresh("sv_index")
    assert client.count("sv_index") == 3
    EsSink({**base, "data_save_mode": "DROP_DATA"}).write(df)
    assert client.count("sv_index") == 3  # dropped then rewritten
    with pytest.raises(ValueError, match="ERROR_WHEN_DATA_EXISTS"):
        EsSink({**base, "data_save_mode": "ERROR_WHEN_DATA_EXISTS"}).write(df)
    EsSink({**base, "schema_save_mode": "RECREATE_SCHEMA",
            "data_save_mode": "APPEND_DATA"}).write(df)
    assert client.count("sv_index") == 3
    with pytest.raises(ValueError, match="ERROR_WHEN_SCHEMA_NOT_EXIST"):
        EsSink({"hosts": [f"http://127.0.0.1:{port}"], "index": "nope",
                "schema_save_mode": "ERROR_WHEN_SCHEMA_NOT_EXIST"}).write(df)
