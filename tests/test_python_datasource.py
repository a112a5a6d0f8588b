"""Custom Python DataSource (Spark 4 DataSource API) — the reference's
SplitEnumerator/SourceReader SPI analog, driven with file:// pages."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def paged_endpoint(tmp_path):
    """4 'pages' of a REST endpoint as file:// JSON documents."""
    for p in range(4):
        doc = {"items": [{"id": p * 10 + i, "name": f"n{p}-{i}"} for i in range(10)]}
        (tmp_path / f"page{p}.json").write_text(json.dumps(doc))
    return f"file://{tmp_path}/page{{page}}.json"


def test_paged_rest_source_parallel_read(spark, paged_endpoint):
    from seatunnel_spark.sources.python_ds import register

    register(spark)
    df = (spark.read.format("seatunnel_rest")
          .schema("id BIGINT, name STRING")
          .option("url_template", paged_endpoint)
          .option("pages", 4)
          .option("data_path", "items")
          .load())
    # one input partition per page (the split-enumerator contract)
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 40
    assert sorted(r["id"] for r in rows) == list(range(40))
    # composes with ordinary Catalyst ops
    agg = df.groupBy((F.col("id") % 4).alias("m")).count().collect()
    assert all(r["count"] == 10 for r in agg)


def test_paged_rest_source_requires_schema_and_url(spark, paged_endpoint):
    from seatunnel_spark.sources.python_ds import register

    register(spark)
    with pytest.raises(Exception):  # missing url_template
        (spark.read.format("seatunnel_rest")
         .schema("id BIGINT").load().collect())


def test_rest_paged_engine_plugin(spark, paged_endpoint):
    """The format is also a first-class engine source plugin."""
    from seatunnel_spark import run_job

    tables = run_job({
        "source": [{
            "plugin_name": "RestPaged", "plugin_output": "api",
            "url_template": paged_endpoint, "pages": 4, "data_path": "items",
            "schema": {"fields": {"id": "bigint", "name": "string"}},
        }],
        "transform": [{
            "plugin_name": "Sql", "plugin_input": "api", "plugin_output": "agg",
            "query": "SELECT COUNT(*) AS n, MIN(id) AS lo, MAX(id) AS hi FROM api",
        }],
        "sink": [],
    }, spark)
    row = tables["agg"].first()
    assert (row["n"], row["lo"], row["hi"]) == (40, 0, 39)


def test_rest_paged_streaming_offsets(spark, paged_endpoint, tmp_path):
    """Streaming read of the same endpoint: the page number is the
    checkpointed offset; availableNow drains all existing pages."""
    from seatunnel_spark.sources.python_ds import register

    register(spark)
    stream = (spark.readStream.format("seatunnel_rest")
              .schema("id BIGINT, name STRING")
              .option("url_template", paged_endpoint)
              .option("data_path", "items")
              .option("pages_per_trigger", 2)
              .load())
    import time

    seen = []
    q = (stream.writeStream
         .foreachBatch(lambda b, _id: seen.extend(r["id"] for r in b.collect()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="500 milliseconds")
         .start())
    deadline = time.time() + 90
    while len(seen) < 40 and time.time() < deadline:
        time.sleep(0.3)
    q.stop()
    q.awaitTermination(30)
    # 4 pages × 10 rows drained across microbatches of 2 pages each
    assert sorted(seen) == list(range(40))
