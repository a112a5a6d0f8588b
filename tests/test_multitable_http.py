"""Multi-table routing + HTTP source (with injected fetcher — no network)."""

import json

from pyspark.sql import functions as F

from seatunnel_spark.job.engine import merge_multi_table, run_job
from seatunnel_spark.sinks.memory import InMemorySink
from seatunnel_spark.sources.http import HttpSource
from seatunnel_spark.types import TABLE_ID_COL


def test_multi_table_route_and_per_table_write(spark, tmp_path):
    a = spark.createDataFrame([(1, "x")], ["id", "v"])
    b = spark.createDataFrame([(2, "y"), (3, "z")], ["id", "v"])
    merged = merge_multi_table({"db.t_a": a, "db.t_b": b})
    assert merged.count() == 3
    # route back out per table (the MultiTableSink fan-out analog)
    for tid, expected in [("db.t_a", 1), ("db.t_b", 2)]:
        part = merged.filter(F.col(TABLE_ID_COL) == tid)
        out = str(tmp_path / tid.replace(".", "_"))
        part.drop(TABLE_ID_COL).write.parquet(out)
        assert spark.read.parquet(out).count() == expected


def test_multi_table_superset_schema(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "only_a"])
    b = spark.createDataFrame([(2, 3.5)], ["id", "only_b"])
    merged = merge_multi_table({"ta": a, "tb": b})
    assert set(merged.columns) == {"id", "only_a", "only_b", TABLE_ID_COL}
    row_a = merged.filter(F.col(TABLE_ID_COL) == "ta").first()
    assert row_a["only_b"] is None  # superset-schema null fill


def test_http_source_with_fake_fetcher(spark):
    payload = json.dumps([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])

    def fake_fetcher(url, method, headers, params, body, page_spec):
        assert url == "http://example.test/api"
        return [payload]

    src = HttpSource({
        "url": "http://example.test/api",
        "format": "json",
        "schema": {"fields": {"id": "int", "name": "string"}},
        "_fetcher": fake_fetcher,
    })
    df = src.read(spark)
    assert [(r["id"], r["name"]) for r in df.orderBy("id").collect()] == [
        (1, "a"), (2, "b")
    ]


def test_http_pagination(spark):
    pages = {1: [{"id": 1}], 2: [{"id": 2}], 3: [{"id": 3}]}

    def fake_fetcher(url, method, headers, params, body, page_spec):
        total = int(page_spec["total_page_size"])
        return [json.dumps(pages[p]) for p in range(1, total + 1)]

    src = HttpSource({
        "url": "http://example.test/api",
        "schema": {"fields": {"id": "int"}},
        "pageing": {"total_page_size": 3, "page_field": "page"},
        "_fetcher": fake_fetcher,
    })
    assert src.read(spark).count() == 3


def test_multi_table_job_through_engine(spark, sf_dir, tmp_path):
    """Two sources -> TableMerge across DAG branches -> one sink."""
    cfg = {
        "source": [
            {"plugin_name": "LocalFile", "plugin_output": "n1",
             "path": f"{sf_dir}/nation.parquet", "file_format_type": "parquet"},
            {"plugin_name": "LocalFile", "plugin_output": "n2",
             "path": f"{sf_dir}/nation.parquet", "file_format_type": "parquet"},
        ],
        "transform": [
            {"plugin_name": "TableMerge", "plugin_input": ["n1", "n2"],
             "plugin_output": "merged", "table_match_regex": ".*",
             "database": "db", "table": "all_nations"},
        ],
        "sink": [{"plugin_name": "InMemory", "plugin_input": "merged",
                  "name": "mt_out"}],
    }
    run_job(cfg, spark)
    out = InMemorySink.get("mt_out")
    assert out.count() == 50  # both branches merged
    assert {r[TABLE_ID_COL] for r in out.select(TABLE_ID_COL).distinct().collect()} \
        == {"db.all_nations"}


def test_myhours_login_then_fetch(spark):
    """MyHours wrapper: POST login -> accessToken -> Bearer on data GET
    (MyHoursSource.java:85-111)."""
    import json as _json

    from seatunnel_spark.sources import get_source
    from seatunnel_spark.testing.rest_servers import _Handler, _serve

    seen = {}

    class H(_Handler):
        def do_POST(self):
            body = _json.loads(self._body())
            assert self.path == "/api/tokens/login"
            assert body["grantType"] == "password" and body["clientId"] == "api"
            seen["login"] = body["email"]
            self._reply(200, {"accessToken": "tok-123"})

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            self._reply(200, [{"id": 1, "name": "proj"},
                              {"id": 2, "name": "other"}])

    port, stop = _serve(H)
    try:
        src = get_source("MyHours", {
            "url": f"http://127.0.0.1:{port}/api/Projects",
            "_login_url": f"http://127.0.0.1:{port}/api/tokens/login",
            "email": "u@example.test", "password": "pw",
            "schema": {"fields": {"id": "int", "name": "string"}},
        })
        rows = src.read(spark).collect()
        assert sorted(r["id"] for r in rows) == [1, 2]
        assert seen["auth"] == "Bearer tok-123"
        assert seen["login"] == "u@example.test"
    finally:
        stop()
