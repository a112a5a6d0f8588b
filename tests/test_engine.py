"""End-to-end job tests: the reference's e2e pattern
(FakeSource -> transform -> Assert sink, SURVEY.md §5) on local Spark."""

import pytest

from seatunnel_spark.job.engine import run_job
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sinks.assert_sink import AssertError
from seatunnel_spark.sinks.memory import InMemorySink


def test_fake_to_sql_to_assert(spark):
    # The reference's canonical e2e job shape (sql_transform.conf analog).
    cfg = {
        "env": {"job.mode": "BATCH"},
        "source": [
            {
                "plugin_name": "FakeSource",
                "plugin_output": "fake",
                "row.num": 100,
                "int.min": 0,
                "int.max": 100,
                "schema": {"fields": {"id": "bigint", "name": "string", "age": "int"}},
            }
        ],
        "transform": [
            {
                "plugin_name": "Sql",
                "plugin_input": "fake",
                "plugin_output": "fake1",
                "query": "SELECT id, UCASE(name) AS name, age FROM fake WHERE age >= 0",
            }
        ],
        "sink": [
            {
                "plugin_name": "Assert",
                "plugin_input": "fake1",
                "rules": {
                    "row_rules": [
                        {"rule_type": "MIN_ROW", "rule_value": 100},
                        {"rule_type": "MAX_ROW", "rule_value": 100},
                    ],
                    "field_rules": [
                        {
                            "field_name": "name",
                            "field_type": "string",
                            "field_value": [{"rule_type": "NOT_NULL"}],
                        },
                        {
                            "field_name": "age",
                            "field_value": [
                                {"rule_type": "MIN", "rule_value": 0},
                                {"rule_type": "MAX", "rule_value": 100},
                            ],
                        },
                    ],
                },
            }
        ],
    }
    run_job(cfg, spark)


def test_assert_failure_raises(spark):
    cfg = {
        "source": [
            {
                "plugin_name": "FakeSource",
                "plugin_output": "fake",
                "row.num": 10,
                "schema": {"fields": {"id": "bigint"}},
            }
        ],
        "sink": [
            {
                "plugin_name": "Assert",
                "plugin_input": "fake",
                "rules": {"row_rules": [{"rule_type": "MIN_ROW", "rule_value": 11}]},
            }
        ],
    }
    with pytest.raises(AssertError):
        run_job(cfg, spark)


def test_parquet_source_join_sql(spark, sf_dir):
    # File source + multi-input SQL join (impossible in the reference's
    # Zeta dialect; native here).
    cfg = {
        "source": [
            {"plugin_name": "LocalFile", "plugin_output": "nation",
             "path": f"{sf_dir}/nation.parquet", "file_format_type": "parquet"},
            {"plugin_name": "LocalFile", "plugin_output": "region",
             "path": f"{sf_dir}/region.parquet", "file_format_type": "parquet"},
        ],
        "transform": [
            {
                "plugin_name": "Sql",
                "plugin_input": "nation",
                "plugin_output": "joined",
                "query": "SELECT n.n_name, r.r_name FROM nation n "
                         "JOIN region r ON n.n_regionkey = r.r_regionkey",
            }
        ],
        "sink": [
            {"plugin_name": "InMemory", "plugin_input": "joined", "name": "joined"}
        ],
    }
    run_job(cfg, spark)
    out = InMemorySink.get("joined")
    assert out.count() == 25
    assert set(out.columns) == {"n_name", "r_name"}


def test_fake_deterministic_across_partitions(spark):
    src = {
        "plugin_name": "FakeSource",
        "plugin_output": "f",
        "row.num": 50,
        "schema": {"fields": {"id": "bigint", "s": "string", "d": "double"}},
    }
    a = run_job({"source": [dict(src)], "sink": [
        {"plugin_name": "InMemory", "plugin_input": "f", "name": "a"}]}, spark)
    b_src = dict(src)
    b_src["split.num"] = 7
    run_job({"source": [b_src], "sink": [
        {"plugin_name": "InMemory", "plugin_input": "f", "name": "b"}]}, spark)
    a_rows = sorted(map(tuple, InMemorySink.get("a").collect()))
    b_rows = sorted(map(tuple, InMemorySink.get("b").collect()))
    assert a_rows == b_rows  # same data at any parallelism


def test_sql_config_format(spark, sf_dir):
    sql = f"""
/* config
env {{
  job.mode = BATCH
}}
*/
CREATE TABLE src WITH ('connector'='LocalFile', 'type'='source',
  'path'='{sf_dir}/region.parquet', 'file_format_type'='parquet');
CREATE TABLE dst WITH ('connector'='InMemory', 'type'='sink', 'name'='sqlcfg');
INSERT INTO dst SELECT r_regionkey, UPPER(r_name) AS r_name FROM src;
"""
    spec = JobSpec.from_sql(sql)
    from seatunnel_spark.job.engine import JobEngine

    JobEngine(spark).run(spec)
    out = InMemorySink.get("sqlcfg")
    assert out.count() == 5


def test_sink_metrics_via_observation(spark):
    """Per-sink rows_written metrics ride the write job itself (the
    Observation API) — no second scan of the data."""
    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec

    eng = JobEngine(spark)
    eng.run(JobSpec.from_dict({
        "source": [{"plugin_name": "FakeSource", "plugin_output": "f",
                    "row.num": 123,
                    "schema": {"fields": {"id": "bigint", "name": "string"}}}],
        "sink": [{"plugin_name": "InMemory", "plugin_input": "f",
                  "table": "obs_out"}],
    }))
    assert eng.metrics.get("InMemory.f.rows_written") == 123


def test_hive_source_reads_metastore_table(spark, sf_dir):
    """Hive source resolves table_name through the session catalog
    (the reference's metastore read), not a file path."""
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView(
        "hive_nation_view"
    )
    from seatunnel_spark.sources import get_source

    df = get_source("Hive", {"table_name": "hive_nation_view"}).read(spark)
    assert df.count() == 25
