"""connector-prometheus-e2e confs UNMODIFIED against the mini
Prometheus (remote-write receiver + /api/v1/query(_range) HTTP API;
VictoriaMetrics speaks the same two surfaces, so both conf families
run against the one server — PrometheusIT / VictoriaMetricsIT)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.misc_servers import start_mini_prometheus

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-prometheus-e2e/src/test/resources")


@pytest.fixture()
def prom(monkeypatch):
    received, port, stop = start_mini_prometheus()
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_HOST_ALIASES",
        f"prometheus-host=http://127.0.0.1:{port},"
        f"victoria-metrics-host=http://127.0.0.1:{port}")
    yield received
    stop()


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


def test_prometheus_write_then_query_confs(spark, prom):
    """prometheus_remote_write.conf (FakeSource metric_1/metric_2 with
    CURRENT_TIMESTAMP through the snappy protobuf remote-write wire),
    then the instant and range query confs read metric_1 back through
    /api/v1/query(_range) and their Assert rules pass."""
    _run(spark, "prometheus_remote_write.conf")
    assert any(lbl.get("__name__") == "metric_1" for lbl, _ in prom)
    _run(spark, "prometheus_instant_json_to_assert.conf")
    _run(spark, "prometheus_range_json_to_assert.conf")


def test_victoriametrics_write_then_query_confs(spark, prom):
    """victoriaMetrics_remote_write.conf then
    VictoriaMetrics_instant_json_to_assert.conf — the VM API is
    prometheus-compatible on both the write and query side."""
    _run(spark, "victoriaMetrics_remote_write.conf")
    _run(spark, "VictoriaMetrics_instant_json_to_assert.conf")
