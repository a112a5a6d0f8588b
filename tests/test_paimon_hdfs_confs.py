"""PaimonSinkHdfsIT analog: the hdfs:///-warehouse paimon confs run
UNMODIFIED with the warehouse remapped by a PATH alias (the
volume-mount analog — fs.defaultFS / HA nameservice settings in
paimon.hadoop.conf are hadoop-client config, orthogonal to the
table/merge logic; a real deployment points the same confs at HDFS
with the hadoop jars on the classpath). The hive-catalog variants add
catalog_type/catalog_uri — metastore metadata, same directory layout."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.sinks.lakehouse import LakehouseTable

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-paimon-e2e/src/test/resources")


@pytest.fixture()
def hdfs_alias(tmp_path, monkeypatch):
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_PATH_ALIASES",
        f"hdfs:///tmp/paimon={tmp_path}/paimon,"
        f"hdfs:///tmp/seatunnel={tmp_path}/seatunnel")
    return tmp_path


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


def test_paimon_hdfs_ha_write_then_read_confs(spark, hdfs_alias):
    """fake_cdc_sink_paimon_with_hdfs_ha.conf (changelog merge under
    the HA-nameservice warehouse) then
    read_from_paimon_with_hdfs_ha_to_assert.conf (query-pushdown read
    with its own Assert rules)."""
    _run(spark, "fake_cdc_sink_paimon_with_hdfs_ha.conf")
    t = LakehouseTable(
        str(hdfs_alias / "paimon" / "seatunnel_namespace1" / "st_test"))
    assert t.exists()
    _run(spark, "read_from_paimon_with_hdfs_ha_to_assert.conf")


def test_paimon_hive_catalog_write_then_read_confs(spark, hdfs_alias):
    """The hive-catalog pair (catalog_type=hive + thrift catalog_uri):
    fake_cdc_sink_paimon_with_hdfs_with_hive_catalog.conf then
    paimon_to_assert_with_hivecatalog.conf."""
    _run(spark, "fake_cdc_sink_paimon_with_hdfs_with_hive_catalog.conf")
    _run(spark, "paimon_to_assert_with_hivecatalog.conf")


@pytest.mark.parametrize("case1,case2,ns", [
    ("fake_sink_paimon_truncate_with_hdfs_case1.conf",
     "fake_sink_paimon_truncate_with_hdfs_case2.conf",
     "seatunnel_namespace11"),
    ("fake_sink_paimon_truncate_with_hive_case1.conf",
     "fake_sink_paimon_truncate_with_hive_case2.conf",
     "seatunnel_namespace12"),
])
def test_paimon_truncate_confs(spark, hdfs_alias, case1, case2, ns):
    """DROP_DATA truncation (PaimonSinkHdfsIT truncate cases): case1
    seeds rows, case2 with data_save_mode=DROP_DATA replaces them —
    the table ends with ONLY case2's rows."""
    _run(spark, case1)
    t = LakehouseTable(str(hdfs_alias / "paimon" / ns / "st_test"))
    first = {r["pk_id"]: r["name"] for r in t.read(spark).collect()}
    assert first, "case1 wrote nothing"
    _run(spark, case2)
    second = {r["pk_id"]: r["name"] for r in t.read(spark).collect()}
    assert second == {1: "Aa", 2: "Bb"}, second  # truncated + rewritten
