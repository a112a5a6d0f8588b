"""connector-hive-e2e confs UNMODIFIED through the session catalog.

Spark IS a Hive-compatible engine: the session catalog + local
warehouse stand in for the metastore + HDFS (metastore_uri and
hive.hadoop.conf* are deployment config — on a real cluster the same
confs run with spark.sql.catalogImplementation=hive pointed at the
thrift URI). The on_s3/on_oss/on_cos variants differ only in the
warehouse filesystem, which is hadoop config, orthogonal to the
write/read semantics. Kerberos confs are the named exclusion."""

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-hive-e2e/src/test/resources")


@pytest.mark.parametrize("write_conf,assert_conf,table", [
    ("fake_to_hive.conf", "hive_to_assert.conf",
     "default.test_hive_sink_on_hdfs"),
    ("fake_to_hive_on_s3.conf", "hive_on_s3_to_assert.conf",
     "test_hive.test_hive_sink_on_s3"),
    ("fake_to_hive_on_oss.conf", "hive_on_oss_to_assert.conf",
     "test_hive.test_hive_sink_on_oss"),
    ("fake_to_hive_on_cos.conf", "hive_on_cos_to_assert.conf",
     "test_hive.test_hive_sink_on_cos"),
])
def test_hive_write_then_read_confs(spark, write_conf, assert_conf,
                                    table):
    """FakeSource full types -> Hive managed table, then the companion
    source conf reads it back and its Assert rules pass (HiveIT's four
    warehouse variants)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{write_conf}"))
        assert spark.table(table).count() > 0
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{assert_conf}"))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
