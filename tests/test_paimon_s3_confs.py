"""PaimonWithS3IT analog: the paimon S3-warehouse confs run UNMODIFIED
with table I/O over the SigV4 REST wire against the signature-verifying
mini S3 (fs.s3a.* from paimon.hadoop.conf -> _S3Mirror-backed local
cache; s3a://test/ = bucket `test` at the minio endpoint)."""

import os
import shutil
import tempfile

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.s3_server import start_mini_s3

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-paimon-e2e/src/test/resources")


@pytest.fixture()
def minio(monkeypatch):
    # the conf's minio credentials (fs.s3a.access-key/secret-key)
    srv, port, stop = start_mini_s3("minio", "miniominio")
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"minio=http://127.0.0.1:{port}")
    # fresh warehouse cache so prior runs can't mask the remote pull
    shutil.rmtree(os.path.join(tempfile.gettempdir(),
                               "st_s3_warehouse"), ignore_errors=True)
    yield srv
    stop()


@pytest.mark.parametrize("write_conf,assert_conf,ns", [
    ("fake_to_paimon_with_s3.conf", "paimon_with_s3_to_assert.conf",
     "seatunnel_namespace11"),
    ("fake_to_paimon_with_s3_with_checkpoint.conf",
     "fake_2_paimon_with_s3_to_assert.conf", "seatunnel_namespace12"),
])
def test_paimon_s3_write_then_read_confs(spark, minio, write_conf,
                                         assert_conf, ns):
    """FakeSource changelog -> Paimon pk-table on the s3a warehouse,
    then the companion Paimon-source conf reads it back over the wire
    and its Assert rules pass (PaimonWithS3IT's two conf pairs)."""
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{write_conf}"))
    # snapshot + _HEAD landed in the bucket (uploaded via PutObject)
    keys = [k for (b, k) in minio.objects if b == "test"
            and k.startswith(f"{ns}/st_test/")]
    assert any("_HEAD" in k for k in keys), keys
    assert any(".parquet" in k for k in keys), keys

    # wipe the local cache: the read MUST come from the bucket
    shutil.rmtree(os.path.join(tempfile.gettempdir(),
                               "st_s3_warehouse"), ignore_errors=True)
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{assert_conf}"))
