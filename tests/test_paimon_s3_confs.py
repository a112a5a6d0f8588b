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


def test_s3_fake_to_hudi_conf(spark, minio, tmp_path, monkeypatch):
    """s3_fake_to_hudi.conf (HudiSeatunnelS3MultiTableIT): hudi
    multi-table sink on an s3a:// warehouse with fs.s3a.* read from
    the conf_files_path core-site.xml — both tables' snapshots land in
    the bucket over the SigV4 wire."""
    import os
    import shutil

    from seatunnel_spark.sinks.lakehouse import LakehouseTable, _S3Mirror
    from seatunnel_spark.s3_fs import S3Client

    # the IT copies core-site.xml to this exact path
    os.makedirs("/tmp/seatunnel/config", exist_ok=True)
    shutil.copy(
        "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-hudi-e2e/src/test/resources/hudi/core-site.xml",
        "/tmp/seatunnel/config/core-site.xml")
    conf = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
            "connector-hudi-e2e/src/test/resources/hudi/"
            "s3_fake_to_hudi.conf")
    JobEngine(spark).run(JobSpec.from_file(conf))
    keys = [k for (b, k) in minio.objects if b == "hudi"]
    assert any(k.startswith("st1/st_test_1/") for k in keys), keys[:5]
    # second table_list entry declares no database -> default
    assert any("st_test_2/" in k for k in keys), sorted(
        {k.split("/")[0] + "/" + k.split("/")[1] for k in keys})

    # read back THROUGH the bucket
    import tempfile

    port = minio  # the fixture returns the server; find its port below
    cl = S3Client(os.environ["SEATUNNEL_SPARK_HOST_ALIASES"]
                  .split("minio=")[1].split(",")[0],
                  "hudi", "minio", "miniominio")
    t = LakehouseTable(str(tmp_path / "cache"),
                       remote=_S3Mirror(cl, "st1/st_test_1"))
    assert t.read(spark).count() == 100
