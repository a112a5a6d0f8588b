"""Reference connector-file-cos-e2e confs running UNMODIFIED against
the mini object server speaking COS q-sign auth — the CosFileIT analog
(write conf then matching read-assert conf per format)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.oss_server import start_mini_oss

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-cos-e2e/src/test/resources")


_S3RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
          "connector-file-s3-e2e/src/test/resources")


@pytest.fixture(scope="module")
def cos():
    srv, port, stop = start_mini_oss("dummy", "dummy", auth_prefix="COS")
    # the COS IT reads /read/<fmt> from a pre-provisioned bucket (no
    # resource fixtures in its tree); seed with the shared e2e corpus
    # the other file-connector suites use
    seeds = [("text/e2e.txt", "read/text/e2e.txt"),
             ("json/e2e.json", "read/json/e2e.json"),
             ("orc/e2e.orc", "read/orc/e2e.orc"),
             ("parquet/e2e.parquet", "read/parquet/e2e.parquet"),
             ("excel/e2e.xlsx", "read/excel/e2e.xlsx")]
    for src, dst in seeds:
        with open(os.path.join(_S3RES, src), "rb") as f:
            srv.seed("seatunnel-test", dst, f.read())
    old = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"cos.ap-chengdu.myqcloud.com=http://127.0.0.1:{port}"
    yield srv
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


@pytest.mark.parametrize("write_conf,read_conf", [
    ("text/fake_to_cos_file_text.conf", "text/cos_file_text_to_assert.conf"),
    ("json/fake_to_cos_file_json.conf", "json/cos_file_json_to_assert.conf"),
    ("orc/fake_to_cos_file_orc.conf", "orc/cos_file_orc_to_assert.conf"),
    ("parquet/fake_to_cos_file_parquet.conf",
     "parquet/cos_file_parquet_to_assert.conf"),
    ("excel/fake_to_cos_excel.conf", "excel/cos_excel_to_assert.conf"),
], ids=["text", "json", "orc", "parquet", "excel"])
def test_cos_write_then_read_confs(spark, cos, write_conf, read_conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{write_conf}"))
    assert cos.objects, "write conf produced no objects"
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{read_conf}"))
    assert cos.auth_failures == 0
