"""Reference connector-file-oss-e2e confs running UNMODIFIED against
the mini OSS server (path-style REST + verified HMAC-SHA1 signatures)
— the OssFileIT analog. Seed layout mirrors OssFileIT.uploadTestFiles;
the lzop fixtures decode via the stdlib LZO1X decompressor
(formats/lzo.py)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.oss_server import start_mini_oss

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-oss-e2e/src/test/resources")
_BUCKET = "whale-ops"


@pytest.fixture(scope="module")
def oss():
    srv, port, stop = start_mini_oss("xxxxxxxxxxxxxxxxxxx",
                                     "xxxxxxxxxxxxxxxxxxx")
    seeds = [
        ("json/e2e.json",
         "test/seatunnel/read/json/name=tyrantlucifer/hobby=coding/"
         "e2e.json"),
        ("text/e2e.txt",
         "test/seatunnel/read/text/name=tyrantlucifer/hobby=coding/"
         "e2e.txt"),
        ("text/e2e_delimiter.txt",
         "test/seatunnel/read/text_delimiter/e2e.txt"),
        ("text/e2e_time_format.txt",
         "test/seatunnel/read/text_time_format/e2e.txt"),
        ("excel/e2e.xlsx",
         "test/seatunnel/read/excel/name=tyrantlucifer/hobby=coding/"
         "e2e.xlsx"),
        ("orc/e2e.orc",
         "test/seatunnel/read/orc/name=tyrantlucifer/hobby=coding/"
         "e2e.orc"),
        ("parquet/e2e.parquet",
         "test/seatunnel/read/parquet/name=tyrantlucifer/hobby=coding/"
         "e2e.parquet"),
        ("excel/e2e.xlsx",
         "test/seatunnel/read/excel_filter/name=tyrantlucifer/"
         "hobby=coding/e2e_filter.xlsx"),
        ("text/e2e-text.zip",
         "test/seatunnel/read/text_zip/e2e-text.zip"),
        ("json/e2e.json.lzo", "test/seatunnel/read/lzo_json/e2e.json"),
        ("text/e2e.txt.lzo", "test/seatunnel/read/lzo_text/e2e.txt"),
    ]
    for src, dst in seeds:
        with open(os.path.join(_RES, src), "rb") as f:
            srv.seed(_BUCKET, dst, f.read())
    old = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"oss-accelerate.aliyuncs.com=http://127.0.0.1:{port}"
    yield srv
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


@pytest.mark.parametrize("conf,out_prefix", [
    ("text/fake_to_oss_file_text.conf", "tmp/seatunnel/text"),
    ("json/fake_to_oss_file_json.conf", "tmp/seatunnel/json"),
    ("parquet/fake_to_oss_file_parquet.conf", "tmp/seatunnel/parquet"),
    ("orc/fake_to_oss_file_orc.conf", "tmp/seatunnel/orc"),
    ("excel/fake_to_oss_excel.conf", "test/seatunnel/sink"),
])
def test_fake_to_oss_write_confs(spark, oss, conf, out_prefix):
    _run(spark, conf)
    keys = [k for (b, k) in oss.objects if b == _BUCKET
            and k.startswith(out_prefix)]
    assert keys, f"no objects written for {conf}"
    assert oss.auth_failures == 0


def test_fake_to_oss_multiple_table_conf(spark, oss):
    _run(spark, "text/fake_to_oss_file_with_multiple_table.conf")
    keys = [k for (b, k) in oss.objects if b == _BUCKET
            and k.startswith("tmp/fake_empty/text/")]
    tables = {k.split("/")[3] for k in keys}
    assert keys and len(tables) >= 2, (keys, tables)


@pytest.mark.parametrize("conf", [
    "text/oss_file_text_to_assert.conf",
    "text/oss_file_text_projection_to_assert.conf",
    "text/oss_file_text_skip_headers.conf",
    "text/oss_file_delimiter_assert.conf",
    "text/oss_file_time_format_assert.conf",
    "text/oss_file_zip_text_to_assert.conf",
    "text/oss_file_text_lzo_to_assert.conf",
    "json/oss_file_json_to_assert.conf",
    "excel/oss_excel_to_assert.conf",
    "excel/oss_excel_projection_to_assert.conf",
    "excel/oss_filter_excel_to_assert.conf",
    "orc/oss_file_orc_to_assert.conf",
    "orc/oss_file_orc_projection_to_assert.conf",
    "parquet/oss_file_parquet_to_assert.conf",
    "parquet/oss_file_parquet_projection_to_assert.conf",
])
def test_oss_read_to_assert_confs(spark, oss, conf):
    _run(spark, conf)


@pytest.mark.parametrize("conf", [
    "json/oss_file_to_console.conf",
    "parquet/oss_file_to_console.conf",
    "json/oss_file_json_lzo_to_console.conf",
])
def test_oss_empty_prefix_to_console_confs(spark, oss, conf):
    with oss.lock:
        for bk in [bk for bk in oss.objects
                   if bk[1].startswith("tmp/fake_empty")]:
            oss.objects.pop(bk)
    _run(spark, conf)


@pytest.mark.parametrize("conf", [
    "json/oss_file_json_to_assert_with_multipletable.conf",
    "text/oss_file_text_to_assert_with_multipletable.conf",
    "orc/oss_file_orc_to_assert_with_multipletable.conf",
    "parquet/oss_file_parquet_to_assert_with_multipletable.conf",
    "excel/oss_excel_to_assert_with_multipletable.conf",
])
def test_oss_multipletable_read_confs(spark, oss, conf):
    _run(spark, conf)
