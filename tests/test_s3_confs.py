"""Reference connector-file-s3-e2e confs running UNMODIFIED against
the mini S3 server (path-style REST + verified SigV4) — the S3FileIT
analog. Seed layout mirrors S3FileIT.uploadTestFiles, including the
lzop fixtures decoded by the stdlib LZO1X decompressor
(formats/lzo.py)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.s3_server import start_mini_s3

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-s3-e2e/src/test/resources")
_BUCKET = "ws-package"


@pytest.fixture(scope="module")
def s3():
    srv, port, stop = start_mini_s3("XXXXXX", "AWS_XXXX")
    srv.credentials["XXXXXXXX"] = "AWS_XXXX"  # the excel conf's key id
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
        f"s3.cn-north-1.amazonaws.com.cn=http://127.0.0.1:{port}"
    yield srv
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))


@pytest.mark.parametrize("conf,out_prefix", [
    ("text/fake_to_s3_file_text.conf", "tmp/seatunnel/text"),
    ("json/fake_to_s3_file_json.conf", "tmp/seatunnel/json"),
    ("parquet/fake_to_s3_file_parquet.conf", "tmp/seatunnel/parquet"),
    ("orc/fake_to_s3_file_orc.conf", "tmp/seatunnel/orc"),
    ("excel/fake_to_s3_excel.conf", "test/seatunnel/sink"),
])
def test_fake_to_s3_write_confs(spark, s3, conf, out_prefix):
    """FakeSource -> S3File sink: the local write pipeline uploaded via
    SigV4 PutObject; objects land under the conf's path prefix."""
    _run(spark, conf)
    keys = [k for (b, k) in s3.objects if b == _BUCKET
            and k.startswith(out_prefix)]
    assert keys, f"no objects written for {conf}"
    assert s3.auth_failures == 0


def test_fake_to_s3_multiple_table_conf(spark, s3):
    _run(spark, "text/fake_to_s3_file_with_multiple_table.conf")
    keys = [k for (b, k) in s3.objects if b == _BUCKET
            and k.startswith("tmp/fake_empty/text/")]
    # ${table_name} fan-out: at least two table prefixes
    tables = {k.split("/")[3] for k in keys}
    assert keys and len(tables) >= 2, (keys, tables)


@pytest.mark.parametrize("conf", [
    "text/s3_file_text_to_assert.conf",
    "text/s3_file_text_projection_to_assert.conf",
    "text/s3_file_text_skip_headers.conf",
    "text/s3_file_delimiter_assert.conf",
    "text/s3_file_time_format_assert.conf",
    "text/s3_file_zip_text_to_assert.conf",
    "text/s3_file_text_lzo_to_assert.conf",
    "json/s3_file_json_to_assert.conf",
    "excel/s3_excel_to_assert.conf",
    "excel/s3_excel_projection_to_assert.conf",
    "excel/s3_filter_excel_to_assert.conf",
    "orc/s3_file_orc_to_assert.conf",
    "orc/s3_file_orc_projection_to_assert.conf",
    "parquet/s3_file_parquet_to_assert.conf",
    "parquet/s3_file_parquet_projection_to_assert.conf",
])
def test_s3_read_to_assert_confs(spark, s3, conf):
    """S3File source confs with their own Assert rules — seeded objects
    read over the REST wire (partition-dir fields, projections, header
    skips, zip archives, excel decode, filename filters)."""
    _run(spark, conf)


@pytest.mark.parametrize("conf", ["json/s3_file_to_console.conf",
                                  "parquet/s3_file_to_console.conf",
                                  "json/s3_file_json_lzo_to_console.conf"])
def test_s3_empty_prefix_to_console_confs(spark, s3, conf):
    """s3_file_to_console.conf reads the EMPTY tmp/fake_empty prefix
    (S3FileIT.createDir) -> zero rows, exit 0. The multiple-table IT
    runs in its own bucket, so clear its writes first."""
    with s3.lock:
        for bk in [bk for bk in s3.objects
                   if bk[1].startswith("tmp/fake_empty")]:
            s3.objects.pop(bk)
    _run(spark, conf)


@pytest.mark.parametrize("conf", [
    "json/s3_file_json_to_assert_with_multipletable.conf",
    "text/s3_file_text_to_assert_with_multipletable.conf",
    "orc/s3_file_orc_to_assert_with_multipletable.conf",
    "parquet/s3_file_parquet_to_assert_with_multipletable.conf",
    "excel/s3_excel_to_assert_with_multipletable.conf",
])
def test_s3_multipletable_read_confs(spark, s3, conf):
    _run(spark, conf)
