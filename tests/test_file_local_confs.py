"""Run the reference's connector-file-local e2e confs UNMODIFIED.

The confs address a container filesystem (/seatunnel/read/... — the
paths LocalFileIT copies or packs resources into; this fixture mirrors
its setup, LocalFileIT.java:80-280). The
$SEATUNNEL_SPARK_PATH_ALIASES prefix remap (sources/file.py:
resolve_path_aliases) is the volume-mount analog, so the conf files
themselves run as shipped. Exercises the parquet/json/orc/text/csv/
xml/binary read strategies, Hive-delimited TEXT/CSV decoding, regex
delimiters, null_format, date/time formats, per-file header skip,
gz/zip/tar/tar.gz archives, GBK encoding, partition-dir fields,
read_columns projection, cast-on-read, multi-table file jobs, write
round trips (text/csv/json/parquet/orc), savemode, sink placeholders,
and the binary file-copy round trip."""

import gzip
import os
import shutil
import tarfile
import zipfile

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-local-e2e/src/test/resources")

# container path (relative to /seatunnel) -> resource file
_LAYOUT = {
    "read/parquet/name=tyrantlucifer/hobby=coding/e2e.parquet":
        "parquet/e2e.parquet",
    "read/json/name=tyrantlucifer/hobby=coding/e2e.json": "json/e2e.json",
    "read/orc/name=tyrantlucifer/hobby=coding/e2e.orc": "orc/e2e.orc",
    "read/orc_cast/e2e.orc": "orc/orc_for_cast.orc",
    "read/text/name=tyrantlucifer/hobby=coding/e2e.txt": "text/e2e.txt",
    "read/text_delimiter/e2e.txt": "text/e2e_delimiter.txt",
    "read/text_time_format/e2e.txt": "text/e2e_time_format.txt",
    "read/e2e_null_format/e2e_null_format.txt": "text/e2e_null_format.txt",
    "read/encoding/text/e2e_gbk.txt": "text/e2e_gbk.txt",
    "read/encoding/json/e2e_gbk.json": "json/e2e_gbk.json",
    "read/binary/cat.png": "binary/cat.png",
    "read/xml/e2e.xml": "xml/e2e.xml",
    "read/excel/name=tyrantlucifer/hobby=coding/e2e.xlsx": "excel/e2e.xlsx",
    "read/excel/name=tyrantlucifer/hobby=coding/e2e.xls": "excel/e2e.xls",
    "read/excel_filter/name=tyrantlucifer/hobby=coding/e2e_filter.xlsx":
        "excel/e2e.xlsx",
}

# archives LocalFileIT packs at setup: target -> (codec, source, count)
_ARCHIVES = {
    "read/gz/txt/single/e2e-txt-gz.gz": ("gz", "text/e2e.txt", 1),
    "read/zip/txt/single/e2e-txt.zip": ("zip", "text/e2e.txt", 1),
    "read/zip/txt/multifile/multiZip.zip": ("zip", "text/e2e.txt", 2),
    "read/tar/txt/single/e2e-txt.tar": ("tar", "text/e2e.txt", 1),
    "read/tar/txt/multifile/multiTar.tar": ("tar", "text/e2e.txt", 2),
    "read/tar_gz/txt/single/e2e-txt.tar.gz": ("tar_gz", "text/e2e.txt", 1),
    "read/tar_gz/txt/multifile/multiTarGz.tar.gz":
        ("tar_gz", "text/e2e.txt", 2),
    "read/gz/json/single/e2e-json-gz.gz": ("gz", "json/e2e.json", 1),
    "read/zip/json/single/e2e-json.zip": ("zip", "json/e2e.json", 1),
    "read/zip/json/multifile/multiJson.zip": ("zip", "json/e2e.json", 2),
    "read/gz/xml/single/e2e-xml-gz.gz": ("gz", "xml/e2e.xml", 1),
    "read/zip/xml/single/e2e-xml.zip": ("zip", "xml/e2e.xml", 1),
    "read/zip/excel/single/e2e-xlsx.zip": ("zip", "excel/e2e.xlsx", 1),
    "read/zip/excel/multifile/multiZip.zip": ("zip", "excel/e2e.xlsx", 2),
    "read/gz/excel/single/e2e-gz.xls.gz": ("gz", "excel/e2e.xls", 1),
    "read/gz/excel/single/e2e-gz.xlsx.gz": ("gz", "excel/e2e.xlsx", 1),
}

# Ordered like LocalFileIT.testLocalFileReadAndWrite: write jobs run
# before the assert jobs that read their output (csv pair, binary pair).
FILE_CONFS = [
    "parquet/local_file_parquet_to_assert.conf",
    "parquet/local_file_parquet_projection_to_assert.conf",
    "parquet/local_file_to_console.conf",
    "parquet/fake_to_local_file_parquet.conf",
    "parquet/local_file_parquet_to_assert_with_multipletable.conf",
    "json/local_file_json_to_assert.conf",
    "json/local_file_to_console.conf",
    "json/fake_to_local_file_json.conf",
    "json/fake_to_local_file_json_save_mode.conf",
    "json/fake_to_local_file_json_with_encoding.conf",
    "json/local_file_json_to_console_with_encoding.conf",
    "json/local_file_json_gz_to_assert.conf",
    "json/local_file_json_zip_to_assert.conf",
    "json/local_file_json_multi_zip_to_assert.conf",
    "json/local_file_json_to_assert_with_multipletable.conf",
    "orc/local_file_orc_to_assert.conf",
    "orc/local_file_orc_projection_to_assert.conf",
    "orc/fake_to_local_file_orc.conf",
    "orc/local_file_orc_to_assert_with_multipletable.conf",
    "orc/local_file_orc_to_assert_with_time_and_cast.conf",
    "text/local_file_text_to_assert.conf",
    "text/local_file_text_projection_to_assert.conf",
    "text/local_file_delimiter_assert.conf",
    "text/local_file_null_format_assert.conf",
    "text/local_file_text_skip_headers.conf",
    "text/local_file_time_format_assert.conf",
    "text/local_file_text_to_console_with_encoding.conf",
    "text/fake_to_local_file_text.conf",
    "text/fake_to_local_file_with_encoding.conf",
    "text/fake_to_local_file_with_multiple_table.conf",
    "text/local_file_gz_text_to_assert.conf",
    "text/local_file_zip_text_to_assert.conf",
    "text/local_file_multi_zip_text_to_assert.conf",
    "text/local_file_tar_text_to_assert.conf",
    "text/local_file_multi_tar_text_to_assert.conf",
    "text/local_file_tar_gz_text_to_assert.conf",
    "text/local_file_multi_tar_gz_text_to_assert.conf",
    "text/local_file_text_to_assert_with_multipletable.conf",
    "csv/fake_to_local_csv.conf",
    "csv/local_csv_to_assert.conf",
    "xml/local_file_xml_to_assert.conf",
    "xml/local_file_gz_xml_to_assert.conf",
    "xml/local_file_zip_xml_to_assert.conf",
    "binary/local_file_binary_to_local_file_binary.conf",
    "binary/local_file_binary_to_assert.conf",
    "binary/local_file_binary_to_local_file_binary_with_multipletable.conf",
    "excel/local_excel_to_assert.conf",
    "excel/local_excel_projection_to_assert.conf",
    "excel/local_filter_excel_to_assert.conf",
    "excel/local_excel_to_assert_with_multipletable.conf",
    "excel/local_excel_zip_to_assert.conf",
    "excel/local_excel_multi_zip_to_assert.conf",
    "excel/local_excel_xls_gz_to_assert.conf",
    "excel/local_excel_xlsx_gz_to_assert.conf",
    "excel/fake_to_local_excel.conf",
    "text/local_file_text_lzo_to_assert.conf",
    "json/local_file_json_lzo_to_console.conf",
]


def _pack(codec: str, src: str, count: int, dst: str) -> None:
    name = os.path.basename(src)
    if codec == "gz":
        with open(src, "rb") as fh, gzip.open(dst, "wb") as gz:
            shutil.copyfileobj(fh, gz)
    elif codec == "zip":
        with zipfile.ZipFile(dst, "w") as zf:
            for i in range(count):
                zf.write(src, arcname=f"{i}_{name}" if count > 1 else name)
    else:
        mode = "w:gz" if codec == "tar_gz" else "w"
        with tarfile.open(dst, mode) as tf:
            for i in range(count):
                tf.add(src, arcname=f"{i}_{name}" if count > 1 else name)


@pytest.fixture(scope="module")
def file_layout(tmp_path_factory):
    if not os.path.isdir(_RES):
        pytest.skip("reference resources missing")
    root = tmp_path_factory.mktemp("seatunnel_files")
    for rel, src in _LAYOUT.items():
        dst = root / "seatunnel" / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{_RES}/{src}", dst)
    for rel, (codec, src, count) in _ARCHIVES.items():
        dst = root / "seatunnel" / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        _pack(codec, f"{_RES}/{src}", count, str(dst))
    # lzop fixtures: the IT compresses at runtime with airlift
    # LzopCodec; the s3 suite ships the identical payloads pre-framed
    # (same md5 as this suite's e2e.txt/e2e.json), decoded by the
    # stdlib LZO1X decompressor (formats/lzo.py)
    s3res = _RES.replace("connector-file-local-e2e",
                         "connector-file-s3-e2e")
    for rel, src in [("read/lzo_text/e2e.txt", "text/e2e.txt.lzo"),
                     ("read/lzo_json/e2e.json", "json/e2e.json.lzo")]:
        dst = root / "seatunnel" / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{s3res}/{src}", dst)
    old = os.environ.get("SEATUNNEL_SPARK_PATH_ALIASES")
    os.environ["SEATUNNEL_SPARK_PATH_ALIASES"] = (
        f"/seatunnel={root}/seatunnel,/tmp={root}/tmp")
    yield root
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_PATH_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_PATH_ALIASES"] = old


@pytest.mark.parametrize("conf", FILE_CONFS)
def test_file_local_conf_runs_unmodified(spark, file_layout, conf):
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
