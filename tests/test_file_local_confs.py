"""Run the reference's connector-file-local e2e confs UNMODIFIED.

The confs address a container filesystem (/seatunnel/read/... — the
paths LocalFileIT copies resources into); the
$SEATUNNEL_SPARK_PATH_ALIASES prefix remap (sources/file.py:
resolve_path_aliases) is the volume-mount analog, so the conf files
themselves run as shipped. Exercises the parquet/json/orc/text/xml/
binary read strategies, Hive-delimited TEXT decoding, regex
delimiters, null_format, partition-dir fields, read_columns
projection, and the binary file-copy round trip."""

import os
import shutil

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
    "read/text/name=tyrantlucifer/hobby=coding/e2e.txt": "text/e2e.txt",
    "read/text_delimiter/e2e.txt": "text/e2e_delimiter.txt",
    "read/e2e_null_format/e2e_null_format.txt": "text/e2e_null_format.txt",
    "read/binary/cat.png": "binary/cat.png",
    "read/xml/e2e.xml": "xml/e2e.xml",
}

# (conf, depends-on-previous) — binary_to_assert reads the output of the
# binary copy job, mirroring LocalFileIT's execution order.
FILE_CONFS = [
    "parquet/local_file_parquet_to_assert.conf",
    "parquet/local_file_parquet_projection_to_assert.conf",
    "json/local_file_json_to_assert.conf",
    "orc/local_file_orc_to_assert.conf",
    "orc/local_file_orc_projection_to_assert.conf",
    "text/local_file_text_to_assert.conf",
    "text/local_file_text_projection_to_assert.conf",
    "text/local_file_delimiter_assert.conf",
    "text/local_file_null_format_assert.conf",
    "xml/local_file_xml_to_assert.conf",
    "binary/local_file_binary_to_local_file_binary.conf",
    "binary/local_file_binary_to_assert.conf",
]


@pytest.fixture(scope="module")
def file_layout(tmp_path_factory):
    if not os.path.isdir(_RES):
        pytest.skip("reference resources missing")
    root = tmp_path_factory.mktemp("seatunnel_files")
    for rel, src in _LAYOUT.items():
        dst = root / "seatunnel" / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f"{_RES}/{src}", dst)
    old = os.environ.get("SEATUNNEL_SPARK_PATH_ALIASES")
    os.environ["SEATUNNEL_SPARK_PATH_ALIASES"] = f"/seatunnel={root}/seatunnel"
    yield root
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_PATH_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_PATH_ALIASES"] = old


def test_file_local_confs_run_unmodified(spark, file_layout):
    # One ordered pass (the binary pair is a write-then-read chain).
    for conf in FILE_CONFS:
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{conf}"))
