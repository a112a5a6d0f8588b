"""Reference connector-file-ftp-e2e confs running UNMODIFIED against
the mini FTP server (RFC 959 passive mode) — the FtpFileIT analog.
Seed layout mirrors the IT's copyFileIntoContainers calls (vsftpd home
/home/vsftpd/seatunnel = the server root here)."""

import os
import shutil

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.ftp_server import start_mini_ftp

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-ftp-e2e/src/test/resources")


@pytest.fixture(scope="module")
def ftp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ftp_root"))
    # FtpFileIT seed map (vsftpd home-relative)
    seeds = [
        ("json/e2e.json",
         "tmp/seatunnel/read/json/name=tyrantlucifer/hobby=coding/e2e.json"),
        ("text/e2e.txt",
         "tmp/seatunnel/read/text/name=tyrantlucifer/hobby=coding/e2e.txt"),
        ("text/e2e-txt.zip",
         "tmp/seatunnel/read/zip/txt/single/e2e-txt.zip"),
        ("excel/e2e.xlsx",
         "tmp/seatunnel/read/excel/name=tyrantlucifer/hobby=coding/e2e.xlsx"),
        ("excel/e2e.xlsx",
         "tmp/seatunnel/read/excel_filter/name=tyrantlucifer/hobby=coding/"
         "e2e_filter.xlsx"),
    ]
    for src, dst in seeds:
        full = os.path.join(root, dst)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        shutil.copy(os.path.join(_RES, src), full)
    srv, port, stop = start_mini_ftp(root, "seatunnel", "pass")
    old = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"ftp=tcp://127.0.0.1:{port}"
    yield srv, root
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


def _run(spark, conf):
    # the passive confs take host via the -i variable feature
    # (FtpFileIT passes ftpHost/ftpPassivePort as job variables)
    JobEngine(spark).run(JobSpec.from_file(
        conf, variables={"ftpHost": "ftp", "ftpPassivePort": "21"}))


@pytest.mark.parametrize("conf,out_dir,fmt", [
    ("text/fake_to_ftp_file_text.conf", "tmp/seatunnel/text", "text"),
    ("text/fake_to_ftp_file_text_for_passive.conf",
     "tmp/seatunnel/passive_text", "text"),
    ("json/fake_to_ftp_file_json.conf", "tmp/seatunnel/json", "json"),
    ("parquet/fake_to_ftp_file_parquet.conf",
     "tmp/seatunnel/parquet", "parquet"),
    ("orc/fake_to_ftp_file_orc.conf", "tmp/seatunnel/orc", "orc"),
    ("excel/fake_source_to_ftp_excel.conf", "tmp/seatunnel/excel", "xlsx"),
])
def test_fake_to_ftp_write_confs(spark, ftp, conf, out_dir, fmt):
    """FakeSource -> FtpFile sink: the full local write pipeline
    (partition dirs, transactions, filename expressions) uploaded over
    the wire; files land in the server tree."""
    srv, root = ftp
    _run(spark, f"{_RES}/{conf}")
    written = []
    for r, _d, names in os.walk(os.path.join(root, out_dir)):
        written += [os.path.join(r, n) for n in names]
    assert written, f"no files uploaded for {conf}"
    assert any("STOR" in c for c in srv.commands)


def test_fake_to_ftp_root_path_excel_conf(spark, ftp):
    srv, root = ftp
    _run(spark, f"{_RES}/excel/fake_source_to_ftp_root_path_excel.conf")
    top = [n for n in os.listdir(root) if n.endswith(".xlsx")
           or os.path.isdir(os.path.join(root, n))]
    assert top


@pytest.mark.parametrize("conf", [
    "text/ftp_file_text_to_assert.conf",
    "text/ftp_file_text_to_assert_for_passive.conf",
    "text/ftp_file_text_projection_to_assert.conf",
    "text/ftp_file_text_skip_headers.conf",
    "text/ftp_file_zip_text_to_assert.conf",
    "json/ftp_file_json_to_assert.conf",
    "json/ftp_file_json_to_assert_with_multipletable.conf",
    "excel/ftp_excel_to_assert.conf",
    "excel/ftp_excel_projection_to_assert.conf",
    "excel/ftp_filter_excel_to_assert.conf",
])
def test_ftp_read_to_assert_confs(spark, ftp, conf):
    """FtpFile source confs with their own Assert rules: seeded e2e
    files read over the wire (partition-dir fields, projections, header
    skips, zip archives, excel decode, filename filters) — the conf's
    Assert sink is the oracle."""
    _run(spark, f"{_RES}/{conf}")


@pytest.mark.parametrize("conf,out_dir", [
    ("text/multiple_table_fake_to_ftp_file_text.conf",
     "tmp/seatunnel_mult/text"),
    ("text/multiple_table_fake_to_ftp_file_text_2.conf",
     "tmp/seatunnel_mult2/text"),
])
def test_multiple_table_fake_to_ftp_confs(spark, ftp, conf, out_dir):
    srv, root = ftp
    _run(spark, f"{_RES}/{conf}")
    tables = os.listdir(os.path.join(root, out_dir))
    assert len(tables) >= 2, tables  # ${table_name} fan-out


def test_ftp_to_ftp_binary_conf(spark, ftp):
    """ftp_to_ftp_for_binary.conf: byte-exact file COPY through two FTP
    legs (binary read rows -> binary write)."""
    srv, root = ftp
    _run(spark, f"{_RES}/text/ftp_to_ftp_for_binary.conf")
    src = os.path.join(
        root, "tmp/seatunnel/read/text/name=tyrantlucifer/hobby=coding/"
              "e2e.txt")
    uploads = []
    for r, _d, names in os.walk(os.path.join(root, "uploads/seatunnel")):
        uploads += [os.path.join(r, n) for n in names]
    assert uploads, "binary copy produced no files"
    with open(src, "rb") as f:
        want = f.read()
    got = b"".join(open(p, "rb").read() for p in uploads)
    assert got == want
