"""Reference connector-file-sftp-e2e confs running UNMODIFIED against
the mini SSH/SFTP server (from-scratch SSH2 transport over
`cryptography`: curve25519-sha256 kex, ssh-ed25519 host key,
aes128-ctr + hmac-sha2-256, password auth, SFTP v3 subsystem) — the
SftpFileIT analog. Seed layout mirrors the IT's
copyAndExecuteCommands into /home/seatunnel (= the server root)."""

import os
import shutil

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.sftp_server import start_mini_sftp

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-sftp-e2e/src/test/resources")


@pytest.fixture(scope="module")
def sftp(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sftp_root"))
    # SftpFileIT seed map (SftpFileIT.java:88-125, /home/seatunnel-rel)
    seeds = [
        ("json/e2e.json",
         "tmp/seatunnel/read/json/name=tyrantlucifer/hobby=coding/e2e.json"),
        ("text/e2e.txt",
         "tmp/seatunnel/read/text/name=tyrantlucifer/hobby=coding/e2e.txt"),
        ("text/e2e-text.zip", "tmp/seatunnel/read/zip/text/e2e-text.zip"),
        ("excel/e2e.xlsx",
         "tmp/seatunnel/read/excel/name=tyrantlucifer/hobby=coding/e2e.xlsx"),
        ("excel/e2e.xlsx",
         "tmp/seatunnel/read/excel_filter/name=tyrantlucifer/hobby=coding/"
         "e2e_filter.xlsx"),
        ("xml/e2e.xml",
         "tmp/seatunnel/read/xml/name=tyrantlucifer/hobby=coding/e2e.xml"),
        ("text/e2e.txt", "tmp/seatunnel/read/wildcard/e*e.txt"),
        ("text/e2e.txt", "tmp/seatunnel/read/wildcard/e2e.txt"),
    ]
    for src, dst in seeds:
        full = os.path.join(root, dst)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        shutil.copy(os.path.join(_RES, src), full)
    port, stop = start_mini_sftp("seatunnel", "pass", root)
    old = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"sftp=tcp://127.0.0.1:{port}"
    yield root
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


def _run(spark, conf):
    JobEngine(spark).run(JobSpec.from_file(conf))


@pytest.mark.parametrize("conf,out_dir", [
    ("text/fake_to_sftp_file_text.conf", "tmp/seatunnel/text"),
    ("json/fake_to_sftp_file_json.conf", "tmp/seatunnel/json"),
    ("xml/fake_to_sftp_file_xml.conf", "tmp/seatunnel/xml"),
    ("excel/fakesource_to_sftp_excel.conf", "tmp/seatunnel/excel"),
])
def test_fake_to_sftp_write_confs(spark, sftp, conf, out_dir):
    """FakeSource -> SftpFile sink: the full local write pipeline
    uploaded over the SSH wire; files land in the server tree."""
    root = sftp
    _run(spark, f"{_RES}/{conf}")
    written = []
    for r, _d, names in os.walk(os.path.join(root, out_dir.lstrip("/"))):
        written += [os.path.join(r, n) for n in names]
    assert written, f"no files uploaded for {conf}"


@pytest.mark.parametrize("conf", [
    "text/sftp_file_text_to_assert.conf",
    "text/sftp_file_text_projection_to_assert.conf",
    "text/sftp_file_text_skip_headers.conf",
    "text/sftp_file_zip_text_to_assert.conf",
    "text/sftp_file_text_wildcard_character_to_assert.conf",
    "json/sftp_file_json_to_assert.conf",
    "json/sftp_file_json_to_assert_with_multipletable.conf",
    "xml/sftp_file_xml_to_assert.conf",
    "excel/sftp_excel_to_assert.conf",
    "excel/sftp_excel_projection_to_assert.conf",
    "excel/sftp_filter_excel_to_assert.conf",
])
def test_sftp_read_to_assert_confs(spark, sftp, conf):
    """SftpFile source confs with their own Assert rules: seeded e2e
    files read over the SSH wire (partition-dir fields, projections,
    header skips, zip archives, excel decode, wildcard names,
    filename filters) — the conf's Assert sink is the oracle."""
    _run(spark, f"{_RES}/{conf}")


@pytest.mark.parametrize("conf,out_dir", [
    ("text/multiple_fake_to_sftp_file_text_append.conf",
     "tmp/multiple_2/seatunnel/text"),
    ("text/multiple_fake_to_sftp_file_text_recreate_schema.conf",
     "tmp/multiple_1/seatunnel/text"),
])
def test_multiple_table_fake_to_sftp_confs(spark, sftp, conf, out_dir):
    root = sftp
    _run(spark, f"{_RES}/{conf}")
    tables = os.listdir(os.path.join(root, out_dir))
    assert len(tables) >= 2, tables  # ${table_name} fan-out
