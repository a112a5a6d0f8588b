"""Reference connector-file-obs-e2e confs running UNMODIFIED against
the mini object server speaking the OBS header-HMAC-SHA1 auth — the
ObsFileIT analog (its flow is self-contained: each fake_to_obs write
conf feeds the matching obs_*_to_assert read confs)."""

import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.testing.oss_server import start_mini_oss

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-file-obs-e2e/src/test/resources")


@pytest.fixture(scope="module")
def obs():
    # the confs declare empty-string credentials (the IT injects real
    # ones); the mini server accepts the conf-declared pair
    srv, port, stop = start_mini_oss("", "", auth_prefix="OBS")
    old = os.environ.get("SEATUNNEL_SPARK_HOST_ALIASES")
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"obs.xxxxxx.myhuaweicloud.com=http://127.0.0.1:{port}"
    yield srv
    stop()
    if old is None:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
    else:
        os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = old


# Latent inconsistencies in the reference's OBS conf suite (its IT
# declares empty credentials, so it cannot have run in CI):
#   * excel read confs split ROW cells with `delimiter = ;` while the
#     write conf joins with the default field delimiter — the pair
#     cannot round-trip on any engine;
#   * obs_file_orc_to_assert.conf declares file_format_type = "parquet"
#     over the orc files the write conf produced;
#   * fake_to_obs_file_parquet.conf writes bucket
#     obs://dc-for-test/seatunnel-test while its read confs read
#     obs://obs-bucket-name.
# Those read confs are excluded; the parquet pair is bridged by a
# test-side object copy standing in for the IT operator aligning the
# buckets.
@pytest.mark.parametrize("write_conf,read_confs,bridge", [
    ("csv/fake_to_obs_csv.conf",
     ["csv/obs_csv_to_assert.conf",
      "csv/obs_csv_projection_to_assert.conf"], None),
    ("excel/fake_to_obs_excel.conf", [], None),
    ("text/fake_to_obs_file_text.conf",
     ["text/obs_file_text_skip_headers.conf",
      "text/obs_file_text_to_assert.conf",
      "text/obs_file_text_projection_to_assert.conf"], None),
    ("json/fake_to_obs_file_json.conf",
     ["json/obs_file_json_to_assert.conf"], None),
    ("orc/fake_to_obs_file_orc.conf",
     ["orc/obs_file_orc_projection_to_assert.conf"], None),
    ("parquet/fake_to_obs_file_parquet.conf",
     ["parquet/obs_file_parquet_to_assert.conf",
      "parquet/obs_file_parquet_projection_to_assert.conf"],
     (("dc-for-test", "seatunnel-test/seatunnel/parquet"),
      ("obs-bucket-name", "seatunnel/parquet"))),
], ids=["csv", "excel", "text", "json", "orc", "parquet"])
def test_obs_write_then_read_confs(spark, obs, write_conf, read_confs,
                                   bridge):
    """ObsFileIT's sequence per format: write over the OBS wire, then
    the read confs assert what landed (each conf unmodified)."""
    JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{write_conf}"))
    assert obs.objects, "write conf produced no objects"
    if bridge:
        (sb, sp), (db, dp) = bridge
        with obs.lock:
            for (b, k), v in list(obs.objects.items()):
                if b == sb and k.startswith(sp):
                    obs.objects[(db, dp + k[len(sp):])] = v
    for rc in read_confs:
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/{rc}"))
    assert obs.auth_failures == 0
