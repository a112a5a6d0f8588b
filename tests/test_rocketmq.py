"""RocketMQ connector over the remoting protocol vs the mini broker."""

import json

from seatunnel_spark.testing.rocketmq_server import start_mini_rocketmq


def test_remoting_send_pull_roundtrip():
    from seatunnel_spark.sources.rocketmq import RocketMqClient

    broker, port, stop = start_mini_rocketmq()
    try:
        cl = RocketMqClient(f"127.0.0.1:{port}")
        for i in range(5):
            cl.send("t1", f"m{i}".encode())
        assert cl.max_offset("t1") == 5
        msgs = cl.pull("t1", 1, max_msgs=2)
        assert msgs == [b"m1", b"m2"]
        assert cl.pull("t1", 5) == []
        cl.close()
    finally:
        stop()


def test_rocketmq_sink_then_source(spark):
    from seatunnel_spark.sources.rocketmq import RocketMqSink, RocketMqSource

    broker, port, stop = start_mini_rocketmq()
    try:
        base = {"name.srv.addr": f"127.0.0.1:{port}", "topic": "events"}
        df = spark.createDataFrame([(i, f"v{i}") for i in range(40)],
                                   "id int, v string")
        RocketMqSink(base).write(df)
        assert len(broker.topics["events"]) == 40
        src = RocketMqSource({**base,
                              "schema": {"fields": {"id": "int",
                                                    "v": "string"}}})
        rows = src.read(spark).collect()
        assert sorted(r["id"] for r in rows) == list(range(40))
    finally:
        stop()


# ---------------------------------------------------------------------------
# Reference rocketmq-e2e confs unmodified (RocketMqIT analogs)
# ---------------------------------------------------------------------------

import json as _json
import os as _os

import pytest as _pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-rocketmq-e2e/src/test/resources")

_FULL_JSON = ('{{"id": {i}, "c_map": {{"k": {i}}}, "c_array": [1], '
              '"c_string": "s{i}", "c_boolean": true, "c_tinyint": 1, '
              '"c_smallint": 2, "c_int": 3, "c_bigint": 4, "c_float": 4.5, '
              '"c_double": 5.5, "c_decimal": 1.1, "c_bytes": "dGVzdA==", '
              '"c_date": "2024-01-23", "c_timestamp": "2024-01-23T12:34:56"}}')

_TEXT = ('{i},{{"k": {i}}},[1],s{i},true,1,2,3,4,4.5,5.5,1.1,'
         'dGVzdA==,2024-01-23,2024-01-23T12:34:56')


@_pytest.fixture()
def rocket(monkeypatch):
    from seatunnel_spark.testing.rocketmq_server import start_mini_rocketmq

    broker, port, stop = start_mini_rocketmq()
    monkeypatch.setitem(_os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                        f"rocketmq-e2e=tcp://127.0.0.1:{port}")
    yield broker
    stop()


def _seed(broker, topic, lines):
    with broker.lock:
        broker.topics.setdefault(topic, []).extend(
            ln.encode() for ln in lines)


def test_rocketmq_format_confs_run_unmodified(spark, rocket):
    """json/text format confs + the text sink round trip."""
    _seed(rocket, "test_topic_json",
          [_FULL_JSON.format(i=i) for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/rocketmq-source_json_to_console.conf"))
    _seed(rocket, "test_topic_text", [_TEXT.format(i=i) for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/rocketmq-source_text_to_console.conf"))


def test_rocketmq_start_mode_confs(spark, rocket):
    """earliest/latest/specific-offsets/timestamp/group-offsets start
    modes (RocketMqIT.testSourceKafkaStartConfig analog): ids 0..99
    seeded; latest reads nothing in batch (vacuous assert rules)."""
    _seed(rocket, "test_topic_source",
          ['{"id": %d}' % i for i in range(100)])
    # the group-offset conf's rules expect the 100..149 batch the IT
    # produces for the consumer group
    _seed(rocket, "test_topic_group",
          ['{"id": %d}' % i for i in range(100, 150)])
    for conf in ("rocketmq_source_earliest_to_console.conf",
                 "rocketmq_source_latest_to_console.conf",
                 "rocketmq_source_specific_offsets_to_console.conf",
                 "rocketmq_source_timestamp_to_console.conf",
                 "rocketmq_source_group_offset_to_console.conf"):
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/rocketmq/{conf}"))


def test_rocketmq_sink_confs(spark, rocket):
    """fake -> rocketmq json/text/message-tag sink confs."""
    for conf, topic in (
            ("rocketmq-sink_fake_to_rocketmq.conf", "test_topic"),
            ("rocketmq-text-sink_fake_to_rocketmq.conf", None),
            ("rocketmq-sink_fake_to_rocketmq_message_tag.conf",
             "test_topic_message_tag")):
        spec = JobSpec.from_file(f"{_RES}/{conf}")
        JobEngine(spark).run(spec)
        sink_topic = topic or spec.sinks[0].options["topic"]
        assert rocket.topics.get(sink_topic), conf


def test_rocketmq_text_offset_check_conf(spark, rocket):
    """rocketmq-source_tex_with_offset_check.conf: text-format read
    whose Assert rules check the full row count — seeded to the IT's
    message set (the offset check: every message consumed exactly
    once)."""
    _seed(rocket, "test_topic_text_offset_check",
          [_TEXT.format(i=i) for i in range(100)])
    JobEngine(spark).run(JobSpec.from_file(
        f"{_RES}/rocketmq-source_tex_with_offset_check.conf"))
