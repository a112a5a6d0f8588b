"""TDengine (taosAdapter REST), Prometheus remote-write, and ActiveMQ
(STOMP) connectors against mini backends."""

import json

from seatunnel_spark.testing.misc_servers import (
    start_mini_prometheus,
    start_mini_stomp,
    start_mini_taos,
)


def test_tdengine_sink_and_subtable_split_read(spark):
    from seatunnel_spark.sources.tdengine import TDengineSink, TDengineSource

    state, port, stop = start_mini_taos()
    try:
        url = f"jdbc:TAOS-RS://127.0.0.1:{port}/"
        df = spark.createDataFrame(
            [(f"d{i % 3}", 1000 + i, i * 1.1, f"loc{i % 3}")
             for i in range(30)],
            "tbname string, ts long, current double, location string")
        TDengineSink({"url": url, "database": "power", "stable": "meters",
                      "key_tags": ["location"], "batch_size": 7}).write(df)
        assert len(state["stables"][("power", "meters")]) == 3
        total = sum(len(v) for (db, _), v in state["tables"].items()
                    if db == "power")
        assert total == 30

        src = TDengineSource({"url": url, "database": "power",
                              "stable": "meters"})
        rows = src.read(spark).collect()
        assert len(rows) == 30
        assert {round(r["current"], 1) for r in rows} >= {0.0, 1.1}
    finally:
        stop()


def test_prometheus_remote_write(spark):
    from seatunnel_spark.sinks.prometheus import PrometheusSink

    received, port, stop = start_mini_prometheus()
    try:
        df = spark.createDataFrame(
            [({"__name__": "http_requests", "job": f"j{i % 2}"},
              float(i), 1700000000000 + i) for i in range(50)],
            "labels map<string,string>, value double, ts long")
        PrometheusSink({"url": f"http://127.0.0.1:{port}/api/v1/write",
                        "key_label": "labels", "key_value": "value",
                        "key_timestamp": "ts",
                        "batch_size": 16}).write(df)
        assert len(received) == 50
        labels, samples = received[0]
        assert labels["__name__"] == "http_requests"
        all_samples = {s for _, ss in received for s in ss}
        assert (7.0, 1700000000007) in all_samples
    finally:
        stop()


def test_prometheus_codec_roundtrip():
    from seatunnel_spark.sinks.prometheus import (
        encode_write_request,
        snappy_frame,
    )
    from seatunnel_spark.testing.misc_servers import (
        decode_write_request,
        snappy_decode,
    )

    series = [({"__name__": "m", "env": "prod"}, [(1.5, 123), (2.5, 456)]),
              ({"__name__": "n"}, [(-3.25, 789)])]
    blob = snappy_frame(encode_write_request(series))
    assert decode_write_request(snappy_decode(blob)) == series


def test_activemq_stomp_sink(spark):
    from seatunnel_spark.sinks.stomp import ActiveMqSink

    queues, port, stop = start_mini_stomp()
    try:
        df = spark.createDataFrame([(i, f"m{i}") for i in range(40)],
                                   "id int, msg string")
        ActiveMqSink({"host": "127.0.0.1", "port": port,
                      "queue_name": "events", "batch_size": 10}).write(df)
        msgs = [json.loads(m) for m in queues["/queue/events"]]
        assert sorted(m["id"] for m in msgs) == list(range(40))
    finally:
        stop()


def test_email_confs(spark, monkeypatch):
    """connector-email-e2e confs run UNMODIFIED against the mini SMTP
    server (the IT's GreenMail): one MIME message per sink with the
    conf's subject/body and every row in the emailsink.csv attachment
    (EmailSinkWriter.java:67-160)."""
    import os

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.testing.misc_servers import start_mini_smtp

    res = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
           "connector-email-e2e/src/test/resources")
    messages, port, stop = start_mini_smtp()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"email-e2e=tcp://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(f"{res}/fake_to_email.conf"))
        assert len(messages) == 1
        m = messages[0]
        assert m["from"] == "sender@example.com"
        assert set(m["to"]) == {"receiver-1@example.com",
                                "receiver-2@example.com"}
        assert "test-title" in m["data"] and "test-content" in m["data"]
        assert "emailsink.csv" in m["data"]

        JobEngine(spark).run(JobSpec.from_file(
            f"{res}/fake_to_multiemailsink.conf"))
        assert len(messages) >= 2
        assert any("receiver-3@example.com" in m2["to"]
                   for m2 in messages[1:])
    finally:
        stop()
