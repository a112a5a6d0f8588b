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


def test_activemq_confs(spark, monkeypatch, tmp_path):
    """connector-activemq-e2e confs UNMODIFIED against the mini STOMP
    broker (the text protocol every ActiveMQ ships): FakeSource full
    types and the LocalFile json read, each landing in the conf's
    queue."""
    import json as _json
    import os
    import shutil

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.testing.misc_servers import start_mini_stomp

    res = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
           "connector-activemq-e2e/src/test/resources")
    queues, port, stop = start_mini_stomp()
    # the confs carry BOTH a uri (tcp://activemq-host:61616 /
    # tcp://localhost:61616) and host/port — alias every spelling
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"activemq-e2e=tcp://127.0.0.1:{port},"
                       f"active-e2e=tcp://127.0.0.1:{port},"
                       f"activemq-host=tcp://127.0.0.1:{port},"
                       f"localhost:61616=tcp://127.0.0.1:{port}")
    # the IT copies e2e.json to the container root; path-alias it
    src_json = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
                "connector-file-local-e2e/src/test/resources/json/e2e.json")
    root = tmp_path / "amq_root"
    root.mkdir()
    shutil.copy(src_json, root / "e2e.json")
    monkeypatch.setenv("SEATUNNEL_SPARK_PATH_ALIASES",
                       f"/e2e.json={root}/e2e.json")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{res}/fake_source_to_sink.conf"))
        assert queues.get("/queue/testQueue"), list(queues)

        JobEngine(spark).run(JobSpec.from_file(
            f"{res}/localfile_source_to_sink.conf"))
        msgs = [_json.loads(m) for m in queues.get("/queue/test1", [])]
        assert msgs and "c_string" in msgs[0]
    finally:
        stop()


def test_datahub_conf(spark, monkeypatch):
    """fakesource_to_datahub.conf runs UNMODIFIED: the conf's
    placeholder endpoint resolves through the host-alias layer (the
    testcontainers-network analog) to a signed-records capture."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec

    calls = []

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            calls.append((self.path, self.rfile.read(n)))
            payload = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_HOST_ALIASES",
        f"xxx=http://127.0.0.1:{srv.server_address[1]}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
            "connector-datahub-e2e/src/test/resources/"
            "fakesource_to_datahub.conf"))
        shards = [(p, b) for p, b in calls if "shards" in p]
        assert shards
        recs = _json.loads(shards[0][1])
        assert recs.get("Records"), recs
    finally:
        srv.shutdown()
        srv.server_close()
