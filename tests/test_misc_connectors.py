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
