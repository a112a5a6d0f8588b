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
