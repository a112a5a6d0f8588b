"""RabbitMQ connector over real AMQP 0-9-1 framing vs the mini broker."""

import json

from seatunnel_spark.testing.amqp_server import start_mini_amqp


def test_amqp_client_roundtrip():
    from seatunnel_spark.amqp import AmqpConnection

    broker, port, stop = start_mini_amqp()
    try:
        cl = AmqpConnection("127.0.0.1", port)
        cl.queue_declare("q1")
        cl.publish(b'{"x": 1}', "q1")
        cl.publish(b"B" * 200_000, "q1")  # multi-frame body
        assert cl.basic_get("q1") == b'{"x": 1}'
        assert cl.basic_get("q1") == b"B" * 200_000
        assert cl.basic_get("q1") is None
        cl.close()
    finally:
        stop()


def test_rabbitmq_sink_then_source(spark):
    from seatunnel_spark.sources.rabbitmq import RabbitMqSink, RabbitMqSource

    broker, port, stop = start_mini_amqp()
    try:
        base = {"host": "127.0.0.1", "port": port, "queue_name": "events"}
        df = spark.createDataFrame([(i, f"m{i}") for i in range(50)],
                                   "id int, msg string")
        RabbitMqSink(base).write(df)
        assert len(broker.queues["events"]) == 50
        src = RabbitMqSource({**base,
                              "schema": {"fields": {"id": "int",
                                                    "msg": "string"}}})
        rows = src.read(spark).collect()
        assert sorted(r["id"] for r in rows) == list(range(50))
        assert broker.queues["events"] == []  # drained
    finally:
        stop()
