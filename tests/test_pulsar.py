"""Pulsar connector over the binary wire protocol vs the mini broker."""

import json

import pytest

from seatunnel_spark.testing.pulsar_server import start_mini_pulsar


def test_wire_produce_consume_roundtrip():
    from seatunnel_spark.pulsar_wire import PulsarClient

    broker, port, stop = start_mini_pulsar()
    try:
        cl = PulsarClient(f"pulsar://127.0.0.1:{port}")
        pid = cl.create_producer("persistent://public/default/t1")
        for i in range(5):
            ledger, entry = cl.send(pid, f"m{i}".encode(), i,
                                    partition_key=f"k{i % 2}",
                                    properties={"src": "test"})
            assert (ledger, entry) == (0, i)
        cl.close()

        cl = PulsarClient(f"pulsar://127.0.0.1:{port}")
        msgs = cl.drain("persistent://public/default/t1", "sub-a")
        assert [m[2] for m in msgs] == [b"m0", b"m1", b"m2", b"m3", b"m4"]
        # partition_key survives the metadata round trip
        from seatunnel_spark import pb

        assert pb.first_str(msgs[0][1], 6) == "k0"
        cl.close()
    finally:
        stop()


def test_wire_empty_topic_and_resume():
    from seatunnel_spark.pulsar_wire import PulsarClient

    broker, port, stop = start_mini_pulsar()
    try:
        cl = PulsarClient(f"pulsar://127.0.0.1:{port}")
        assert cl.drain("nothing-here", "s0") == []
        pid = cl.create_producer("t2")
        for i in range(6):
            cl.send(pid, f"x{i}".encode(), i)
        # resume after message id (0, 2) -> x3..x5
        msgs = cl.drain("t2", "s1", start_message_id=(0, 2))
        assert [m[2] for m in msgs] == [b"x3", b"x4", b"x5"]
        # resume at the end -> nothing (no hang)
        assert cl.drain("t2", "s2", start_message_id=(0, 5)) == []
        cl.close()
    finally:
        stop()


def test_pulsar_sink_then_source(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source

    broker, port, stop = start_mini_pulsar()
    try:
        base = {"client.service-url": f"pulsar://127.0.0.1:{port}",
                "topic": "events"}
        df = spark.createDataFrame([(i, f"v{i}") for i in range(40)],
                                   "id int, v string")
        get_sink("Pulsar", base).write(df)
        assert len(broker.topics["events"]) == 40
        src = get_source("Pulsar", {
            **base, "cursor.startup.mode": "EARLIEST",
            "schema": {"fields": {"id": "int", "v": "string"}}})
        rows = src.read(spark).collect()
        assert sorted(r["id"] for r in rows) == list(range(40))
    finally:
        stop()


def test_pulsar_partitioned_topic_fanout(spark):
    """Partitioned topics split per partition (PulsarSplitEnumerator
    parity) and the sink routes by partition_key_fields hash."""
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.sources import get_source

    broker, port, stop = start_mini_pulsar(partitioned={"pt": 3})
    try:
        base = {"client.service-url": f"pulsar://127.0.0.1:{port}",
                "topic": "pt"}
        df = spark.createDataFrame(
            [(i, f"g{i % 5}") for i in range(30)], "id int, g string")
        get_sink("Pulsar", {**base, "partition_key_fields": ["g"]}).write(df)
        parts = [f"pt-partition-{i}" for i in range(3)]
        assert sum(len(broker.topics.get(p, [])) for p in parts) == 30
        assert len([p for p in parts if broker.topics.get(p)]) >= 2
        # same key always lands on the same partition topic
        for p in parts:
            keys = {json.loads(m[1].decode())["g"]
                    for m in broker.topics.get(p, [])}
            for q in parts:
                if q != p:
                    other = {json.loads(m[1].decode())["g"]
                             for m in broker.topics.get(q, [])}
                    assert not keys & other

        src = get_source("Pulsar", {
            **base, "cursor.startup.mode": "EARLIEST",
            "schema": {"fields": {"id": "int", "g": "string"}}})
        assert sorted(r["id"] for r in src.read(spark).collect()) \
            == list(range(30))
    finally:
        stop()


def test_pulsar_subscription_cursor_resume():
    """SUBSCRIPTION startup mode: durable cursor advances with acks, a
    second read sees only post-cursor messages."""
    from seatunnel_spark.pulsar_wire import PulsarClient

    broker, port, stop = start_mini_pulsar()
    try:
        url = f"pulsar://127.0.0.1:{port}"
        cl = PulsarClient(url)
        pid = cl.create_producer("t3")
        for i in range(4):
            cl.send(pid, f"a{i}".encode(), i)
        msgs = cl.drain("t3", "grp")  # non-durable: no cursor recorded
        assert len(msgs) == 4
        cid = cl.subscribe("t3", "grp", durable=True, earliest=True)
        cl.flow(cid, 100)
        seen = []
        while True:
            got = cl.receive(timeout=2.0)
            if got is None:
                break
            seen.append(got)
            if got[0] == (0, 3):
                break
        cl.ack(cid, 0, 3)
        import time

        deadline = time.time() + 5
        while time.time() < deadline \
                and broker.cursors.get(("t3", "grp")) != 3:
            time.sleep(0.05)  # ACK is fire-and-forget; wait for the broker
        assert broker.cursors[("t3", "grp")] == 3
        cl.close()

        cl = PulsarClient(url)
        pid = cl.create_producer("t3")
        cl.send(pid, b"a4", 0)
        cid = cl.subscribe("t3", "grp", durable=True, earliest=True)
        assert cl.last_message_id(cid) == (0, 4)
        cl.flow(cid, 100)
        got = cl.receive(timeout=2.0)
        assert got is not None and got[2:] and got[0] == (0, 4)
        cl.close()
    finally:
        stop()


def test_pulsar_streaming_source(spark, tmp_path):
    """Streaming read via the Python DataSource checkpoints (ledger,
    entry) per partition and picks up post-start publishes."""
    from seatunnel_spark.pulsar_wire import PulsarClient
    from seatunnel_spark.sources import get_source

    broker, port, stop = start_mini_pulsar()
    try:
        url = f"pulsar://127.0.0.1:{port}"
        cl = PulsarClient(url)
        pid = cl.create_producer("st")
        for i in range(3):
            cl.send(pid, json.dumps({"id": i}).encode(), i)

        src = get_source("Pulsar", {
            "client.service-url": url, "topic": "st",
            "cursor.startup.mode": "EARLIEST",
            "schema": {"fields": {"id": "int"}}})
        sdf = src.read_stream(spark)
        out = str(tmp_path / "out")

        def run_once():
            q = (sdf.writeStream.format("parquet")
                 .option("path", out)
                 .option("checkpointLocation", str(tmp_path / "ckpt"))
                 .trigger(availableNow=True).start())
            q.awaitTermination(60)

        run_once()
        assert sorted(r["id"] for r in spark.read.parquet(out).collect()) \
            == [0, 1, 2]

        for i in range(3, 5):
            cl.send(pid, json.dumps({"id": i}).encode(), i)
        run_once()  # checkpoint resume: only the two new messages land
        assert sorted(r["id"] for r in spark.read.parquet(out).collect()) \
            == [0, 1, 2, 3, 4]
        cl.close()
    finally:
        stop()


_RES = ("/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
        "connector-pulsar-e2e/src/test/resources")


def test_fake_to_pulsar_conf_runs_unmodified(spark):
    """fake_to_pulsar.conf (PulsarIT.testSinkPulsar analog): FakeSource
    full-type rows -> pulsar json sink."""
    import os

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec

    broker, port, stop = start_mini_pulsar()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"pulsar.e2e.sink=tcp://127.0.0.1:{port}"
    try:
        JobEngine(spark).run(JobSpec.from_file(f"{_RES}/fake_to_pulsar.conf"))
        msgs = broker.topics["topic-test02"]
        assert len(msgs) == 10
        doc = json.loads(msgs[0][1].decode())
        assert "c_string" in doc and "c_map" in doc
    finally:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        stop()


def test_batch_pulsar_to_console_conf_runs_unmodified(spark):
    """batch_pulsar_to_console.conf: seeded topic -> Pulsar source
    (EARLIEST->LATEST bounded cursor) -> Assert NOT_NULL rules."""
    import os

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.pulsar_wire import PulsarClient

    broker, port, stop = start_mini_pulsar()
    os.environ["SEATUNNEL_SPARK_HOST_ALIASES"] = \
        f"pulsar.batch.e2e=tcp://127.0.0.1:{port}"
    try:
        cl = PulsarClient(f"pulsar://127.0.0.1:{port}")
        pid = cl.create_producer("topic-it")
        for i in range(10):
            doc = {"c_map": {"k": "v"}, "c_array": [1, 2], "c_string": f"s{i}",
                   "c_boolean": True, "c_tinyint": 1, "c_smallint": 2,
                   "c_int": i, "c_bigint": 99, "c_float": 1.5,
                   "c_double": 2.5, "c_decimal": "3.14159265",
                   "c_bytes": "Ynl0ZXM=", "c_date": "2024-01-01",
                   "c_timestamp": "2024-01-01T10:00:00"}
            cl.send(pid, json.dumps(doc).encode(), i)
        cl.close()
        JobEngine(spark).run(JobSpec.from_file(
            f"{_RES}/batch_pulsar_to_console.conf"))
    finally:
        os.environ.pop("SEATUNNEL_SPARK_HOST_ALIASES", None)
        stop()
