"""Last unreferenced runnable reference confs, swept in round 5:
email (qq-host variant), kafka group-offsets with offset commit,
rabbitmq-to-rabbitmq streaming, qdrant-to-qdrant, jdbc_doris over the
FE mysql wire, and the engine-e2e InMemory client-savemode conf."""

import json

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_V2 = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e"


def test_fake_to_email_test_conf(spark, monkeypatch):
    """fake_to_email_test.conf (the smtp.qq.com-shaped variant with a
    tables_configs source): one MIME message with the conf's headline
    through the real SMTP dialogue."""
    from seatunnel_spark.testing.misc_servers import start_mini_smtp

    # email_smtp_auth=true -> the sink speaks SMTPS (trust-all, the
    # reference's MailSSLSocketFactory) + AUTH — serve real TLS
    messages, port, stop = start_mini_smtp(tls=True)
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"smtp.qq.com=tcp://127.0.0.1:{port}")
    try:
        JobEngine(spark).run(JobSpec.from_file(
            f"{_V2}/connector-email-e2e/src/test/resources/"
            "fake_to_email_test.conf"))
        assert len(messages) == 1
        assert "test-title" in messages[0]["data"]
    finally:
        stop()


def test_kafka_group_offset_commit_conf(spark, monkeypatch):
    """kafkasource_group_offset_to_console_with_commit_offset.conf:
    start_mode=group_offsets resumes from the committed position and
    commit_on_checkpoint advances the group to the log end AFTER the
    job (OffsetCommit over the wire)."""
    from seatunnel_spark.testing.kafka_server import start_mini_kafka

    broker, port, stop = start_mini_kafka(num_partitions=1)
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"kafkaCluster=tcp://127.0.0.1:{port}")
    topic = "test_topic_group_with_commit_offset"
    group = "SeaTunnel-Consumer-Group"
    try:
        # the IT's shape: 150 messages, the group already committed at
        # 100 -> the conf's Assert rules (MIN 100, MAX 149) only hold
        # when the read truly resumes from the committed offset
        for i in range(150):
            broker.append(topic, 0, [(None, json.dumps({"id": i}).encode())])
        broker.group_offsets[(group, topic, 0)] = 100
        JobEngine(spark).run(JobSpec.from_file(
            f"{_V2}/connector-kafka-e2e/src/test/resources/kafka/"
            "kafkasource_group_offset_to_console_with_commit_offset"
            ".conf"))
        # commit_on_checkpoint: group advanced to the log end
        assert broker.group_offsets[(group, topic, 0)] == 150
    finally:
        stop()


def test_rabbitmq_to_rabbitmq_conf(spark, monkeypatch):
    """rabbitmq-to-rabbitmq.conf UNMODIFIED: the full-type queue feed
    (for_e2e_testing bounded stream) re-published to the sink queue
    over real AMQP 0-9-1 framing."""
    from seatunnel_spark.testing.amqp_server import start_mini_amqp

    broker, port, stop = start_mini_amqp()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"rabbitmq-e2e=tcp://127.0.0.1:{port}")
    row = {"id": 1, "c_map": {"k": 1}, "c_array": [1], "c_string": "s",
           "c_boolean": True, "c_tinyint": 1, "c_smallint": 2,
           "c_int": 3, "c_bigint": 4, "c_float": 1.5, "c_double": 2.5,
           "c_decimal": 1.1, "c_bytes": "Yg==", "c_date": "2024-01-02",
           "c_timestamp": "2024-01-02T03:04:05"}
    try:
        broker.queues.setdefault("test", [])
        for i in range(5):
            broker.queues["test"].append(
                json.dumps({**row, "id": i}).encode())
        spec = JobSpec.from_file(
            f"{_V2}/connector-rabbitmq-e2e/src/test/resources/"
            "rabbitmq-to-rabbitmq.conf")
        spec.env["streaming.await.timeout"] = 10
        try:
            JobEngine(spark).run(spec)
        finally:
            for q in spark.streams.active:
                q.stop()
        out = broker.queues.get("test1", [])
        assert len(out) == 5
        ids = sorted(json.loads(m)["id"] for m in out)
        assert ids == list(range(5))
    finally:
        stop()


def test_qdrant_to_qdrant_conf(spark, monkeypatch):
    """qdrant-to-qdrant.conf UNMODIFIED: scroll-read of the source
    collection (schema with a float_vector column) into the sink
    collection's upsert-points path."""
    from seatunnel_spark.testing.rest_servers import start_mini_qdrant

    state, port, stop = start_mini_qdrant()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"qdrante2e=http://127.0.0.1:{port}")
    try:
        state["collections"]["source_collection"] = {
            i: {"vector": [float(i), float(i + 1)],
                "payload": {"file_name": f"f{i}.bin",
                            "file_size": i * 10}}
            for i in range(8)}
        JobEngine(spark).run(JobSpec.from_file(
            f"{_V2}/connector-qdrant-e2e/src/test/resources/"
            "qdrant-to-qdrant.conf"))
        sink = state["collections"].get("sink_collection", {})
        assert len(sink) == 8
        names = sorted(p["payload"]["file_name"]
                       for p in sink.values())
        assert names == [f"f{i}.bin" for i in range(8)]
        # the vector column really round-tripped as the point vector
        vecs = sorted(tuple(p["vector"]) for p in sink.values())
        assert vecs[0] == (0.0, 1.0)
    finally:
        stop()


def test_jdbc_doris_source_and_sink_conf(spark, monkeypatch):
    """jdbc_doris_source_and_sink.conf: the Doris FE's mysql-protocol
    query port on both sides (14-column matrix, positional INSERT)."""
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    srv, port, stop = start_mini_mysql("root", "")
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"doris_e2e=tcp://127.0.0.1:{port}")
    cols = ["BIGINT_COL", "LARGEINT_COL", "SMALLINT_COL", "TINYINT_COL",
            "BOOLEAN_COL", "DECIMAL_COL", "DOUBLE_COL", "FLOAT_COL",
            "INT_COL", "CHAR_COL", "VARCHAR_11_COL", "STRING_COL",
            "DATETIME_COL", "DATE_COL"]
    codes = [8, 253, 2, 1, 1, 246, 5, 4, 3, 254, 253, 253, 12, 10]
    rows = [tuple(str(x) for x in (
        10 ** 10 + i, 1 << 70, 100 + i, i, 1, f"{i}.5", i * 1.5, i / 2,
        i, f"c{i}", f"v{i}", f"s{i}", f"2023-09-04 10:30:0{i}",
        "2023-09-04")) for i in range(3)]
    try:
        srv.tables["e2e_table_source"] = (cols, codes, rows)
        JobEngine(spark).run(JobSpec.from_file(
            f"{_V2}/connector-jdbc-e2e/connector-jdbc-e2e-part-5/src/"
            "test/resources/jdbc_doris_source_and_sink.conf"))
        ins = [s for s in srv.statements
               if s.upper().lstrip().startswith("INSERT")]
        assert len(ins) == 3 and "e2e_table_sink" in ins[0]
    finally:
        stop()


def test_fake_to_inmemory_savemode_client_conf(spark):
    """fake_to_inmemory_savemode_client.conf (engine-e2e savemode
    suite): savemode.execute.location=client with a two-table
    tables_configs FakeSource into the InMemory sink."""
    from seatunnel_spark.sinks import memory

    memory._RESULTS.clear()
    JobEngine(spark).run(JobSpec.from_file(
        "/root/reference/seatunnel-e2e/seatunnel-engine-e2e/"
        "connector-seatunnel-e2e-base/src/test/resources/savemode/"
        "fake_to_inmemory_savemode_client.conf"))
    total = sum(df.count() for df in memory._RESULTS.values())
    assert total == 2  # one row per declared table


def test_mysql_cdc_to_iceberg_schema_change_conf(spark, monkeypatch):
    """mysql_cdc_to_iceberg_for_schema_change.conf UNMODIFIED: live
    binlog feed with schema-changes.enabled into the Iceberg sink with
    schema-evolution-enabled — an ALTER ADD COLUMN mid-stream lands in
    the committed table, upsert-mode merges by the declared id key."""
    import shutil

    from seatunnel_spark import mysql_binlog as B
    from seatunnel_spark.sinks.lakehouse import LakehouseTable
    from seatunnel_spark.testing.mysql_server import start_mini_mysql

    shutil.rmtree("/tmp/seatunnel/iceberg/hadoop-cdc-sink",
                  ignore_errors=True)
    monkeypatch.delenv("SEATUNNEL_SPARK_CDC_REPLAY", raising=False)
    srv, port, stop = start_mini_mysql("st_user", "seatunnel")
    try:
        cols = ["id", "f_name", "f_datetime"]
        srv.tables["mysql_cdc_e2e_source_table"] = (
            cols, [3, 253, 12],
            [(1, "a", "2024-01-02 03:04:05"),
             (2, "b", "2024-01-02 03:04:06")])
        srv.primary_keys["mysql_cdc_e2e_source_table"] = ["id"]
        srv.binlog_table("mysql_cdc", "mysql_cdc_e2e_source_table",
                         [(B.T_LONG, None), (B.T_VARCHAR, 400),
                          (B.T_VARCHAR, 40)])
        srv.mark_snapshot()
        srv.binlog_ddl("mysql_cdc", "ALTER TABLE "
                       "mysql_cdc_e2e_source_table ADD COLUMN f_new int")
        srv.binlog_table("mysql_cdc", "mysql_cdc_e2e_source_table",
                         [(B.T_LONG, None), (B.T_VARCHAR, 400),
                          (B.T_VARCHAR, 40), (B.T_LONG, None)])
        srv.binlog_insert("mysql_cdc", "mysql_cdc_e2e_source_table",
                          [(3, "c", "2024-01-02 03:04:07", 7)])
        monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                           f"mysql_cdc_e2e=tcp://127.0.0.1:{port}")
        spec = JobSpec.from_file(
            f"{_V2}/connector-iceberg-e2e/src/test/resources/iceberg/"
            "mysql_cdc_to_iceberg_for_schema_change.conf")
        spec.env["streaming.await.timeout"] = 10
        try:
            JobEngine(spark).run(spec)
        finally:
            for q in spark.streams.active:
                q.stop()
        t = LakehouseTable("/tmp/seatunnel/iceberg/hadoop-cdc-sink/"
                           "seatunnel_namespace/iceberg_sink_table")
        out = {r["id"]: r for r in t.read(spark).collect()}
        assert set(out) == {1, 2, 3}
        assert "f_new" in t.read(spark).columns  # evolution landed
        assert out[3]["f_new"] == 7 and out[1]["f_new"] is None
    finally:
        stop()
