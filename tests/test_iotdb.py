"""IoTDB connector over REST API v2 against the mini server."""

from seatunnel_spark.testing.rest_servers import start_mini_iotdb


def test_iotdb_roundtrip_with_time_splits(spark):
    from seatunnel_spark.sources.iotdb import IoTDbSink, IoTDbSource

    devices, port, stop = start_mini_iotdb()
    try:
        url = f"127.0.0.1:{port}"
        df = spark.createDataFrame(
            [("root.sg.d1", 1000 + i, i * 1.5, i) for i in range(60)],
            "dev string, ts long, temperature double, seq int")
        IoTDbSink({"node_urls": [url], "key_device": "dev",
                   "key_timestamp": "ts", "batch_size": 16}).write(df)
        assert len(devices["root.sg.d1"]) == 60
        assert devices["root.sg.d1"][1007]["temperature"] == 10.5

        src = IoTDbSource({
            "node_urls": [url],
            "sql": "SELECT temperature, seq FROM root.sg.d1",
            "lower_bound": 1000, "upper_bound": 1060, "num_partitions": 4,
            "schema": {"fields": {"time": "bigint",
                                  "temperature": "double", "seq": "int"}}})
        rows = src.read(spark).collect()
        assert len(rows) == 60  # splits cover the range exactly, no dupes
        got = {r["time"]: r["seq"] for r in rows}
        assert got[1042] == 42
    finally:
        stop()


def test_iotdb_measurement_field_filter(spark):
    from seatunnel_spark.sources.iotdb import IoTDbSink

    devices, port, stop = start_mini_iotdb()
    try:
        df = spark.createDataFrame(
            [("root.sg.d2", 1, 2.0, "noise")],
            "dev string, ts long, val double, junk string")
        IoTDbSink({"node_urls": [f"127.0.0.1:{port}"], "key_device": "dev",
                   "key_timestamp": "ts",
                   "key_measurement_fields": ["val"]}).write(df)
        assert devices["root.sg.d2"][1] == {"val": 2.0}
    finally:
        stop()


def test_iotdb_source_to_sink_conf(spark, monkeypatch):
    """iotdb_source_to_sink.conf runs UNMODIFIED: align-by-device read
    over the root.source_group.* wildcard (Device column + ts), the
    Replace transform rewrites device_name to root.sink_group, and the
    sink tablets land under the new device tree."""
    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.sources.iotdb import IoTDbSink

    devices, port, stop = start_mini_iotdb()
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES",
                       f"flink_e2e_iotdb_sink=http://127.0.0.1:{port}")
    try:
        # seed root.source_group.d1/d2 (the IT's session inserts)
        for d in ("d1", "d2"):
            df = spark.createDataFrame(
                [(f"root.source_group.{d}", 1000 + i, f"s{i}",
                  i % 2 == 0, i % 128, i, i, 10 ** 10 + i,
                  i * 0.5, i * 1.5) for i in range(10)],
                "dev string, ts long, c_string string, c_boolean boolean,"
                "c_tinyint tinyint, c_smallint smallint, c_int int,"
                "c_bigint bigint, c_float float, c_double double")
            IoTDbSink({"node_urls": [f"127.0.0.1:{port}"],
                       "key_device": "dev", "key_timestamp": "ts",
                       "batch_size": 16}).write(df)
        JobEngine(spark).run(JobSpec.from_file(
            "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/"
            "connector-iotdb-e2e/src/test/resources/iotdb/"
            "iotdb_source_to_sink.conf"))
        sink_devs = [d for d in devices if d.startswith("root.sink_group.")]
        assert sorted(sink_devs) == ["root.sink_group.d1",
                                     "root.sink_group.d2"]
        assert len(devices["root.sink_group.d1"]) == 10
        row = next(iter(devices["root.sink_group.d1"].values()))
        assert "c_string" in row and "c_double" in row
    finally:
        stop()
