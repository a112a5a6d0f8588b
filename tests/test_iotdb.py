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
