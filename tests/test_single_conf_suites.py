"""The last zero-coverage e2e suites, each with a single conf:
amazondynamodb, easysearch, google-firestore, web3j — every conf runs
UNMODIFIED against its mini backend."""

import json
import os

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec

_E2E = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e"


def test_amazondynamodb_source_to_sink_conf(spark, monkeypatch):
    """amazondynamodbIT_source_to_sink.conf: parallel segment Scan of
    source_table -> BatchWriteItem into sink_table (AttributeValue
    codec both ways)."""
    from seatunnel_spark.testing.rest_servers import start_mini_dynamo

    tables, port, stop = start_mini_dynamo()
    try:
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"dynamodb-host:8000=http://127.0.0.1:{port}")
        # seed items in the conf's 16-field schema shape
        for i in range(25):
            tables.setdefault("source_table", []).append({
                "id": {"S": f"id-{i}"},
                "c_map": {"M": {"k": {"N": "1"}}},
                "c_array": {"L": [{"N": "1"}, {"N": "2"}]},
                "c_string": {"S": f"s{i}"},
                "c_boolean": {"BOOL": i % 2 == 0},
                "c_tinyint": {"N": "1"}, "c_smallint": {"N": "2"},
                "c_int": {"N": str(i)}, "c_bigint": {"N": "12345678901"},
                "c_float": {"N": "1.5"}, "c_double": {"N": "2.5"},
                "c_decimal": {"N": "1.1"},
                "c_bytes": {"B": "dGVzdA=="},
                "c_date": {"S": "2024-01-23"},
                "c_timestamp": {"S": "2024-01-23T12:34:56"},
            })
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-amazondynamodb-e2e/src/test/resources/"
            "amazondynamodbIT_source_to_sink.conf"))
        assert len(tables.get("sink_table", [])) == 25
        ids = {it["id"]["S"] for it in tables["sink_table"]}
        assert ids == {f"id-{i}" for i in range(25)}
    finally:
        stop()


def test_easysearch_source_and_sink_conf(spark, monkeypatch):
    """easysearch_source_and_sink.conf: Easysearch (ES-compatible wire)
    range-query read of st_index -> bulk write into st_index2."""
    from seatunnel_spark.testing.es_server import start_mini_es

    server, port, stop = start_mini_es()
    try:
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"e2e_easysearch=http://127.0.0.1:{port}")
        docs = server.indices.setdefault(
            "st_index", {"docs": {}, "mapping": {}})["docs"]
        for i in range(30):
            docs[str(i)] = {
                "c_map": {"k": 1}, "c_array": [1, 2], "c_string": f"s{i}",
                "c_boolean": True, "c_tinyint": 1, "c_smallint": 2,
                "c_int": i, "c_bigint": 123, "c_float": 1.5,
                "c_double": 2.5, "c_decimal": "1.1", "c_bytes": "dGVzdA==",
                "c_date": "2024-01-23", "c_timestamp": "2024-01-23T12:34:56",
            }
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-easysearch-e2e/src/test/resources/"
            "easysearch/easysearch_source_and_sink.conf"))
        out = server.indices.get("st_index2", {}).get("docs", {})
        # range query c_int in [10, 20] -> 11 docs flow to the sink
        assert len(out) == 11
        assert {d["c_int"] for d in out.values()} == set(range(10, 21))
    finally:
        stop()


def test_fake_to_google_firestore_conf(spark, monkeypatch):
    """fake_to_google_firestore.conf: one FakeSource row createDocument
    into the (mini) Firestore REST v1 endpoint."""
    from seatunnel_spark.testing.misc_servers import start_mini_firestore

    state, port, stop = start_mini_firestore()
    try:
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"firestore.googleapis.com=http://127.0.0.1:{port}")
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-google-firestore-e2e/src/test/resources/"
            "firestore/fake_to_google_firestore.conf"))
        docs = state.get("docs") or state.get("documents") or []
        assert docs, state
    finally:
        stop()


def test_web3j_to_assert_conf(spark, monkeypatch):
    """web3j_to_assert.conf: eth_blockNumber JSON-RPC -> one row whose
    `value` column carries {"timestamp", "blockNumber"} (the
    Web3jSourceReader payload), checked by the conf's Assert rules."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Rpc(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            assert req["method"] == "eth_blockNumber"
            body = json.dumps({"jsonrpc": "2.0", "id": req["id"],
                               "result": "0x10d4f"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Rpc)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        port = httpd.server_address[1]
        monkeypatch.setitem(os.environ, "SEATUNNEL_SPARK_HOST_ALIASES",
                            f"mainnet.infura.io=http://127.0.0.1:{port}")
        JobEngine(spark).run(JobSpec.from_file(
            f"{_E2E}/connector-web3j-e2e/src/test/resources/"
            "firestore/web3j_to_assert.conf"))
    finally:
        httpd.shutdown()
        httpd.server_close()
