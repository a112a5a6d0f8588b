"""Staged-load sinks (S3Redshift / SelectDBCloud / ClickhouseFile),
Google Firestore sink, and the pg wire client."""

import json
import os

import pytest

from seatunnel_spark.testing.misc_servers import (
    start_mini_firestore,
    start_mini_selectdb,
)
from seatunnel_spark.testing.pg_server import start_mini_pg


def test_pg_wire_client_md5_auth_and_query():
    from seatunnel_spark.pg_wire import PgClient

    pg, port, stop = start_mini_pg(user="u", password="pw")
    try:
        pg.canned["SELECT 1"] = (["n", "s"], [23, 25], [(1, "a"), (2, None)])
        cl = PgClient("127.0.0.1", port, "u", "pw", "db")
        cols, oids, rows = cl.query("SELECT 1")
        assert cols == ["n", "s"] and rows == [(1, "a"), (2, None)]
        assert cl.execute("CREATE TABLE t (x int)") == "CREATE"
        cl.close()
        with pytest.raises(RuntimeError, match="auth"):
            PgClient("127.0.0.1", port, "u", "WRONG", "db")
    finally:
        stop()


def test_s3redshift_stage_and_copy(spark, tmp_path):
    from seatunnel_spark.sinks import get_sink

    pg, port, stop = start_mini_pg(user="ru", password="rp")
    try:
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
        get_sink("S3Redshift", {
            "jdbc_url": f"jdbc:redshift://127.0.0.1:{port}/dev",
            "jdbc_user": "ru", "jdbc_password": "rp",
            "execute_sql": "COPY t FROM 's3:/${path}' FORMAT JSON",
            "path": str(tmp_path / "stage"),
            "file_format_type": "json",
        }).write(df)
        copies = [s for s in pg.statements if s.startswith("COPY")]
        assert len(copies) >= 1
        assert all("${path}" not in s and str(tmp_path) in s
                   for s in copies)
        # the staged files themselves hold the rows
        staged = []
        for root, _, files in os.walk(tmp_path / "stage"):
            for f in files:
                if not f.startswith(("_", ".")):
                    staged += [json.loads(l) for l in
                               open(os.path.join(root, f))]
        assert sorted(r["id"] for r in staged) == [1, 2]
    finally:
        stop()


def test_selectdb_upload_redirect_and_copy(spark):
    from seatunnel_spark.sinks import get_sink

    state, port, stop = start_mini_selectdb()
    try:
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(10)], "id int, name string")
        get_sink("SelectDBCloud", {
            "load-url": f"127.0.0.1:{port}", "cluster-name": "c1",
            "table.identifier": "db.tbl", "username": "admin",
            "password": "pw",
        }).write(df)
        rows = [json.loads(l) for body in state["files"].values()
                for l in body.decode().splitlines()]
        assert sorted(r["id"] for r in rows) == list(range(10))
        assert len(state["queries"]) == 1
        sql = state["queries"][0]["sql"]
        assert sql.startswith("COPY INTO db.tbl FROM @~('{")
        assert "'copy.async'='false'" in sql
        assert state["queries"][0]["cluster"] == "c1"
        # every uploaded file is named in the COPY
        for fname in state["files"]:
            assert fname in sql
    finally:
        stop()


def test_selectdb_delete_sign_changelog(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.types import ROW_KIND_COL

    state, port, stop = start_mini_selectdb()
    try:
        df = spark.createDataFrame(
            [(1, "+I"), (2, "+I"), (1, "-D")], f"id int, {ROW_KIND_COL} string")
        get_sink("SelectDBCloud", {
            "load-url": f"127.0.0.1:{port}",
            "table.identifier": "db.tbl", "username": "admin",
            "sink.enable-delete": True,
        }).write(df)
        rows = [json.loads(l) for body in state["files"].values()
                for l in body.decode().splitlines()]
        signs = {(r["id"], r["__DORIS_DELETE_SIGN__"]) for r in rows}
        assert (1, 1) in signs and (1, 0) in signs and (2, 0) in signs
        assert "'copy.use_delete_sign'='true'" in state["queries"][0]["sql"]
    finally:
        stop()


def test_clickhouse_file_bulk_import(spark):
    from seatunnel_spark.sinks import get_sink
    from seatunnel_spark.testing.rest_servers import start_mini_clickhouse

    tables, port, stop = start_mini_clickhouse()
    try:
        df = spark.createDataFrame(
            [(i, f"n{i}") for i in range(20)], "id int, name string") \
            .repartition(3)
        get_sink("ClickhouseFile", {
            "host": f"127.0.0.1:{port}", "database": "db", "table": "t",
            "fields": ["id", "name"],
        }).write(df)
        rows = tables[("db", "t")]
        assert sorted(int(r["id"]) for r in rows) == list(range(20))
    finally:
        stop()


def test_firestore_sink_documents(spark):
    from seatunnel_spark.sinks import get_sink

    state, port, stop = start_mini_firestore()
    try:
        df = spark.createDataFrame(
            [(1, "a", 1.5, True), (2, "b", 2.5, None)],
            "id int, name string, w double, ok boolean")
        get_sink("GoogleFirestore", {
            "project_id": "p1", "collection": "users",
            "_base_url": f"http://127.0.0.1:{port}/v1",
        }).write(df)
        docs = state["docs"]["users"]
        assert len(docs) == 2
        by_id = {d["fields"]["id"]["integerValue"]: d["fields"]
                 for d in docs}
        assert by_id["1"]["name"] == {"stringValue": "a"}
        assert by_id["1"]["w"] == {"doubleValue": 1.5}
        assert by_id["1"]["ok"] == {"booleanValue": True}
        assert by_id["2"]["ok"] == {"nullValue": None}
        assert state["auth"][0] == "Bearer owner"  # emulator convention
    finally:
        stop()


def test_firestore_jwt_signing_roundtrip():
    """service_account_token builds a verifiable RS256 JWT (local check
    against the generated public key; token endpoint mocked)."""
    import base64 as b64

    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    from seatunnel_spark.sinks.firestore import service_account_token
    from seatunnel_spark.testing.rest_servers import _Handler, _serve

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()).decode()
    seen = {}

    class H(_Handler):
        def do_POST(self):
            body = self._body().decode()
            seen["assertion"] = body.split("assertion=")[1]
            self._reply(200, {"access_token": "tok-x", "expires_in": 3600})

    port, stop = _serve(H)
    try:
        token = service_account_token({
            "client_email": "svc@p.iam.gserviceaccount.com",
            "private_key": pem,
            "token_uri": f"http://127.0.0.1:{port}/token"})
        assert token == "tok-x"
        h, c, s = seen["assertion"].split(".")
        pad = lambda x: x + "=" * (-len(x) % 4)  # noqa: E731
        claims = json.loads(b64.urlsafe_b64decode(pad(c)))
        assert claims["iss"] == "svc@p.iam.gserviceaccount.com"
        assert claims["scope"].endswith("datastore")
        key.public_key().verify(
            b64.urlsafe_b64decode(pad(s)), f"{h}.{c}".encode(),
            padding.PKCS1v15(), hashes.SHA256())
    finally:
        stop()
