"""Snowflake REST protocol (the de-facto-public wire the Apache-2.0
OSS drivers speak): login-request token flow, typed result decode,
and jdbc_snowflake_source_and_sink.conf UNMODIFIED."""

import datetime
from decimal import Decimal

import pytest

from seatunnel_spark.job.engine import JobEngine
from seatunnel_spark.job.spec import JobSpec
from seatunnel_spark.snowflake_rest import SnowflakeError, SnowflakeRestClient
from seatunnel_spark.testing.snowflake_server import start_mini_snowflake

_COLS = ["ID", "NUM", "DEC", "INT", "BIGINT", "SMALLINT", "TINYINT",
         "BYTEINT", "FLOAT", "DOUBLE", "VARCHAR_COL", "CHAR_COL",
         "STRING_COL", "BOOLEAN_COL", "DATE_COL", "TIME_COL",
         "TIMESTAMP_COL", "TIMESTAMP_NTZ_COL", "TIMESTAMP_LTZ_COL",
         "TIMESTAMP_TZ_COL", "VARIANT_COL", "OBJECT_COL",
         "GEOGRAPHY_COL", "GEOMETRY_COL", "BINARY_COL", "VARBINARY_COL"]


def _meta(name):
    n = name.upper()
    if n in ("ID", "NUM", "INT", "BIGINT", "SMALLINT", "TINYINT",
             "BYTEINT"):
        return {"name": n, "type": "fixed", "scale": 0}
    if n == "DEC":
        return {"name": n, "type": "fixed", "scale": 2}
    if n in ("FLOAT", "DOUBLE"):
        return {"name": n, "type": "real", "scale": None}
    if n == "BOOLEAN_COL":
        return {"name": n, "type": "boolean"}
    if n == "DATE_COL":
        return {"name": n, "type": "date"}
    if n == "TIME_COL":
        return {"name": n, "type": "time", "scale": 9}
    if n.startswith("TIMESTAMP"):
        kind = n.replace("_COL", "").lower()
        kind = "timestamp_ntz" if kind == "timestamp" else kind
        return {"name": n, "type": kind, "scale": 9}
    if "BINARY" in n:
        return {"name": n, "type": "binary"}
    return {"name": n, "type": "text"}


def _row(i):
    out = []
    for c in _COLS:
        m = _meta(c)
        t = m["type"]
        if t == "fixed" and not m.get("scale"):
            out.append(i)
        elif t == "fixed":
            out.append(Decimal(f"{i}.25"))
        elif t == "real":
            out.append(i * 1.5)
        elif t == "boolean":
            out.append(i % 2 == 0)
        elif t == "date":
            out.append(datetime.date(2024, 1, 2))
        elif t == "time":
            out.append(datetime.time(10, 20, 30))
        elif t.startswith("timestamp"):
            out.append(datetime.datetime(2024, 1, 2, 3, 4, 5))
        elif t == "binary":
            out.append(b"\x01\x02")
        else:
            out.append(f"{c.lower()}_{i}")
    return tuple(out)


@pytest.fixture()
def sf(monkeypatch):
    srv, port, stop = start_mini_snowflake("user", "password")
    srv.tables["MOCK_DATA"] = (list(_COLS), [_meta(c) for c in _COLS],
                               [_row(i) for i in range(3)])
    monkeypatch.setenv(
        "SEATUNNEL_SPARK_HOST_ALIASES",
        f"<account_id>.aws.snowflakecomputing.com=http://127.0.0.1:{port},"
        f"<account_id>.snowflakecomputing.com=http://127.0.0.1:{port}")
    yield srv, port
    stop()


def test_client_typed_decode(sf):
    srv, port = sf
    cl = SnowflakeRestClient(f"http://127.0.0.1:{port}", "user",
                             "password", "acct")
    cols, types, rows = cl.query("SELECT ID, DEC, DOUBLE, BOOLEAN_COL, "
                                 "DATE_COL, TIMESTAMP_COL, BINARY_COL "
                                 "FROM MOCK_DATA")
    assert types == ["bigint", "decimal(38,10)", "double", "boolean",
                     "date", "timestamp", "binary"]
    assert rows[1] == (1, Decimal("1.25"), 1.5, False,
                       datetime.date(2024, 1, 2),
                       datetime.datetime(2024, 1, 2, 3, 4, 5),
                       b"\x01\x02")
    with pytest.raises(SnowflakeError, match="does not exist"):
        cl.query("SELECT * FROM NOPE")
    cl.close()
    with pytest.raises(SnowflakeError, match="Incorrect"):
        SnowflakeRestClient(f"http://127.0.0.1:{port}", "user", "bad",
                            "acct")
    assert srv.auth_failures >= 1


def test_snowflake_conf_runs_unmodified(spark, sf):
    """jdbc_snowflake_source_and_sink.conf: 26-column query over the
    REST wire into the positional-bind INSERT sink."""
    import glob

    srv, _ = sf
    conf = glob.glob("/root/reference/seatunnel-e2e/"
                     "seatunnel-connector-v2-e2e/connector-jdbc-e2e/*/"
                     "src/test/resources/"
                     "jdbc_snowflake_source_and_sink.conf")[0]
    JobEngine(spark).run(JobSpec.from_file(conf))
    inserts = [s for s in srv.statements
               if s.upper().startswith("INSERT")]
    assert len(inserts) == 3
    blob = " ".join(inserts)
    assert "MOCK_DATA" in blob and "varchar_col_1" in blob


def test_resolve_jdbc_url_keeps_params_and_scheme(monkeypatch, sf):
    """Path/query connection parameters (db, schema, warehouse, role)
    survive host-alias resolution, an explicit http:// endpoint is kept
    when no alias matches, and the REST client still reaches the
    server through the parameterized URL."""
    from seatunnel_spark.net import resolve_jdbc_url

    srv, port = sf
    url = ("jdbc:snowflake://<account_id>.snowflakecomputing.com"
           "/?db=MYDB&schema=PUBLIC&warehouse=WH&role=R1")
    got = resolve_jdbc_url(url)
    assert got.startswith(f"jdbc:snowflake:http://127.0.0.1:{port}")
    assert "db=MYDB" in got and "warehouse=WH" in got
    # the resolved parameterized form still logs in and queries
    cl = SnowflakeRestClient.from_jdbc_url(got, "user", "password")
    cols, _, rows = cl.query("SELECT ID FROM MOCK_DATA")
    assert cols == ["ID"] and len(rows) == 3
    # no alias match -> explicit http endpoint is NOT re-forced to https
    monkeypatch.setenv("SEATUNNEL_SPARK_HOST_ALIASES", "")
    plain = resolve_jdbc_url("jdbc:snowflake:http://local:8080/?db=D")
    assert plain == "jdbc:snowflake:http://local:8080/?db=D"
