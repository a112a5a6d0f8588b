"""Thrift binary protocol + HiveServer2 TCLIService tests: codec
round-trip properties, the stdlib client vs the mini HS2 over
SASL-PLAIN framing, columnar TRowSet nulls, and — the strongest
conformance evidence — the GENUINE hive-jdbc JVM driver (bundled with
Spark) completing a full read against the same mini server."""

import datetime
from decimal import Decimal

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark import thrift_codec as T
from seatunnel_spark.hive_thrift import HiveThriftClient, HiveThriftError
from seatunnel_spark.testing.hive_thrift_server import start_mini_hs2


@pytest.fixture(scope="module")
def server():
    srv, port, stop = start_mini_hs2("root", "")
    srv.tables["people"] = (
        ["id", "name", "score", "active", "born", "ts", "dec"],
        ["int", "string", "double", "boolean", "date", "timestamp",
         "decimal(10,2)"],
        [(1, "ann", 9.5, True, datetime.date(2020, 1, 2),
          datetime.datetime(2020, 1, 2, 3, 4, 5), Decimal("1.25")),
         (2, None, None, None, None, None, None)])
    yield srv, port
    stop()


_prim = st.one_of(
    st.booleans().map(lambda b: (T.BOOL, b)),
    st.integers(-128, 127).map(lambda v: (T.BYTE, v)),
    st.integers(-(2 ** 15), 2 ** 15 - 1).map(lambda v: (T.I16, v)),
    st.integers(-(2 ** 31), 2 ** 31 - 1).map(lambda v: (T.I32, v)),
    st.integers(-(2 ** 63), 2 ** 63 - 1).map(lambda v: (T.I64, v)),
    st.floats(allow_nan=False).map(lambda v: (T.DOUBLE, v)),
    st.binary(max_size=40).map(lambda v: (T.STRING, v)),
)


@given(st.dictionaries(st.integers(1, 200), _prim, max_size=8))
@settings(max_examples=150, deadline=None)
def test_struct_roundtrip(fields):
    enc = T.encode_struct(fields)
    dec, i = T.decode_struct(enc)
    assert i == len(enc)
    for fid, (tt, v) in fields.items():
        dt, dv = dec[fid]
        assert dt == tt
        if tt == T.STRING:
            assert dv == (v.encode() if isinstance(v, str) else v)
        else:
            assert dv == v


def test_nested_containers_roundtrip():
    msg = T.encode_message("M", T.CALL, 7, {
        1: (T.LIST, (T.STRUCT, [{1: (T.I32, 5)}, {1: (T.I32, 6)}])),
        2: (T.MAP, (T.STRING, T.STRING, {"a": "b"})),
        3: (T.SET, (T.I64, [1, 2, 3])),
    })
    name, mtype, seqid, fields = T.decode_message(msg)
    assert (name, mtype, seqid) == ("M", T.CALL, 7)
    assert T.sget(fields, 1)[1][0][1] == (T.I32, 5)
    assert T.sget(fields, 3) == (T.I64, [1, 2, 3])


def test_query_types_and_nulls(server):
    srv, port = server
    cl = HiveThriftClient("127.0.0.1", port, "root", "")
    try:
        cols, types, rows = cl.query("select * from people")
        assert cols[0] == "id" and types == [
            "int", "string", "double", "boolean", "date", "timestamp",
            "decimal"]
        assert rows[0] == (1, "ann", 9.5, True, datetime.date(2020, 1, 2),
                           datetime.datetime(2020, 1, 2, 3, 4, 5),
                           Decimal("1.25"))
        assert rows[1] == (2, None, None, None, None, None, None)
        _, _, probe = cl.query(
            "SELECT * FROM (select * from people) p LIMIT 0")
        assert probe == []
        with pytest.raises(HiveThriftError, match="not found"):
            cl.query("select * from missing_table")
    finally:
        cl.close()


def test_sasl_auth_reject(server):
    srv, port = server
    srv.strict_password = True
    before = srv.auth_failures
    try:
        with pytest.raises(HiveThriftError, match="SASL"):
            HiveThriftClient("127.0.0.1", port, "root", "wrongpw")
        assert srv.auth_failures == before + 1
        with pytest.raises(HiveThriftError, match="SASL"):
            HiveThriftClient("127.0.0.1", port, "nobody", "")
    finally:
        srv.strict_password = False


def test_wire_executor_routes_hive2(server):
    from seatunnel_spark.sql_exec import WireExecutor, wire_family

    srv, port = server
    assert wire_family("jdbc:hive2://h:10000/default") == "hive"
    ex = WireExecutor(f"jdbc:hive2://127.0.0.1:{port}/default", "root", "")
    try:
        cols, _, rows = ex.query("select id from people where id = 2")
        assert cols == ["id"] and rows == [(2,)]
    finally:
        ex.close()


def test_genuine_jvm_hive_driver_reads(spark, server):
    """Conformance: Spark's bundled org.apache.hive.jdbc.HiveDriver —
    a real TCLIService client we did not write — opens a session over
    our SASL framing, probes the schema, and fetches rows with nulls
    from the mini server."""
    srv, port = server
    df = spark.read.jdbc(
        f"jdbc:hive2://127.0.0.1:{port}/default",
        "(select id, name, dec from people) q",
        properties={"user": "root", "password": "",
                    "driver": "org.apache.hive.jdbc.HiveDriver"})
    assert dict(df.dtypes) == {"id": "int", "name": "string",
                               "dec": "decimal(10,2)"}
    got = sorted([tuple(r) for r in df.collect()])
    assert got == [(1, "ann", Decimal("1.25")), (2, None, None)]
