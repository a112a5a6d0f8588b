"""TDS 7.4 wire unit tests: LOGIN7 password obfuscation, scalar codec
round trips, the full_types column matrix over a live client<->server
session, PLP (varchar(max)) chunking, packet fragmentation, error and
auth paths — [MS-TDS] conformance at the subset both ends implement."""

import datetime
import decimal
import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from seatunnel_spark import tds_wire as W
from seatunnel_spark.testing.tds_server import start_mini_sqlserver


@pytest.fixture(scope="module")
def server():
    srv, port, stop = start_mini_sqlserver("sa", "Password!")
    yield srv, port
    stop()


@pytest.fixture()
def client(server):
    srv, port = server
    cl = W.TdsClient("127.0.0.1", port, "sa", "Password!", "testdb")
    yield srv, cl
    cl.close()


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_password_obfuscation_roundtrip(pw):
    assert W.deobfuscate_password(W.obfuscate_password(pw)) == pw


@given(st.datetimes(min_value=datetime.datetime(1900, 1, 1),
                    max_value=datetime.datetime(2079, 1, 1)))
@settings(max_examples=100, deadline=None)
def test_datetime_codec_300s_resolution(dt):
    got = W.decode_datetime(W.encode_datetime(dt))
    assert abs((got - dt).total_seconds()) <= 1 / 300 + 1e-9


@given(st.dates(min_value=datetime.date(1, 1, 1),
                max_value=datetime.date(9999, 12, 31)))
@settings(max_examples=100, deadline=None)
def test_date3_codec(d):
    assert W.decode_date3(W.encode_date3(d)) == d


@given(st.times(), st.integers(min_value=0, max_value=7))
@settings(max_examples=100, deadline=None)
def test_time_codec_scale(t, scale):
    got = W.decode_time(W.encode_time(t, scale), scale)
    lost = 10 ** (6 - min(scale, 6))  # microseconds below the scale
    want_us = (t.hour * 3600 + t.minute * 60 + t.second) * 1_000_000 \
        + t.microsecond
    got_us = (got.hour * 3600 + got.minute * 60 + got.second) * 1_000_000 \
        + got.microsecond
    assert abs(got_us - want_us) < lost or got_us == want_us


@given(st.decimals(allow_nan=False, allow_infinity=False,
                   min_value=-(10 ** 20), max_value=10 ** 20, places=4))
@settings(max_examples=100, deadline=None)
def test_decimal_codec(d):
    assert W.decode_decimal(W.encode_decimal(d, 4), 4) == d


@given(st.decimals(allow_nan=False, allow_infinity=False,
                   min_value=-922337203685477, max_value=922337203685477,
                   places=4))
@settings(max_examples=100, deadline=None)
def test_money_codec(d):
    assert W.decode_money(W.encode_money(d)) == d


def test_full_type_matrix_roundtrip(client):
    srv, cl = client
    dto = datetime.datetime(2018, 7, 13, 10, 0, 0,
                            tzinfo=datetime.timezone(
                                datetime.timedelta(hours=2)))
    srv.tables["matrix"] = (
        ["c_int", "c_big", "c_small", "c_tiny", "c_bit", "c_dec",
         "c_float", "c_real", "c_money", "c_smallmoney", "c_char",
         "c_varchar", "c_nchar", "c_nvarchar", "c_text", "c_xml",
         "c_date", "c_time", "c_dt2", "c_dt", "c_sdt", "c_dto",
         "c_varbin", "c_guid"],
        ["int", "bigint", "smallint", "tinyint", "bit", "decimal(10,3)",
         "float", "real", "money", "smallmoney", "char(4)",
         "varchar(100)", "nchar(3)", "nvarchar(100)", "text", "xml",
         "date", "time(7)", "datetime2(7)", "datetime", "smalldatetime",
         "datetimeoffset(4)", "varbinary(50)", "uniqueidentifier"],
        [(-2147483648, 9223372036854775807, -32768, 255, True,
          decimal.Decimal("1234567.891"), 3.14159, 2.5,
          decimal.Decimal("922337.2036"), decimal.Decimal("214748.3647"),
          "abcd", "vcč — utf8", "nch", "nvč — ucs2", "big text blob",
          "<a>b</a>", datetime.date(2018, 7, 13),
          datetime.time(10, 23, 45, 123456),
          datetime.datetime(2018, 7, 13, 11, 23, 45, 340000),
          datetime.datetime(2018, 7, 13, 13, 23, 45, 780000),
          datetime.datetime(2018, 7, 13, 14, 23),
          dto, b"\x00\x01\xffbin",
          "12345678-1234-5678-1234-567812345678"),
         tuple([None] * 24)])
    cols, types, rows = cl.query("SELECT * FROM matrix")
    assert cols[0] == "c_int" and len(cols) == 24
    assert types[:6] == ["int", "bigint", "smallint", "tinyint", "bit",
                         "decimal"]
    r = rows[0]
    assert r[0] == -2147483648 and r[1] == 9223372036854775807
    assert r[2] == -32768 and r[3] == 255 and r[4] is True
    assert r[5] == decimal.Decimal("1234567.891")
    assert r[6] == pytest.approx(3.14159)
    assert r[7] == pytest.approx(2.5, abs=1e-6)
    assert r[8] == decimal.Decimal("922337.2036")
    assert r[9] == decimal.Decimal("214748.3647")
    assert r[10] == "abcd" and r[11] == "vcč — utf8"
    assert r[12] == "nch" and r[13] == "nvč — ucs2"
    assert r[14] == "big text blob" and r[15] == "<a>b</a>"
    assert r[16] == datetime.date(2018, 7, 13)
    assert r[17] == datetime.time(10, 23, 45, 123456)
    assert r[18] == datetime.datetime(2018, 7, 13, 11, 23, 45, 340000)
    # datetime has 1/300 s resolution
    assert abs((r[19] - datetime.datetime(2018, 7, 13, 13, 23, 45, 780000)
                ).total_seconds()) < 0.01
    assert r[20] == datetime.datetime(2018, 7, 13, 14, 23)
    assert r[21] == dto
    assert r[22] == b"\x00\x01\xffbin"
    assert r[23] == "12345678-1234-5678-1234-567812345678"
    assert all(v is None for v in rows[1])


def test_plp_large_value_crosses_packets(client):
    """varchar(max) bigger than one 4096-byte TDS packet: PLP chunking
    + response fragmentation both exercised."""
    srv, cl = client
    big = "x" * 50_000
    srv.tables["blob_t"] = (["id", "body"], ["int", "varchar(max)"],
                            [(1, big)])
    _, types, rows = cl.query("SELECT * FROM blob_t")
    assert rows[0][1] == big


def test_large_batch_request_fragments(client):
    """A SQLBatch above the packet size fragments on the client side and
    reassembles on the server (status-byte EOM protocol)."""
    srv, cl = client
    filler = ", ".join(f"'{i:06d}'" for i in range(1500))
    sql = f"INSERT INTO t VALUES ({filler})"
    assert len(sql.encode("utf-16-le")) > 8192
    cl.execute(sql)
    assert srv.statements[-1] == sql


def test_error_token_raises(client):
    srv, cl = client
    with pytest.raises(W.TdsError, match="Invalid object name"):
        cl.query("SELECT * FROM does_not_exist")


def test_auth_reject(server):
    srv, port = server
    before = srv.auth_failures
    with pytest.raises(RuntimeError, match="[Ll]ogin"):
        W.TdsClient("127.0.0.1", port, "sa", "nope")
    assert srv.auth_failures == before + 1


def test_top_and_where(client):
    srv, cl = client
    srv.tables["people"] = (["id", "name"], ["int", "nvarchar(50)"],
                            [(1, "ann"), (2, "bob"), (3, "cyn")])
    _, _, rows = cl.query("SELECT TOP 2 id, name FROM people")
    assert rows == [(1, "ann"), (2, "bob")]
    _, _, rows = cl.query("SELECT name FROM people WHERE id = 2")
    assert rows == [("bob",)]
    _, _, rows = cl.query("SELECT * FROM people WHERE 1=0")
    assert rows == []


def test_from_jdbc_url_props():
    from unittest.mock import patch

    seen = {}

    def fake_init(self, host, port=1433, user="sa", password="",
                  database="", timeout=30.0, appname="seatunnel-spark"):
        seen.update(host=host, port=port, database=database)

    with patch.object(W.TdsClient, "__init__", fake_init):
        W.TdsClient.from_jdbc_url(
            "jdbc:sqlserver://db-host:1434;databaseName=mydb;encrypt=false",
            "sa", "pw")
    assert seen == {"host": "db-host", "port": 1434, "database": "mydb"}
