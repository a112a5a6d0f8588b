"""CDC/message format decoder tests (reference: seatunnel-formats,
SURVEY.md §2.6) — static DataFrames standing in for the Kafka value
column, exactly how the streaming path consumes them."""

import json

import pytest

from seatunnel_spark.formats import decode_payload
from seatunnel_spark.types import ROW_KIND_COL

SCHEMA = {"fields": {"id": "int", "name": "string"}}


def _values(spark, *payloads):
    return spark.createDataFrame([(p,) for p in payloads], ["value"])


def test_json_decode(spark):
    df = _values(spark, json.dumps({"id": 1, "name": "a"}))
    out = decode_payload(df, "JSON", SCHEMA).collect()
    assert out[0]["id"] == 1 and out[0]["name"] == "a"
    assert out[0][ROW_KIND_COL] == "+I"


def test_text_decode(spark):
    df = _values(spark, "7,hello")
    out = decode_payload(df, "TEXT", SCHEMA, delimiter=",").collect()
    assert out[0]["id"] == 7 and out[0]["name"] == "hello"


def test_debezium_decode(spark):
    df = _values(
        spark,
        json.dumps({"before": None, "after": {"id": 1, "name": "a"}, "op": "c"}),
        json.dumps({"before": {"id": 1, "name": "a"},
                    "after": {"id": 1, "name": "a2"}, "op": "u"}),
        json.dumps({"before": {"id": 2, "name": "b"}, "after": None, "op": "d"}),
    )
    out = decode_payload(df, "DEBEZIUM_JSON", SCHEMA).collect()
    kinds = sorted((r[ROW_KIND_COL], r["id"], r["name"]) for r in out)
    assert kinds == [
        ("+I", 1, "a"),          # create
        ("+U", 1, "a2"),         # update-after
        ("-D", 2, "b"),          # delete carries before-image
        ("-U", 1, "a"),          # update-before
    ]


def test_canal_decode(spark):
    df = _values(
        spark,
        json.dumps({"data": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
                    "old": None, "type": "INSERT"}),
        json.dumps({"data": [{"id": 1, "name": "a2"}],
                    "old": [{"id": 1, "name": "a"}], "type": "UPDATE"}),
        json.dumps({"data": [{"id": 2, "name": "b"}], "old": None, "type": "DELETE"}),
    )
    out = decode_payload(df, "CANAL_JSON", SCHEMA).collect()
    kinds = sorted((r[ROW_KIND_COL], r["id"], r["name"]) for r in out)
    assert kinds == [
        ("+I", 1, "a"), ("+I", 2, "b"),
        ("+U", 1, "a2"),
        ("-D", 2, "b"),
        ("-U", 1, "a"),
    ]


def test_maxwell_decode(spark):
    df = _values(
        spark,
        json.dumps({"data": {"id": 1, "name": "a"}, "old": None, "type": "insert"}),
        json.dumps({"data": {"id": 1, "name": "a2"}, "old": {"id": 1, "name": "a"},
                    "type": "update"}),
    )
    out = decode_payload(df, "MAXWELL_JSON", SCHEMA).collect()
    kinds = sorted((r[ROW_KIND_COL], r["id"], r["name"]) for r in out)
    assert kinds == [("+I", 1, "a"), ("+U", 1, "a2"), ("-U", 1, "a")]


def test_ogg_decode(spark):
    df = _values(
        spark,
        json.dumps({"before": None, "after": {"id": 5, "name": "x"}, "op_type": "I"}),
        json.dumps({"before": {"id": 5, "name": "x"}, "after": None, "op_type": "D"}),
    )
    out = decode_payload(df, "OGG_JSON", SCHEMA).collect()
    kinds = sorted((r[ROW_KIND_COL], r["id"]) for r in out)
    assert kinds == [("+I", 5), ("-D", 5)]


def test_binary_value_and_unknown_format(spark):
    df = spark.createDataFrame(
        [(bytearray(json.dumps({"id": 3, "name": "z"}).encode()),)], ["value"]
    )
    out = decode_payload(df, "JSON", SCHEMA).collect()
    assert out[0]["id"] == 3
    with pytest.raises(ValueError, match="unknown message format"):
        decode_payload(df, "BOGUS", SCHEMA)


def test_kafka_connect_envelope(spark):
    from seatunnel_spark.formats import decode_payload

    df = spark.createDataFrame(
        [('{"schema":{"type":"struct"},"payload":{"id":7,"name":"x"}}',)],
        ["value"],
    )
    out = decode_payload(df, "COMPATIBLE_KAFKA_CONNECT_JSON",
                         {"fields": {"id": "int", "name": "string"}})
    row = out.first()
    assert row["id"] == 7 and row["name"] == "x" and row["__row_kind"] == "+I"


def test_protobuf_requires_descriptor(spark):
    import pytest
    from seatunnel_spark.formats import decode_payload

    df = spark.createDataFrame([(bytearray(b"\x00"),)], ["value"])
    with pytest.raises(ValueError, match="protobuf_schema_file"):
        decode_payload(df, "PROTOBUF", None)


def test_excel_roundtrip(spark, tmp_path):
    """write_xlsx -> FileSource excel read: values survive the trip
    through ExcelGenerator/ExcelCellUtils semantics (JSON map/array
    cells, delimiter-joined row cells, date-styled serials)."""
    import datetime
    from decimal import Decimal

    from seatunnel_spark.sinks.file import FileSink
    from seatunnel_spark.sources.file import FileSource

    fields = {
        "c_map": "map<string, string>",
        "c_array": "array<int>",
        "c_string": "string",
        "c_boolean": "boolean",
        "c_int": "int",
        "c_bigint": "bigint",
        "c_double": "double",
        "c_date": "date",
        "c_decimal": "decimal(10, 2)",
        "c_timestamp": "timestamp",
        "c_row": {"r_int": "int", "r_string": "string"},
    }
    from seatunnel_spark.types import parse_schema

    schema = parse_schema(fields)
    rows = [
        (
            {"k": "v"}, [1, 2, 3], "hello, world", True, 42, 1 << 40,
            3.5, datetime.date(2024, 2, 29), Decimal("12.34"),
            datetime.datetime(2024, 2, 29, 12, 34, 56),
            (7, "inner"),
        ),
        ({}, [], "", False, None, None, None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    out = str(tmp_path / "xlsx_out")
    sink = FileSink({"path": out, "file_format_type": "excel",
                     "field_delimiter": ";"})
    sink.write(df.coalesce(1))

    src = FileSource({"path": out, "file_format_type": "excel",
                      "field_delimiter": ";", "skip_header_row_number": 1,
                      "schema": {"fields": fields}})
    got = {r["c_string"]: r for r in src.read(spark).collect()}
    r1 = got["hello, world"]
    assert r1["c_map"] == {"k": "v"}
    assert r1["c_array"] == [1, 2, 3]
    assert r1["c_boolean"] is True
    assert r1["c_int"] == 42
    assert r1["c_bigint"] == 1 << 40
    assert r1["c_double"] == 3.5
    assert r1["c_date"] == datetime.date(2024, 2, 29)
    assert r1["c_decimal"] == Decimal("12.34")
    assert r1["c_timestamp"] == datetime.datetime(2024, 2, 29, 12, 34, 56)
    assert r1["c_row"]["r_int"] == 7
    assert r1["c_row"]["r_string"] == "inner"
    r2 = got[""]
    assert r2["c_int"] is None and r2["c_map"] == {} and r2["c_array"] == []
