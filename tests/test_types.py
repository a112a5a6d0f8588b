from pyspark.sql import types as T

from seatunnel_spark.types import parse_schema, parse_type


def test_simple_types():
    assert parse_type("string") == T.StringType()
    assert parse_type("tinyint") == T.ByteType()
    assert parse_type("bigint") == T.LongType()
    # Spark 4.1 native TIME (older Sparks: LongType nanos-of-day)
    assert parse_type("time") == (
        T.TimeType() if hasattr(T, "TimeType") else T.LongType())
    assert parse_type("timestamp_tz") == T.TimestampType()


def test_parameterized_types():
    assert parse_type("decimal(30, 8)") == T.DecimalType(30, 8)
    assert parse_type("array<int>") == T.ArrayType(T.IntegerType(), True)
    assert parse_type("map<string, string>") == T.MapType(
        T.StringType(), T.StringType(), True
    )
    assert parse_type("array<decimal(10,2)>") == T.ArrayType(T.DecimalType(10, 2), True)
    assert parse_type("map<string, array<int>>") == T.MapType(
        T.StringType(), T.ArrayType(T.IntegerType(), True), True
    )


def test_nested_row():
    dt = parse_type({"c_row": {"c_int": "int"}})
    assert isinstance(dt, T.StructType)
    assert isinstance(dt["c_row"].dataType, T.StructType)


def test_vector_types():
    assert parse_type("float_vector") == T.ArrayType(T.FloatType())
    assert parse_type("sparse_float_vector") == T.MapType(T.IntegerType(), T.FloatType())


def test_schema():
    s = parse_schema({"id": "int", "name": "string", "c_map": "map<string,string>"})
    assert s.fieldNames() == ["id", "name", "c_map"]
