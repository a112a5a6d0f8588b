"""Golden parity with the reference's own CreateTableSqlBuilder unit
tests for the proprietary-wire dialects (IrisCreateTableSqlBuilderTest
.java, XuguCreateTableSqlBuilderTest.java) — their DDL/catalog layer
is pure string generation and fully verifiable without the wire."""

import re

from seatunnel_spark.plans.ddl_builders import (ColumnSpec,
                                                generic_create_table,
                                                iris_column_type,
                                                iris_create_table,
                                                xugu_column_type,
                                                xugu_create_table)

_IRIS_COLS = [
    ColumnSpec("id", "bigint", 22, False, "id"),
    ColumnSpec("name", "string", 128, False, "name"),
    ColumnSpec("age", "int", None, True, "age"),
    ColumnSpec("createTime", "timestamp", 3, True, "createTime"),
    ColumnSpec("lastUpdateTime", "timestamp", 3, True, "lastUpdateTime"),
]


def test_iris_create_table_golden():
    got = iris_create_table(
        "test_table", _IRIS_COLS, schema="test_schema",
        primary_key=["id"],
        unique_keys=[("name", ["name"])],
        index_keys=[("age", ["age"])],
        table_comment="User table", create_index=True)
    expect = (
        'CREATE TABLE "test_schema"."test_table" (\n'
        " %Description 'User table',\n"
        '"id" BIGINT NOT NULL %Description \'id\',\n'
        '"name" VARCHAR(128) NOT NULL %Description \'name\',\n'
        '"age" INTEGER %Description \'age\',\n'
        '"createTime" TIMESTAMP2 %Description \'createTime\',\n'
        '"lastUpdateTime" TIMESTAMP2 %Description \'lastUpdateTime\',\n'
        ' PRIMARY KEY ("id"),\n'
        'UNIQUE ("name")\n'
        ");\n"
        'CREATE INDEX test_table_age ON "test_schema"."test_table"'
        '("age");')
    assert got == expect


def test_iris_create_table_skip_index_golden():
    got = iris_create_table(
        "test_table", _IRIS_COLS, schema="test_schema",
        primary_key=["id"],
        unique_keys=[("name", ["name"])],
        index_keys=[("age", ["age"])],
        table_comment="User table", create_index=False)
    expect = (
        'CREATE TABLE "test_schema"."test_table" (\n'
        " %Description 'User table',\n"
        '"id" BIGINT NOT NULL %Description \'id\',\n'
        '"name" VARCHAR(128) NOT NULL %Description \'name\',\n'
        '"age" INTEGER %Description \'age\',\n'
        '"createTime" TIMESTAMP2 %Description \'createTime\',\n'
        '"lastUpdateTime" TIMESTAMP2 %Description \'lastUpdateTime\'\n'
        ");\n")
    assert got == expect


_XUGU_COLS = [
    ColumnSpec("id", "bigint", 22, False, "id"),
    ColumnSpec("name", "string", 128, False, "name"),
    ColumnSpec("age", "int", None, True, "age"),
    ColumnSpec("blob_v", "bytes", 2 ** 63 - 1, True, "blob_v"),
    ColumnSpec("createTime", "timestamp", 3, True, "createTime"),
    ColumnSpec("lastUpdateTime", "timestamp", 3, True, "lastUpdateTime"),
]


def test_xugu_create_table_golden():
    got = xugu_create_table("test_table", _XUGU_COLS,
                            primary_key=("id", ["id"]),
                            create_index=True)
    expect = (
        'CREATE TABLE "test_table" (\n'
        '"id" BIGINT NOT NULL,\n'
        '"name" VARCHAR(128) NOT NULL,\n'
        '"age" INTEGER,\n'
        '"blob_v" BLOB,\n'
        '"createTime" TIMESTAMP,\n'
        '"lastUpdateTime" TIMESTAMP,\n'
        'CONSTRAINT id_88a3 PRIMARY KEY ("id")\n'
        ");\n"
        'COMMENT ON COLUMN "test_table"."id" IS \'id\';\n'
        'COMMENT ON COLUMN "test_table"."name" IS \'name\';\n'
        'COMMENT ON COLUMN "test_table"."age" IS \'age\';\n'
        'COMMENT ON COLUMN "test_table"."blob_v" IS \'blob_v\';\n'
        'COMMENT ON COLUMN "test_table"."createTime" IS '
        "'createTime';\n"
        'COMMENT ON COLUMN "test_table"."lastUpdateTime" IS '
        "'lastUpdateTime'")
    # the CONSTRAINT suffix is random (reference: UUID substring) —
    # normalize exactly as XuguCreateTableSqlBuilderTest does
    rx = r"id_\w+"
    assert re.sub(rx, "id_", got) == re.sub(rx, "id_", expect)


def test_xugu_create_table_skip_index_golden():
    got = xugu_create_table("test_table", _XUGU_COLS,
                            primary_key=("id", ["id"]),
                            create_index=False)
    expect = (
        'CREATE TABLE "test_table" (\n'
        '"id" BIGINT NOT NULL,\n'
        '"name" VARCHAR(128) NOT NULL,\n'
        '"age" INTEGER,\n'
        '"blob_v" BLOB,\n'
        '"createTime" TIMESTAMP,\n'
        '"lastUpdateTime" TIMESTAMP\n'
        ");\n"
        'COMMENT ON COLUMN "test_table"."id" IS \'id\';\n'
        'COMMENT ON COLUMN "test_table"."name" IS \'name\';\n'
        'COMMENT ON COLUMN "test_table"."age" IS \'age\';\n'
        'COMMENT ON COLUMN "test_table"."blob_v" IS \'blob_v\';\n'
        'COMMENT ON COLUMN "test_table"."createTime" IS '
        "'createTime';\n"
        'COMMENT ON COLUMN "test_table"."lastUpdateTime" IS '
        "'lastUpdateTime'")
    assert got == expect


def test_iris_type_edges():
    # IrisTypeConverter.reconvert edges: string overflow, decimal
    # clamps, time scale cap, byte split
    assert iris_column_type(ColumnSpec("c", "string")) == \
        "VARCHAR(2147483647)"
    assert iris_column_type(ColumnSpec("c", "string", 2 ** 31 - 1)) == \
        "LONG VARCHAR"
    assert iris_column_type(ColumnSpec("c", "decimal(50,30)")) == \
        "DECIMAL(37,18)"
    assert iris_column_type(ColumnSpec("c", "decimal(0,0)")) == \
        "DECIMAL(15,0)"
    assert iris_column_type(ColumnSpec("c", "decimal(2,5)")) == \
        "DECIMAL(5,5)"
    assert iris_column_type(ColumnSpec("c", "time", scale=12)) == \
        "TIME(9)"
    assert iris_column_type(ColumnSpec("c", "boolean")) == "BIT"
    assert iris_column_type(ColumnSpec("c", "bytes", 16)) == \
        "BINARY(16)"
    assert iris_column_type(ColumnSpec("c", "bytes")) == "LONG BINARY"


def test_xugu_type_edges():
    # XuguTypeConverter.reconvert edges: NUMERIC clamp with scale
    # shift, VARCHAR->CLOB at 60000, BINARY->BLOB at 65532,
    # TIME(3)/TIMESTAMP(6) caps
    assert xugu_column_type(ColumnSpec("c", "decimal(40,10)")) == \
        "NUMERIC(38,8)"
    assert xugu_column_type(ColumnSpec("c", "decimal(0,0)")) == \
        "NUMERIC(38,18)"
    assert xugu_column_type(ColumnSpec("c", "string", 60001)) == "CLOB"
    assert xugu_column_type(ColumnSpec("c", "string", 60000)) == \
        "VARCHAR(60000)"
    assert xugu_column_type(ColumnSpec("c", "bytes", 65532)) == "BINARY"
    assert xugu_column_type(ColumnSpec("c", "bytes", 65533)) == "BLOB"
    assert xugu_column_type(ColumnSpec("c", "time", scale=5)) == \
        "TIME(3)"
    assert xugu_column_type(ColumnSpec("c", "timestamp", scale=9)) == \
        "TIMESTAMP(6)"


def test_generic_create_table():
    sql = generic_create_table('"S"."T"', [("a", "INT"), ("b", "VARCHAR(255)")],
                               primary_key=["a"])
    assert sql == ('CREATE TABLE "S"."T" ("a" INT, "b" VARCHAR(255), '
                   'PRIMARY KEY ("a"))')


def test_iris_multiple_indexes_all_emitted():
    cols = [ColumnSpec("a", "int"), ColumnSpec("b", "int"),
            ColumnSpec("c", "int")]
    got = iris_create_table("t", cols, index_keys=[("b", ["b"]),
                                                   ("c", ["c"])])
    assert 'CREATE INDEX t_b ON "t"("b");' in got
    assert 'CREATE INDEX t_c ON "t"("c");' in got
