"""Dialect CREATE TABLE builders — reference catalog parity for the
dialects whose WIRE protocols are proprietary (no public spec) but
whose DDL/catalog layer is a pure, testable string transform:

  * IRIS  — IrisCreateTableSqlBuilder.java + IrisTypeConverter.java
            (%Description comment clauses, TIMESTAMP2, BIT booleans,
            LONG VARCHAR / LONG BINARY overflow types, inline UNIQUE,
            out-of-line CREATE INDEX named <table>_<constraint>)
  * XUGU  — XuguCreateTableSqlBuilder.java + XuguTypeConverter.java
            (NUMERIC decimals, BLOB/BINARY split at 65532 bytes,
            CONSTRAINT <pk>_<rand4> PRIMARY KEY, out-of-line
            COMMENT ON COLUMN statements)
  * generic — the portable form the wire-client SaveMode path uses
            (sinks/jdbc.py _wire_save_mode)

Golden-tested against the expected strings in the reference's own
IrisCreateTableSqlBuilderTest / XuguCreateTableSqlBuilderTest.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass


@dataclass
class ColumnSpec:
    name: str
    dsl: str                      # spark-ish dsl: bigint, string, ...
    length: int | None = None     # column length (string/bytes)
    nullable: bool = True
    comment: str | None = None
    scale: int | None = None      # time/timestamp fractional scale


def _parse_decimal(dsl: str) -> tuple[int, int] | None:
    m = re.match(r"(?:decimal|numeric)\s*\(\s*(-?\d+)\s*,\s*(-?\d+)\s*\)", dsl)
    if m:
        return int(m.group(1)), int(m.group(2))
    if dsl in ("decimal", "numeric"):
        return 0, 0
    return None


_INT_MAX = 2_147_483_647


def iris_column_type(c: ColumnSpec) -> str:
    """IrisTypeConverter.reconvert (connector-jdbc .../iris/
    IrisTypeConverter.java:276-434): MAX_SCALE 18, MAX_PRECISION 37,
    DEFAULT (15,0), MAX_TIME_SCALE 9."""
    d = c.dsl.lower()
    dec = _parse_decimal(d)
    if dec is not None:
        p, s = dec
        s = min(max(s, 0), 18)
        if p < s:
            p = s
        if p <= 0:
            p, s = 15, 0
        elif p > 37:
            p, s = 37, 18
        return f"DECIMAL({p},{s})"
    if d == "string":
        if not c.length or c.length <= 0:
            return f"VARCHAR({_INT_MAX})"
        if c.length < _INT_MAX:
            return f"VARCHAR({c.length})"
        return "LONG VARCHAR"
    if d in ("binary", "bytes"):
        if not c.length or c.length <= 0 or c.length >= _INT_MAX:
            return "LONG BINARY"
        return f"BINARY({c.length})"
    if d == "time":
        if c.scale and c.scale > 0:
            return f"TIME({min(c.scale, 9)})"
        return "TIME"
    return {
        "boolean": "BIT", "tinyint": "TINYINT", "smallint": "SMALLINT",
        "int": "INTEGER", "bigint": "BIGINT", "float": "FLOAT",
        "double": "DOUBLE", "date": "DATE", "timestamp": "TIMESTAMP2",
    }[d]


def xugu_column_type(c: ColumnSpec) -> str:
    """XuguTypeConverter.reconvert (.../xugu/XuguTypeConverter.java:
    205-380): NUMERIC max (38,38) default (38,18), VARCHAR cap 60000
    then CLOB, BINARY cap 65532 then BLOB, TIME scale cap 3,
    TIMESTAMP scale cap 6."""
    d = c.dsl.lower()
    dec = _parse_decimal(d)
    if dec is not None:
        p, s = dec
        if p <= 0:
            p, s = 38, 18
        elif p > 38:
            s = max(0, s - (p - 38))
            p = 38
        s = min(max(s, 0), 38)
        return f"NUMERIC({p},{s})"
    if d == "string":
        if not c.length or c.length <= 0:
            return "VARCHAR(60000)"
        if c.length <= 60000:
            return f"VARCHAR({c.length})"
        return "CLOB"
    if d in ("binary", "bytes"):
        if not c.length or c.length <= 0 or c.length > 65532:
            return "BLOB"
        return "BINARY"
    if d == "time":
        if c.scale and c.scale > 0:
            return f"TIME({min(c.scale, 3)})"
        return "TIME"
    if d == "timestamp":
        if c.scale and c.scale > 0:
            return f"TIMESTAMP({min(c.scale, 6)})"
        return "TIMESTAMP"
    return {
        "boolean": "BOOLEAN", "tinyint": "TINYINT",
        "smallint": "SMALLINT", "int": "INTEGER", "bigint": "BIGINT",
        "float": "FLOAT", "double": "DOUBLE", "date": "DATE",
    }[d]


def _schema_table(schema: str | None, table: str) -> str:
    return (f'"{schema}"."{table}"' if schema else f'"{table}"')


def iris_create_table(
    table: str,
    columns: list[ColumnSpec],
    schema: str | None = None,
    primary_key: list[str] | None = None,
    unique_keys: list[tuple[str, list[str]]] | None = None,
    index_keys: list[tuple[str, list[str]]] | None = None,
    table_comment: str | None = None,
    create_index: bool = True,
) -> str:
    """IrisCreateTableSqlBuilder.build — %Description clauses inline,
    UNIQUE inline, INDEX as a trailing CREATE INDEX <table>_<name>."""
    tid = _schema_table(schema, table)
    lines = []
    for c in columns:
        line = f'"{c.name}" {iris_column_type(c)}'
        if not c.nullable:
            line += " NOT NULL"
        if c.comment:
            line += f" %Description '{c.comment}'"
        lines.append(line)
    index_sqls = []
    if create_index:
        if primary_key:
            cols = ", ".join(f'"{k}"' for k in primary_key)
            lines.append(f" PRIMARY KEY ({cols})")
        for name, cols in unique_keys or []:
            q = ", ".join(f'"{c}"' for c in cols)
            lines.append(f"UNIQUE ({q})")
        for name, cols in index_keys or []:
            q = ", ".join(f'"{c}"' for c in cols)
            index_sqls.append(f"CREATE INDEX {table}_{name} ON {tid}({q});")
    head = f"CREATE TABLE {tid} (\n"
    if table_comment:
        head += f" %Description '{table_comment}',\n"
    return head + ",\n".join(lines) + "\n);" + "\n" \
        + "\n".join(index_sqls)


def xugu_create_table(
    table: str,
    columns: list[ColumnSpec],
    schema: str | None = None,
    primary_key: tuple[str, list[str]] | None = None,
    create_index: bool = True,
    _pk_suffix: str | None = None,
) -> str:
    """XuguCreateTableSqlBuilder.build — CONSTRAINT <pk>_<rand4>
    PRIMARY KEY inline, comments as trailing COMMENT ON COLUMN
    statements (no trailing semicolon, as the reference emits)."""
    tid = _schema_table(schema, table)
    lines = []
    for c in columns:
        line = f'"{c.name}" {xugu_column_type(c)}'
        if not c.nullable:
            line += " NOT NULL"
        lines.append(line)
    if create_index and primary_key and primary_key[1]:
        pk_name, pk_cols = primary_key
        suffix = _pk_suffix or os.urandom(2).hex()
        cols = ", ".join(f'"{k}"' for k in pk_cols)
        lines.append(f"CONSTRAINT {pk_name[:25]}_{suffix} "
                     f"PRIMARY KEY ({cols})")
    sql = f"CREATE TABLE {tid} (\n" + ",\n".join(lines) + "\n)"
    comments = [f'COMMENT ON COLUMN {tid}."{c.name}" IS \'{c.comment}\''
                for c in columns if c.comment]
    if comments:
        sql += ";\n" + ";\n".join(comments)
    return sql


def generic_create_table(table_identifier: str,
                         columns: list[tuple[str, str]],
                         primary_key: list[str] | None = None,
                         quote: str = '"') -> str:
    """Portable CREATE TABLE used by the wire-client SaveMode path
    (DefaultSaveModeHandler's createTable analog)."""
    q = quote
    col_ddl = ", ".join(f"{q}{n}{q} {t}" for n, t in columns)
    if primary_key:
        col_ddl += (", PRIMARY KEY ("
                    + ", ".join(f"{q}{k}{q}" for k in primary_key) + ")")
    return f"CREATE TABLE {table_identifier} ({col_ddl})"


__all__ = ["ColumnSpec", "iris_column_type", "xugu_column_type",
           "iris_create_table", "xugu_create_table",
           "generic_create_table"]
