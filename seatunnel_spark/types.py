"""Type system: SeaTunnel schema DSL  <->  Spark DataTypes.

Implements the reference's schema declaration DSL
(reference: docs/en/concept/schema-feature.md:71-116) and its own
SeaTunnel->Spark translation table
(reference: seatunnel-translation/.../spark/utils/TypeConverterUtils.java:70-107):

  string boolean tinyint smallint int bigint float double "null" bytes
  date time timestamp timestamp_tz  decimal(p,s)  array<T>  map<K,V>
  nested row via dict/HOCON object.

Notes mirrored from the reference translation:
  * TIME has no Spark type -> LongType (nanos-of-day)      (:96)
  * TIMESTAMP_TZ -> TimestampType (UTC-normalised)          (:99)
  * *_VECTOR -> ArrayType(FloatType) / BinaryType / MapType(Int,Float)
    (reference: seatunnel-api/.../type/VectorType.java:32-42)
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "byte": T.ByteType(),
    "smallint": T.ShortType(),
    "short": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "null": T.NullType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    # Spark 4.1 has a native TIME type (behind spark.sql.timeType.enabled,
    # on in session.py); older Sparks would need the reference's
    # LongType nanos-of-day fallback (TypeConverterUtils.java:96).
    "time": T.TimeType() if hasattr(T, "TimeType") else T.LongType(),
    "timestamp": T.TimestampType(),
    "datetime": T.TimestampType(),
    "timestamp_tz": T.TimestampType(),
    # Vector family (VectorType.java:32-42)
    "float_vector": T.ArrayType(T.FloatType()),
    "float16_vector": T.ArrayType(T.FloatType()),
    "bfloat16_vector": T.ArrayType(T.FloatType()),
    "binary_vector": T.BinaryType(),
    "sparse_float_vector": T.MapType(T.IntegerType(), T.FloatType()),
}

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)$", re.I)
_ARRAY_RE = re.compile(r"^array\s*<(.+)>$", re.I | re.S)
_MAP_RE = re.compile(r"^map\s*<(.+)>$", re.I | re.S)


def parse_type(decl) -> T.DataType:
    """Parse one DSL type declaration (string or nested dict) to a Spark DataType."""
    if decl is None:
        # a bare NULL type literal (neo4j_to_neo4j.conf `t.null = NULL`)
        # parses to HOCON null before reaching the type DSL
        return T.NullType()
    if isinstance(decl, dict):
        # Nested row: {field: type_decl, ...} (schema-feature.md nested row syntax)
        return T.StructType(
            [T.StructField(name, parse_type(sub), True) for name, sub in decl.items()]
        )
    s = str(decl).strip().strip('"').strip("'")
    low = s.lower()
    if low in _SIMPLE:
        return _SIMPLE[low]
    m = _DECIMAL_RE.match(low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _ARRAY_RE.match(s)
    if m:
        return T.ArrayType(parse_type(m.group(1)), True)
    m = _MAP_RE.match(s)
    if m:
        key_s, val_s = _split_top_level(m.group(1))
        return T.MapType(parse_type(key_s), parse_type(val_s), True)
    if s.startswith("{") and s.endswith("}"):
        # Row declared as a braces STRING — `c_row = "{c_int = int,
        # c_string = string}"` (connector-fake-e2e
        # fake_full_types_to_assert.conf) — entries split on top-level
        # commas/newlines, k = v or k: v.
        fields: dict = {}
        for part in _split_entries(s[1:-1]):
            m = re.match(r'\s*"?([\w.]+)"?\s*[=:]\s*(.+)$', part, re.S)
            if not m:
                raise ValueError(f"bad row field declaration: {part!r}")
            fields[m.group(1)] = m.group(2).strip()
        return parse_type(fields)
    if low.startswith("row") or low.startswith("struct"):
        raise ValueError(f"nested row types must be declared as dicts, got: {decl!r}")
    raise ValueError(f"unknown type declaration: {decl!r}")


def _split_entries(s: str) -> list[str]:
    """Split row-declaration entries on top-level ',' or newline
    (respecting <>, (), {} nesting and quoted strings)."""
    out, cur, depth, in_q = [], [], 0, False
    for ch in s:
        if in_q:
            cur.append(ch)
            in_q = ch != '"'
        elif ch == '"':
            cur.append(ch)
            in_q = True
        elif ch in "<({":
            depth += 1
            cur.append(ch)
        elif ch in ">)}":
            depth -= 1
            cur.append(ch)
        elif ch in ",\n" and depth == 0:
            if "".join(cur).strip():
                out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


def _split_top_level(s: str) -> tuple[str, str]:
    """Split 'k, v' at the top-level comma (respecting <...> and (...) nesting)."""
    depth = 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            return s[:i].strip(), s[i + 1 :].strip()
    raise ValueError(f"expected 'key, value' in map declaration: {s!r}")


def parse_schema(fields: dict) -> T.StructType:
    """Parse a schema.fields block: {col_name: type_decl, ...} -> StructType."""
    return T.StructType(
        [T.StructField(name, parse_type(decl), True) for name, decl in fields.items()]
    )


def spark_type_to_dsl(dt: T.DataType) -> str:
    """Inverse mapping, used by catalog descriptions and savemode DDL."""
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_type_to_dsl(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_type_to_dsl(dt.keyType)}, {spark_type_to_dsl(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name}: {spark_type_to_dsl(f.dataType)}" for f in dt.fields)
        return f"{{{inner}}}"
    reverse = {
        T.StringType(): "string",
        T.BooleanType(): "boolean",
        T.ByteType(): "tinyint",
        T.ShortType(): "smallint",
        T.IntegerType(): "int",
        T.LongType(): "bigint",
        T.FloatType(): "float",
        T.DoubleType(): "double",
        T.NullType(): "null",
        T.BinaryType(): "bytes",
        T.DateType(): "date",
        T.TimestampType(): "timestamp",
    }
    if dt in reverse:
        return reverse[dt]
    return dt.simpleString()


# Reserved metadata columns (SURVEY.md §1.1): changelog kind and table
# routing ride along as ordinary columns, like Flink/Debezium-on-Spark.
ROW_KIND_COL = "__row_kind"
TABLE_ID_COL = "__table_id"
# CDC event time (epoch millis) — populated by CDC sources from the
# change event's ts_ms; feeds Metadata EventTime/Delay.
EVENT_TS_COL = "__event_ts"

# RowKind enum values (reference: seatunnel-api/.../type/RowKind.java:21-47)
ROW_KINDS = ("+I", "-U", "+U", "-D")
ROW_KIND_FULL = {
    "+I": "INSERT",
    "-U": "UPDATE_BEFORE",
    "+U": "UPDATE_AFTER",
    "-D": "DELETE",
}
