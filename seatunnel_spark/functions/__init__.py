"""Zeta SQL dialect compatibility layer.

The reference's Sql transform exposes ~100 scalar functions through an
H2-flavored dialect (registry: transform/sql/zeta/ZetaSQLFunction.java:79-192;
examples: docs/en/transform-v2/sql-functions.md). Spark SQL already has
near-1:1 natives for almost all of them (SURVEY.md §2.3); this module
closes the gap two ways:

1. ``rewrite_zeta_sql`` — pure name-level rewrites for functions whose
   Spark spelling differs (FORMATDATETIME -> date_format, ...). This
   keeps everything JVM-side / codegen'd.
2. ``register_zeta_udfs`` — the handful of true shims with no Spark
   equivalent (TO_CHAR, INSERT, IS_DATE, TRUNCATE-numeric), registered
   as Python UDFs. These exist for config-compat only; the hot path
   never needs them.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import SparkSession

# Zeta name -> Spark name (argument-compatible). Word-boundary,
# case-insensitive, applied only to call sites ``NAME(``.
_NAME_REWRITES = {
    "HEXTORAW": "unhex",
    "RAWTOHEX": "hex",
    "LCASE": "lower",
    "UCASE": "upper",
    "FORMATDATETIME": "date_format",
    "PARSEDATETIME": "to_timestamp",
    # Zeta TO_CHAR takes date/timestamp + Java pattern; Spark's native
    # to_char is numeric-format-only, so route the Zeta spelling to the
    # shim WITHOUT shadowing the native function.
    "TO_CHAR": "ZETA_TO_CHAR",
    "INSERT": "INSERT_STR",
    "DAY_OF_MONTH": "dayofmonth",
    "DAY_OF_WEEK": "dayofweek",
    "DAY_OF_YEAR": "dayofyear",
    "WEEK": "weekofyear",
    # Zeta DATEDIFF(d1, d2) = whole days d1-d2 (sql-functions.md) —
    # Spark datediff(end, start) matches the arg order.
    # Zeta DAYNAME/MONTHNAME return FULL names ('Thursday'); Spark 4's
    # natives abbreviate ('Thu') -> shim.
    "DAYNAME": "ZETA_DAYNAME",
    "MONTHNAME": "ZETA_MONTHNAME",
}


def rewrite_zeta_sql(sql: str) -> str:
    out = sql
    for zeta, spark_name in _NAME_REWRITES.items():
        out = re.sub(rf"\b{zeta}\s*\(", f"{spark_name}(", out, flags=re.I)
    # Zeta allows parameterless VARCHAR in CAST (ZetaSQLType.java:68-83);
    # Spark requires a length — map to STRING.
    out = re.sub(r"\bAS\s+VARCHAR\b(?!\s*\()", "AS STRING", out, flags=re.I)
    return out


def _to_char(value, fmt: str | None = None) -> str | None:
    if value is None:
        return None
    if isinstance(value, (datetime, date)) and fmt:
        # Java DateTimeFormatter pattern -> strftime (common subset).
        py = (
            fmt.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")
            .replace("HH", "%H").replace("mm", "%M").replace("ss", "%S")
        )
        return value.strftime(py)
    return str(value)


def _insert(s, start, length, addition):
    # H2 INSERT(s, start, len, add): replace len chars at 1-based start.
    if s is None:
        return None
    start = int(start)
    length = int(length)
    return s[: start - 1] + str(addition) + s[start - 1 + length :]


def _is_date(s, fmt: str) -> bool:
    if s is None:
        return False
    py = (
        fmt.replace("yyyy", "%Y").replace("MM", "%m").replace("dd", "%d")
        .replace("HH", "%H").replace("mm", "%M").replace("ss", "%S")
    )
    try:
        datetime.strptime(s, py)
        return True
    except ValueError:
        return False


def _truncate(x, d: int = 0):
    # H2 TRUNCATE(number, digits): toward zero.
    if x is None:
        return None
    import math

    scale = 10 ** int(d)
    return math.trunc(float(x) * scale) / scale


_REGISTERED_SESSIONS: set[int] = set()


def register_zeta_udfs(spark: SparkSession) -> None:
    """Idempotently register the true-shim functions on a session."""
    key = id(spark)
    if key in _REGISTERED_SESSIONS:
        return
    from pyspark.sql.types import BooleanType, DoubleType, StringType

    spark.udf.register("ZETA_TO_CHAR", _to_char, StringType())
    spark.udf.register("INSERT_STR", _insert, StringType())
    spark.udf.register(
        "ZETA_DAYNAME", lambda d: d.strftime("%A") if d is not None else None,
        StringType(),
    )
    spark.udf.register(
        "ZETA_MONTHNAME", lambda d: d.strftime("%B") if d is not None else None,
        StringType(),
    )
    spark.udf.register("IS_DATE", _is_date, BooleanType())
    spark.udf.register("TRUNCATE", _truncate, DoubleType())
    _REGISTERED_SESSIONS.add(key)
