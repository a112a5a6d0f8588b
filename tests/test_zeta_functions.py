"""Golden tests for the Zeta SQL function surface through the Sql
transform (reference registry: ZetaSQLFunction.java:79-192; examples:
docs/en/transform-v2/sql-functions.md). Each case: Zeta spelling in,
documented result out — proving reference job SQL runs unchanged."""

import pytest

from seatunnel_spark.transforms import get_transform


def _sql1(spark, expr: str):
    """Evaluate one scalar expression through the Sql transform."""
    df = spark.createDataFrame([(1,)], ["id"])
    out = get_transform(
        "Sql", {"plugin_input": "t_in", "query": f"SELECT {expr} AS v FROM t_in"}
    ).apply(df)
    return out.first()["v"]


# (zeta expression, expected) — from sql-functions.md documented examples
STRING_CASES = [
    ("ASCII('A')", 65),
    ("BIT_LENGTH('ab')", 16),
    ("CHAR_LENGTH('Hello')", 5),
    ("OCTET_LENGTH('ab')", 2),
    ("CHAR(65)", "A"),
    ("CONCAT('Hello', ' ', 'World')", "Hello World"),
    ("CONCAT_WS(',', 'a', 'b')", "a,b"),
    # H2-legacy: 4 hex digits per UTF-16 char (StringFunction.java:168-176)
    ("RAWTOHEX('A')", "0041"),
    ("LCASE('HELLO')", "hello"),
    ("UCASE('hello')", "HELLO"),
    ("LEFT('Hello', 3)", "Hel"),
    ("RIGHT('Hello', 3)", "llo"),
    ("LOCATE('ll', 'Hello')", 3),
    ("INSTR('Hello', 'll')", 3),
    ("LPAD('5', 3, '0')", "005"),
    ("RPAD('5', 3, '0')", "500"),
    ("LTRIM('  x')", "x"),
    ("RTRIM('x  ')", "x"),
    ("TRIM(' x ')", "x"),
    ("REGEXP_REPLACE('Hello World', '\\s+', '_')", "Hello_World"),   # raw Zeta string
    ("REGEXP_LIKE('Hello', 'H.*')", True),
    ("REGEXP_SUBSTR('2023-01-02', '\\d{4}')", "2023"),   # raw Zeta string
    ("REPEAT('ab', 3)", "ababab"),
    ("REPLACE('Hello', 'l', 'L')", "HeLLo"),
    ("SOUNDEX('Robert')", "R163"),
    ("SPACE(3)", "   "),
    ("SUBSTRING('Hello', 2, 3)", "ell"),
    ("TRANSLATE('Hello', 'el', 'ip')", "Hippo"),
]

NUMERIC_CASES = [
    ("ABS(-5)", 5),
    ("MOD(10, 3)", 1),
    ("CAST(CEIL(1.2) AS INT)", 2),
    ("CAST(FLOOR(1.8) AS INT)", 1),
    ("SIGN(-3)", -1.0),
    ("CAST(SQRT(16.0) AS INT)", 4),
    ("CAST(POWER(2, 10) AS INT)", 1024),
    ("CAST(EXP(0) AS INT)", 1),
    ("CAST(LN(1.0) AS INT)", 0),
    ("CAST(LOG10(100.0) AS INT)", 2),
    ("ROUND(3.7)", 4.0),
    ("TRUNCATE(3.79, 1)", 3.7),
    ("CAST(COS(0) AS INT)", 1),
    ("CAST(PI() * 0 AS INT)", 0),
]

DATETIME_CASES = [
    ("YEAR(TIMESTAMP '2023-06-15 10:30:00')", 2023),
    ("QUARTER(TIMESTAMP '2023-06-15 10:30:00')", 2),
    ("MONTH(TIMESTAMP '2023-06-15 10:30:00')", 6),
    ("DAY_OF_MONTH(TIMESTAMP '2023-06-15 10:30:00')", 15),
    # ISO Monday=1 (DateTimeFunction.java:323-330; func_datetime.conf:228)
    ("DAY_OF_WEEK(TIMESTAMP '2023-06-15 10:30:00')", 4),   # Thursday
    ("DAY_OF_YEAR(TIMESTAMP '2023-06-15 10:30:00')", 166),
    ("HOUR(TIMESTAMP '2023-06-15 10:30:00')", 10),
    ("MINUTE(TIMESTAMP '2023-06-15 10:30:00')", 30),
    ("SECOND(TIMESTAMP '2023-06-15 10:30:45')", 45),
    # WeekFields.ISO.weekOfYear + 1 (DateTimeFunction.java:537-545)
    ("WEEK(TIMESTAMP '2023-06-15 10:30:00')", 25),
    ("WEEK(DATE '2021-04-08')", 15),       # func_datetime.conf:c4_10
    ("WEEK(DATE '2021-01-01')", 1),        # week-0 day -> Zeta 1
    ("EXTRACT(DAY FROM TIMESTAMP '2023-06-15 10:30:00')", 15),
    ("FORMATDATETIME(TIMESTAMP '2023-06-15 10:30:00', 'yyyy-MM-dd')", "2023-06-15"),
    # Format sniffing (ZetaSQLType.java:459-471): "yy" without "mm"
    # (minutes) -> DATE, with "mm" -> DATETIME.
    ("CAST(PARSEDATETIME('2023-06-15', 'yyyy-MM-dd') AS STRING)", "2023-06-15"),
    ("CAST(PARSEDATETIME('2023-06-15 10:30:00', 'yyyy-MM-dd HH:mm:ss') AS STRING)",
     "2023-06-15 10:30:00"),
    # Zeta DATEDIFF(a, b[, unit]) = b - a (Duration.between,
    # DateTimeFunction.java:143-215) — note the sign.
    ("DATEDIFF(DATE '2023-06-15', DATE '2023-06-10')", -5),
    ("DATEDIFF(DATE '2023-06-10', DATE '2023-06-15')", 5),
    ("DATEDIFF(TIMESTAMP '2023-06-10 23:00:00', TIMESTAMP '2023-06-11 01:00:00')", 1),
    ("DATEDIFF(TIMESTAMP '2023-06-10 23:00:00', TIMESTAMP '2023-06-11 01:00:00', 'DAYTIME')", 0),
    ("DATEDIFF(DATE '2021-01-15', DATE '2023-06-20', 'YEAR')", 2),
    # MONTH returns the Period *component* (months beyond whole years)
    ("DATEDIFF(DATE '2021-01-15', DATE '2023-06-20', 'MONTH')", 5),
    ("DATEDIFF(TIMESTAMP '2023-06-15 08:00:00', TIMESTAMP '2023-06-15 11:30:00', 'HOUR')", 3),
    # unit-first H2/Spark spelling also accepted
    ("DATEDIFF('DAY', DATE '2023-06-10', DATE '2023-06-15')", 5),
    # Zeta DATEADD(ts, n, 'unit'): datetime first, unit last; 2-arg
    # defaults to DAY (func_datetime.conf:53 `dateadd(c1, 1)`)
    ("CAST(CAST(DATEADD(DATE '2023-06-15', 1) AS DATE) AS STRING)", "2023-06-16"),
    ("CAST(DATEADD(TIMESTAMP '2023-06-15 10:00:00', 40, 'DAY') AS STRING)",
     "2023-07-25 10:00:00"),
    ("CAST(DATEADD(TIMESTAMP '2023-06-15 10:00:00', 2, 'YEAR') AS STRING)",
     "2025-06-15 10:00:00"),
    ("CAST(DATEADD(TIMESTAMP '2023-06-15 10:00:00', 13, 'HOUR') AS STRING)",
     "2023-06-15 23:00:00"),
    ("CAST(TIMESTAMPADD(TIMESTAMP '2023-06-15 10:00:00', 30, 'SECOND') AS STRING)",
     "2023-06-15 10:00:30"),
    # unit-first Spark spelling passes through
    ("CAST(TIMESTAMPADD(HOUR, 2, TIMESTAMP '2023-06-15 10:00:00') AS STRING)",
     "2023-06-15 12:00:00"),
    ("CAST(TRUNC(3.79, 1) AS DOUBLE)", 3.7),
    # Spark's date-form TRUNC stays native
    ("CAST(TRUNC(DATE '2023-06-15', 'MM') AS STRING)", "2023-06-01"),
    ("CAST(DATE_TRUNC('month', TIMESTAMP '2023-06-15 10:30:00') AS STRING)",
     "2023-06-01 00:00:00"),
    # Zeta DATE_TRUNC(ts, 'UNIT') — reversed args (func_datetime.conf:53)
    ("CAST(DATE_TRUNC(TIMESTAMP '2023-06-15 10:30:00', 'MONTH') AS STRING)",
     "2023-06-01 00:00:00"),
    ("DAYNAME(DATE '2023-06-15')", "Thursday"),
    ("MONTHNAME(DATE '2023-06-15')", "June"),
    ("IS_DATE('2023-06-15', 'yyyy-MM-dd')", True),
    ("IS_DATE('not-a-date', 'yyyy-MM-dd')", False),
    # Zeta EXTRACT fields Spark lacks (func_datetime.conf:53)
    ("EXTRACT(MILLISECOND FROM TIMESTAMP '2023-06-15 10:30:45.123')", 123),
    ("EXTRACT(DAYOFYEAR FROM TIMESTAMP '2023-06-15 10:30:00')", 166),
    ("EXTRACT(DAYOFWEEK FROM TIMESTAMP '2023-06-15 10:30:00')", 4),  # ISO
    # Zeta SECOND extract is an integer, not Spark's decimal seconds
    ("EXTRACT(SECOND FROM TIMESTAMP '2023-06-15 10:30:45.999')", 45),
]

CONDITIONAL_CASES = [
    ("COALESCE(NULL, 'b')", "b"),
    ("IFNULL(NULL, 'x')", "x"),
    ("NULLIF('a', 'a')", None),
    ("CASE WHEN 1 > 0 THEN 'yes' ELSE 'no' END", "yes"),
    ("CAST('42' AS INT)", 42),
    ("CAST(123 AS VARCHAR)", "123"),
]


@pytest.mark.parametrize("expr,expected", STRING_CASES,
                         ids=[c[0][:30] for c in STRING_CASES])
def test_string_functions(spark, expr, expected):
    assert _sql1(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", NUMERIC_CASES,
                         ids=[c[0][:30] for c in NUMERIC_CASES])
def test_numeric_functions(spark, expr, expected):
    got = _sql1(spark, expr)
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected


@pytest.mark.parametrize("expr,expected", DATETIME_CASES,
                         ids=[c[0][:40] for c in DATETIME_CASES])
def test_datetime_functions(spark, expr, expected):
    assert _sql1(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", CONDITIONAL_CASES,
                         ids=[c[0][:30] for c in CONDITIONAL_CASES])
def test_conditional_functions(spark, expr, expected):
    assert _sql1(spark, expr) == expected


def test_hextoraw_roundtrip(spark):
    # H2-legacy: 4 hex digits -> one char (StringFunction.java:132-148)
    assert _sql1(spark, "HEXTORAW('0041')") == "A"
    assert _sql1(spark, "HEXTORAW(RAWTOHEX('Hello'))") == "Hello"


def test_uuid_shape(spark):
    v = _sql1(spark, "UUID()")
    assert len(v) == 36 and v.count("-") == 4


def test_lateral_view_explode(spark):
    """The one flatMap construct Zeta supports (LATERAL VIEW EXPLODE,
    ZetaSQLEngine.java:218-258)."""
    df = spark.createDataFrame([(1, "a;b;c")], ["id", "s"])
    out = get_transform(
        "Sql",
        {"plugin_input": "lv_in",
         "query": "SELECT id, item FROM lv_in "
                  "LATERAL VIEW EXPLODE(SPLIT(s, ';')) t AS item"},
    ).apply(df)
    assert [r["item"] for r in out.collect()] == ["a", "b", "c"]


def test_udf_spi(spark):
    """ZetaUDF SPI analog (sql-udf.md): register a scalar by name, call
    it from a Sql transform."""
    from seatunnel_spark.functions import register_zeta_udf

    register_zeta_udf("MY_SUFFIX", lambda s: None if s is None else s + "_x", "string")
    assert _sql1(spark, "MY_SUFFIX('abc')") == "abc_x"
    # the shipped example UDF (docs example output shape)
    assert _sql1(spark, "EXAMPLE('x')") == "UDF: x"


# -- zeta_compat: exact dialect parity for the 3 documented deviations --
# golden vectors computed per ZetaSQLFunction.executeBinaryExpr:601-683
# (Java int/long division, BigDecimal RoundingMode.UP at
# ZetaSQLType:229-244's max-scale result type) and the DATEADD
# result-has-arg0's-type rule (ZetaSQLType:478-485).

def _compat(spark, df, q):
    t = get_transform("Sql", {"query": q, "zeta_compat": "true",
                              "plugin_input": "t"})
    out = t.apply(df)
    return out.collect()[0], dict(out.dtypes)


def test_zeta_compat_integer_division(spark):
    df = spark.createDataFrame([(7, 2, -7, 9000000000)],
                               "a int, b int, neg int, c bigint")
    r, types = _compat(spark, df, "SELECT a / b AS x FROM t")
    assert r["x"] == 3 and types["x"] == "int"     # Java 7/2 == 3
    r, types = _compat(spark, df, "SELECT neg / b AS x FROM t")
    assert r["x"] == -3 and types["x"] == "int"    # Java -7/2 == -3
    r, types = _compat(spark, df, "SELECT c / b AS x FROM t")
    assert r["x"] == 4500000000 and types["x"] == "bigint"
    # left-assoc chain types like Zeta: (a*a)/b stays INT
    r, types = _compat(spark, df, "SELECT a * a / b AS x FROM t")
    assert r["x"] == 24 and types["x"] == "int"
    # without the flag, Spark fractional semantics are untouched
    t = get_transform("Sql", {"query": "SELECT a / b AS x FROM t",
                              "plugin_input": "t"})
    assert t.apply(df).collect()[0]["x"] == 3.5


def test_zeta_compat_decimal_division_rounds_up(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("10.00"), Decimal("3.000"), Decimal("-10.00"))],
        "d decimal(10,2), e decimal(8,3), nd decimal(10,2)")
    # result scale = max(2,3) = 3; 10/3 = 3.3333.. -> UP -> 3.334
    r, types = _compat(spark, df, "SELECT d / e AS x FROM t")
    assert r["x"] == Decimal("3.334") and types["x"].startswith("decimal")
    # UP is away from zero: -3.3333.. -> -3.334 (HALF_EVEN gives -3.333)
    r, _ = _compat(spark, df, "SELECT nd / e AS x FROM t")
    assert r["x"] == Decimal("-3.334")
    # decimal / int keeps the decimal's own scale: 10.00/3 -> 3.34
    r, _ = _compat(spark, df, "SELECT d / 3 AS x FROM t")
    assert r["x"] == Decimal("3.34")


def test_zeta_compat_dateadd_date_returns_date(spark):
    import datetime

    df = spark.sql("SELECT DATE'2020-01-10' AS dcol, "
                   "TIMESTAMP'2020-01-10 05:00:00' AS tcol")
    r, types = _compat(
        spark, df, "SELECT DATEADD(dcol, 5, 'DAY') AS x, "
                   "DATEADD(tcol, 5, 'DAY') AS y FROM t")
    assert types["x"] == "date" and r["x"] == datetime.date(2020, 1, 15)
    assert types["y"] == "timestamp"
    assert r["y"] == datetime.datetime(2020, 1, 15, 5, 0)
