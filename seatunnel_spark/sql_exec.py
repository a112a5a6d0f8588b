"""Stdlib SQL execution for JDBC-family URLs without a JVM driver.

Routes `jdbc:postgresql://` / `jdbc:redshift://` / `jdbc:greenplum:`
URLs to the pg wire client and `jdbc:mysql://` / `jdbc:mariadb://` /
`jdbc:oceanbase://` plus the Doris/StarRocks FE ports to the MySQL
wire client, rendering JDBC `?` placeholders as SQL literals. This is
the execution backend the JDBC sink's upsert/changelog path and the
exactly-once 2PC path use when no JVM driver jar is present — the
reference always has a driver on the classpath
(connector-jdbc/.../JdbcConnectionProvider); this module is the
sandbox/production fallback that keeps the same statement shapes.
"""

from __future__ import annotations

import datetime
import decimal

_PG_PREFIXES = ("jdbc:postgresql:", "jdbc:redshift:", "jdbc:greenplum:",
                "jdbc:opengauss:", "jdbc:kingbase8:", "jdbc:highgo:")
_MYSQL_PREFIXES = ("jdbc:mysql:", "jdbc:mariadb:", "jdbc:oceanbase:",
                   # GBase 8a speaks the MySQL client protocol (its
                   # JDBC driver is Connector/J-derived — the conf's
                   # useUnicode/rewriteBatchedStatements options are
                   # Connector/J's; dialect quoting/upsert match)
                   "jdbc:gbase:")
_MSSQL_PREFIXES = ("jdbc:sqlserver:",)
_HIVE_PREFIXES = ("jdbc:hive2:",)
_AVATICA_PREFIXES = ("jdbc:phoenix:thin:",)
_SNOWFLAKE_PREFIXES = ("jdbc:snowflake:",)
_DRDA_PREFIXES = ("jdbc:db2:",)
_VERTICA_PREFIXES = ("jdbc:vertica:",)
_HANA_PREFIXES = ("jdbc:sap:",)


def wire_family(url: str) -> str | None:
    u = url.lower()
    if u.startswith(_PG_PREFIXES):
        return "pg"
    if u.startswith(_MYSQL_PREFIXES):
        return "mysql"
    if u.startswith(_MSSQL_PREFIXES):
        return "mssql"
    if u.startswith(_HIVE_PREFIXES):
        return "hive"
    if u.startswith(_AVATICA_PREFIXES):
        return "avatica"
    if u.startswith(_SNOWFLAKE_PREFIXES):
        return "snowflake"
    if u.startswith(_DRDA_PREFIXES):
        return "drda"
    if u.startswith(_VERTICA_PREFIXES):
        # Vertica speaks the pg-v3-derivative native protocol
        # (version 3.5 startup; VerticaClient)
        return "pg"
    if u.startswith(_HANA_PREFIXES):
        return "hana"
    return None


def sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return "'\\x" + bytes(v).hex() + "'"
    if isinstance(v, datetime.datetime):
        return f"'{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, (datetime.date, datetime.time)):
        return f"'{v}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def bind(sql: str, params: list) -> str:
    """Render JDBC '?' placeholders as literals (left-to-right;
    question marks inside string literals are not supported in the
    generated dialect statements)."""
    parts = sql.split("?")
    if len(parts) - 1 != len(params):
        raise ValueError(f"bind: {len(parts) - 1} placeholders, "
                         f"{len(params)} params")
    out = [parts[0]]
    for lit, rest in zip(map(sql_literal, params), parts[1:]):
        out.append(lit)
        out.append(rest)
    return "".join(out)


class WireExecutor:
    """Uniform execute/query over PgClient or MySqlClient."""

    def __init__(self, url: str, user: str, password: str):
        fam = wire_family(url)
        if fam is None:
            raise ValueError(f"no stdlib wire client for {url!r}")
        self.family = fam
        if fam == "pg":
            from seatunnel_spark.pg_wire import PgClient, VerticaClient

            cls = VerticaClient if url.lower().startswith(
                _VERTICA_PREFIXES) else PgClient
            self.cl = cls.from_jdbc_url(url, user, password)
        elif fam == "mssql":
            from seatunnel_spark.tds_wire import TdsClient

            # host aliasing happens inside TdsClient (same as MySqlClient)
            self.cl = TdsClient.from_jdbc_url(url, user, password)
        elif fam == "hive":
            from seatunnel_spark.hive_thrift import HiveThriftClient

            self.cl = HiveThriftClient.from_jdbc_url(url, user, password)
        elif fam == "avatica":
            from seatunnel_spark.avatica import AvaticaClient

            self.cl = AvaticaClient.from_jdbc_url(url)
        elif fam == "snowflake":
            from seatunnel_spark.snowflake_rest import SnowflakeRestClient

            self.cl = SnowflakeRestClient.from_jdbc_url(url, user,
                                                        password)
        elif fam == "drda":
            from seatunnel_spark.drda_wire import DrdaClient

            self.cl = DrdaClient.from_jdbc_url(url, user, password)
        elif fam == "hana":
            from seatunnel_spark.hana_wire import HanaClient

            self.cl = HanaClient.from_jdbc_url(url, user, password)
        else:
            from seatunnel_spark.mysql_wire import MySqlClient

            rest = url.split("://", 1)[1]
            hostport, _, db = rest.partition("/")
            host, _, port = hostport.partition(":")
            self.cl = MySqlClient(host, int(port or 3306), user, password,
                                  db.split("?")[0])

    def execute(self, sql: str) -> None:
        self.cl.execute(sql)

    def execute_batch(self, statements: list[str]) -> None:
        if not statements:
            return
        if self.family == "pg":
            # the pg simple-query protocol runs a multi-statement
            # string in one round trip (implicit transaction)
            self.cl.execute(";".join(statements))
        else:
            for s in statements:
                self.cl.execute(s)

    def query(self, sql: str):
        return self.cl.query(sql)

    def close(self) -> None:
        self.cl.close()


__all__ = ["WireExecutor", "wire_family", "bind", "sql_literal"]
