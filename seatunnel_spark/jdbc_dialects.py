"""JDBC dialect registry — reference connector-jdbc parity.

Reference: connector-jdbc/.../internal/dialect/ (one package per
dialect: mysql, psql, oracle, sqlserver, db2, dm, gbase8a, greenplum,
highgo, hive, inceptor, iris, kingbase, oceanbase, opengauss, phoenix,
psqllow, redshift, saphana, snowflake, sqlite, starrocks, tablestore,
teradata, vertica, xugu + GenericDialect). Each reference dialect
supplies: identifier quoting, the driver class, and an optional
native-upsert statement (JdbcDialect.java:109-183;
OracleDialect.getUpsertStatement:110-165 uses MERGE INTO ... USING
(SELECT :f FROM DUAL); MySqlDialect uses INSERT ... ON DUPLICATE KEY
UPDATE; PostgresDialect uses INSERT ... ON CONFLICT DO UPDATE).

Spark mapping: reads/writes go through spark.read/write.jdbc — the
dialect only has to supply the driver class, quoting, and the upsert
statement template executed by the changelog-apply sink
(seatunnel_spark.sinks.jdbc). SQL generation is pure and unit-tested;
connections require the driver jar at deploy time.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class JdbcDialect:
    name: str
    url_prefixes: tuple[str, ...]
    driver: str
    quote_char: str = '"'
    # 'on_duplicate' (MySQL family) | 'on_conflict' (PG family) |
    # 'merge_dual' (Oracle family: USING (SELECT ... FROM DUAL)) |
    # 'merge_values' (SQLServer family: USING (VALUES (...))) |
    # 'insert_or_replace' (SQLite) | None (no native upsert ->
    # insert-miss/update-hit pair, JdbcDialect.java:166-207)
    upsert_style: str | None = None
    aliases: tuple[str, ...] = field(default=())

    def quote(self, ident: str) -> str:
        q = self.quote_char
        return f"{q}{ident}{q}"

    def table_identifier(self, table: str) -> str:
        # Already-qualified names pass through quoted per part.
        return ".".join(self.quote(p) for p in table.split("."))

    # -- statement generation (JDBC '?' placeholders, column order = cols)

    def insert_sql(self, table: str, cols: list[str]) -> str:
        names = ", ".join(self.quote(c) for c in cols)
        binds = ", ".join(["?"] * len(cols))
        return f"INSERT INTO {self.table_identifier(table)} ({names}) VALUES ({binds})"

    def update_sql(self, table: str, cols: list[str], keys: list[str]) -> str:
        sets = ", ".join(f"{self.quote(c)} = ?" for c in cols if c not in keys)
        cond = " AND ".join(f"{self.quote(k)} = ?" for k in keys)
        return f"UPDATE {self.table_identifier(table)} SET {sets} WHERE {cond}"

    def delete_sql(self, table: str, keys: list[str]) -> str:
        cond = " AND ".join(f"{self.quote(k)} = ?" for k in keys)
        return f"DELETE FROM {self.table_identifier(table)} WHERE {cond}"

    def upsert_sql(self, table: str, cols: list[str], keys: list[str]) -> str | None:
        """Native single-statement upsert, or None when the dialect has
        none (caller falls back to update-then-insert, the reference's
        JdbcOutputFormatBuilder non-upsert path)."""
        t = self.table_identifier(table)
        names = ", ".join(self.quote(c) for c in cols)
        binds = ", ".join(["?"] * len(cols))
        non_keys = [c for c in cols if c not in keys]
        if self.upsert_style == "on_duplicate":
            sets = ", ".join(f"{self.quote(c)} = VALUES({self.quote(c)})" for c in non_keys)
            return f"INSERT INTO {t} ({names}) VALUES ({binds}) ON DUPLICATE KEY UPDATE {sets}"
        if self.upsert_style == "on_conflict":
            conflict = ", ".join(self.quote(k) for k in keys)
            sets = ", ".join(f"{self.quote(c)} = EXCLUDED.{self.quote(c)}" for c in non_keys)
            return (f"INSERT INTO {t} ({names}) VALUES ({binds}) "
                    f"ON CONFLICT ({conflict}) DO UPDATE SET {sets}")
        if self.upsert_style == "insert_or_replace":
            return f"INSERT OR REPLACE INTO {t} ({names}) VALUES ({binds})"
        if self.upsert_style in ("merge_dual", "merge_values"):
            src_cols = ", ".join(f"? AS {self.quote(c)}" for c in cols)
            using = (f"SELECT {src_cols} FROM DUAL" if self.upsert_style == "merge_dual"
                     else f"VALUES ({binds})")
            src_alias = ("SOURCE" if self.upsert_style == "merge_dual"
                         else f"SOURCE ({names})")
            on = " AND ".join(
                f"TARGET.{self.quote(k)} = SOURCE.{self.quote(k)}" for k in keys
            )
            sets = ", ".join(
                f"TARGET.{self.quote(c)} = SOURCE.{self.quote(c)}" for c in non_keys
            )
            ins_vals = ", ".join(f"SOURCE.{self.quote(c)}" for c in cols)
            tail = ";" if self.upsert_style == "merge_values" else ""
            return (f"MERGE INTO {t} TARGET USING ({using}) {src_alias} ON ({on}) "
                    f"WHEN MATCHED THEN UPDATE SET {sets} "
                    f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({ins_vals}){tail}")
        return None


_D = JdbcDialect
DIALECTS: list[JdbcDialect] = [
    _D("mysql", ("jdbc:mysql",), "com.mysql.cj.jdbc.Driver", "`", "on_duplicate",
       aliases=("tidb",)),
    _D("postgresql", ("jdbc:postgresql",), "org.postgresql.Driver", '"', "on_conflict",
       aliases=("psql", "psqllow")),
    _D("oracle", ("jdbc:oracle",), "oracle.jdbc.OracleDriver", '"', "merge_dual"),
    _D("sqlserver", ("jdbc:sqlserver",), "com.microsoft.sqlserver.jdbc.SQLServerDriver",
       '"', "merge_values"),
    _D("db2", ("jdbc:db2",), "com.ibm.db2.jcc.DB2Driver", '"', "merge_values"),
    _D("dm", ("jdbc:dm",), "dm.jdbc.driver.DmDriver", '"', "merge_dual"),
    _D("gbase8a", ("jdbc:gbase",), "com.gbase.jdbc.Driver", "`", "on_duplicate"),
    _D("greenplum", ("jdbc:greenplum",), "org.postgresql.Driver", '"', None),
    _D("highgo", ("jdbc:highgo",), "com.highgo.jdbc.Driver", '"', "on_conflict"),
    _D("hive", ("jdbc:hive2",), "org.apache.hive.jdbc.HiveDriver", "`", None,
       aliases=("inceptor",)),
    _D("iris", ("jdbc:IRIS", "jdbc:iris"), "com.intersystems.jdbc.IRISDriver", '"', None),
    _D("kingbase", ("jdbc:kingbase8",), "com.kingbase8.Driver", '"', "on_conflict"),
    _D("oceanbase", ("jdbc:oceanbase",), "com.oceanbase.jdbc.Driver", "`", "on_duplicate"),
    _D("opengauss", ("jdbc:opengauss",), "org.opengauss.Driver", '"', "on_conflict"),
    _D("phoenix", ("jdbc:phoenix",), "org.apache.phoenix.queryserver.client.Driver",
       '"', None),
    _D("redshift", ("jdbc:redshift",), "com.amazon.redshift.jdbc.Driver", '"', None),
    _D("saphana", ("jdbc:sap",), "com.sap.db.jdbc.Driver", '"', "merge_dual"),
    _D("snowflake", ("jdbc:snowflake",), "net.snowflake.client.jdbc.SnowflakeDriver",
       '"', "merge_values"),
    _D("sqlite", ("jdbc:sqlite",), "org.sqlite.JDBC", '"', "insert_or_replace"),
    _D("starrocks", ("jdbc:starrocks",), "com.mysql.cj.jdbc.Driver", "`", "on_duplicate"),
    _D("tablestore", ("jdbc:ots",), "com.alicloud.openservices.tablestore.jdbc.OTSDriver",
       "`", None),
    _D("teradata", ("jdbc:teradata",), "com.teradata.jdbc.TeraDriver", '"', "merge_values"),
    _D("vertica", ("jdbc:vertica",), "com.vertica.jdbc.Driver", '"', "merge_values"),
    _D("xugu", ("jdbc:xugu",), "com.xugu.cloudjdbc.Driver", '"', "merge_dual"),
    _D("clickhouse", ("jdbc:clickhouse", "jdbc:ch"), "com.clickhouse.jdbc.ClickHouseDriver",
       "`", None),
    _D("doris", ("jdbc:doris",), "com.mysql.cj.jdbc.Driver", "`", "on_duplicate"),
    _D("generic", (), "", '"', None),
]

_BY_NAME = {}
for d in DIALECTS:
    _BY_NAME[d.name] = d
    for a in d.aliases:
        _BY_NAME[a] = d


def dialect_for(url: str | None = None, name: str | None = None) -> JdbcDialect:
    """Resolve by explicit compatible-mode name first (the reference's
    `compatible_mode` option), then by URL prefix, else generic."""
    if name:
        d = _BY_NAME.get(name.lower())
        if d:
            return d
    if url:
        for d in DIALECTS:
            for p in d.url_prefixes:
                if url.startswith(p):
                    return d
    return _BY_NAME["generic"]


__all__ = ["JdbcDialect", "DIALECTS", "dialect_for"]
