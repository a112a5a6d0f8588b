"""Dialect registry parity tests (reference: connector-jdbc/.../internal/
dialect/ — one package per dialect; upsert shapes per MySqlDialect /
PostgresDialect / OracleDialect.getUpsertStatement:110-165)."""

from seatunnel_spark.jdbc_dialects import DIALECTS, dialect_for

REFERENCE_DIALECT_PACKAGES = [
    "db2", "dm", "gbase8a", "greenplum", "highgo", "hive", "inceptor",
    "iris", "kingbase", "mysql", "oceanbase", "opengauss", "oracle",
    "phoenix", "psql", "psqllow", "redshift", "saphana", "snowflake",
    "sqlite", "sqlserver", "starrocks", "tablestore", "teradata",
    "vertica", "xugu",
]


def test_every_reference_dialect_resolves():
    for name in REFERENCE_DIALECT_PACKAGES:
        d = dialect_for(name=name)
        assert d.name != "generic", f"dialect {name} fell back to generic"


def test_url_resolution():
    assert dialect_for("jdbc:mysql://h/db").name == "mysql"
    assert dialect_for("jdbc:postgresql://h/db").name == "postgresql"
    assert dialect_for("jdbc:oracle:thin:@h:1521:orcl").name == "oracle"
    assert dialect_for("jdbc:sqlserver://h;db=x").name == "sqlserver"
    assert dialect_for("jdbc:unknown://x").name == "generic"
    # explicit compatible_mode wins over URL
    assert dialect_for("jdbc:mysql://h/db", "starrocks").name == "starrocks"


def test_mysql_upsert_shape():
    sql = dialect_for(name="mysql").upsert_sql("t", ["id", "v"], ["id"])
    assert sql == ("INSERT INTO `t` (`id`, `v`) VALUES (?, ?) "
                   "ON DUPLICATE KEY UPDATE `v` = VALUES(`v`)")


def test_postgres_upsert_shape():
    sql = dialect_for(name="psql").upsert_sql("s.t", ["id", "v"], ["id"])
    assert sql == ('INSERT INTO "s"."t" ("id", "v") VALUES (?, ?) '
                   'ON CONFLICT ("id") DO UPDATE SET "v" = EXCLUDED."v"')


def test_oracle_merge_shape():
    sql = dialect_for(name="oracle").upsert_sql("t", ["id", "v"], ["id"])
    assert sql.startswith('MERGE INTO "t" TARGET USING (SELECT ? AS "id", ? AS "v" FROM DUAL)')
    assert 'ON (TARGET."id" = SOURCE."id")' in sql
    assert 'WHEN MATCHED THEN UPDATE SET TARGET."v" = SOURCE."v"' in sql
    assert 'WHEN NOT MATCHED THEN INSERT ("id", "v") VALUES (SOURCE."id", SOURCE."v")' in sql


def test_sqlserver_merge_uses_values():
    sql = dialect_for(name="sqlserver").upsert_sql("t", ["id", "v"], ["id"])
    assert 'USING (VALUES (?, ?)) SOURCE ("id", "v")' in sql
    assert sql.endswith(";")


def test_no_native_upsert_dialects_return_none():
    for name in ("hive", "clickhouse", "redshift", "greenplum", "phoenix"):
        assert dialect_for(name=name).upsert_sql("t", ["id", "v"], ["id"]) is None


def test_update_insert_delete_fallback_pair():
    d = dialect_for(name="redshift")
    assert d.update_sql("t", ["id", "v"], ["id"]) == 'UPDATE "t" SET "v" = ? WHERE "id" = ?'
    assert d.insert_sql("t", ["id", "v"]) == 'INSERT INTO "t" ("id", "v") VALUES (?, ?)'
    assert d.delete_sql("t", ["id"]) == 'DELETE FROM "t" WHERE "id" = ?'


def test_drivers_nonempty_for_all_but_generic():
    for d in DIALECTS:
        if d.name != "generic":
            assert d.driver, d.name
