"""JDBC sink — savemode DDL + append/upsert/changelog-apply + XA 2PC.

Reference: connector-jdbc sink with generate_sink_sql/primary_keys
(docs/en/connector-v2/sink/Jdbc.md), SchemaSaveMode × DataSaveMode
(DefaultSaveModeHandler.java), the "cdc sink" feature = apply RowKind
by primary key (connector-v2-features.md:57-75), and exactly-once via
XA transactions (is_exactly_once, XaFacadeImplAutoLoad.java — XA
START/END/PREPARE per writer, coordinator-side COMMIT PREPARED).

Spark-native:
  * plain append/overwrite -> df.write.jdbc (JVM driver); when no
    driver jar is present, pg/mysql-family URLs fall back to the
    stdlib wire clients (sql_exec.WireExecutor) with the same
    dialect-generated statements.
  * changelog apply (__row_kind present + primary_keys set) -> reduce
    the changelog to final-state rows per key (last +U/+I wins, -D
    deletes) with a window over a monotonic sequence, then MERGE-style
    upsert via foreachPartition batched statements. The reduction is
    distributed; only the final per-key state hits the database.
  * is_exactly_once -> two-phase commit: every partition INSERTs
    inside a transaction and PREPAREs it (pg: PREPARE TRANSACTION;
    mysql: XA START/END/PREPARE); the driver commits every prepared
    branch only after ALL partitions prepared — the XaFacade contract
    (atomic multi-writer commit, not just idempotent replay).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, functions as F, Window

from seatunnel_spark.sinks.base import Sink
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


def _jvm_driver_available(spark, driver) -> bool:
    """True when the conf-declared JDBC driver class is actually
    loadable in the JVM — a declared-but-absent driver (no jars here)
    must route to the wire client, not crash df.write.jdbc."""
    if not driver:
        return False
    try:
        spark._jvm.java.lang.Class.forName(str(driver))
        return True
    except Exception:  # noqa: BLE001 - py4j raises Py4JJavaError
        return False


CHANGELOG_META = (ROW_KIND_COL, TABLE_ID_COL, "__offset", "__event_ts")


def _probe_sql(fam: str, table: str) -> str:
    """Zero-row existence/schema probe in the family's LIMIT dialect
    (shared by schema-sync, SaveMode exists(), and data checks)."""
    if fam == "mssql":
        return f"SELECT TOP 0 * FROM {table}"
    if fam in ("pg", "drda"):  # db2 has no LIMIT
        return f"SELECT * FROM {table} WHERE 1=0"
    return f"SELECT * FROM {table} LIMIT 0"


def _limit1_sql(fam: str, table: str) -> str:
    if fam == "mssql":
        return f"SELECT TOP 1 * FROM {table}"
    if fam == "drda":
        return f"SELECT * FROM {table} FETCH FIRST 1 ROWS ONLY"
    return f"SELECT * FROM {table} LIMIT 1"


def _positional_sql(sql: str, columns) -> tuple[str, list[str]]:
    """Named `:param` placeholders -> '?' plus their bind order; plain
    '?' statements bind the given column order."""
    import re

    names = re.findall(r"(?<![:\w]):([A-Za-z_]\w*)", sql)
    if names:
        return re.sub(r"(?<![:\w]):([A-Za-z_]\w*)", "?", sql), names
    return sql, list(columns)


def last_event_per_key(df: DataFrame, keys: list[str]) -> DataFrame:
    """Deterministic last event per key of a +I/-U/+U/-D changelog.

    Shared ordering for EVERY per-key-winner computation (batch
    compaction and the streaming delete set — a sink must never compute
    winners two different ways, or a +I/-D pair split across partitions
    can land in both the upsert and delete sets with layout-dependent
    final state).

    Determinism: order comes from the feed's own `__offset` position
    when the frame carries one; otherwise events tie and a pure
    content-based chain (kind rank, content hash) picks a reproducible
    winner — never monotonically_increasing_id, whose value depends on
    partition layout. -U rows are stripped (they only retract a prior
    image; the paired +U/-D carries the outcome).

    Returns the winning rows with ROW_KIND_COL and data columns intact;
    internal __seq/__rank/__tie/__rn columns are dropped.
    """
    seq = F.col("__offset") if "__offset" in df.columns else F.lit(0)
    rank = F.when(F.col(ROW_KIND_COL) == "-U", 0).otherwise(1)
    data_cols = [c for c in df.columns if c not in CHANGELOG_META]
    tie = F.xxhash64(F.struct(*[
        F.to_json(F.struct(F.col(c)))
        if dict(df.dtypes)[c].startswith("map") else F.col(c)
        for c in data_cols]))
    w = Window.partitionBy(*keys).orderBy(
        F.col("__seq").desc(), F.col("__rank").desc(),
        F.col("__tie").desc(), F.col(ROW_KIND_COL).desc())
    return (
        df.withColumn("__seq", seq)
        .withColumn("__rank", rank)
        .withColumn("__tie", tie)
        .filter(F.col(ROW_KIND_COL) != "-U")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__seq", "__rank", "__tie", "__rn")
    )


def compact_changelog(df: DataFrame, keys: list[str]) -> DataFrame:
    """Reduce a +I/-U/+U/-D changelog to final state per key.

    Keeps the LAST event per key (last_event_per_key ordering); drops
    keys whose last event is a delete; strips -U rows. This is the
    batch analog of the reference's cdc-sink apply loop — but as a
    single shuffle + window instead of per-row database round-trips.
    The position/meta columns never reach the output columns (they'd
    leak into INSERT column lists).
    """
    if ROW_KIND_COL not in df.columns:
        return df.drop(*[c for c in ("__offset", "__event_ts")
                         if c in df.columns])
    data_cols = [c for c in df.columns if c not in CHANGELOG_META]
    return (
        last_event_per_key(df, keys)
        .filter(F.col(ROW_KIND_COL) != "-D")
        .select(*data_cols)
    )


class JdbcSink(Sink):
    NAME = "Jdbc"
    WANTS_CHANGELOG_META = True  # compactor orders by __offset

    def wants_observation(self) -> bool:
        # every write path here drives foreachPartition — an RDD-level
        # action that never emits the SQL-execution event Observation
        # listens for, so an engine-wrapped observe would block forever
        return False

    def write(self, df: DataFrame) -> None:
        from seatunnel_spark.net import resolve_jdbc_url

        groups = getattr(self, "table_groups", None)
        if groups:
            # multi-table CDC fan-out: one sub-writer per source table,
            # ${table_name}/${database_name}/${primary_key} resolved
            # per table (the reference's MultiTableSink + placeholders)
            src_keys = getattr(self, "source_keys", None)
            for tid, tdf in groups.items():
                sub = JdbcSink(self.options)
                sub.plugin_name = self.plugin_name
                sub.input_name = tid
                if isinstance(src_keys, dict):
                    sub.source_keys = src_keys.get(tid) or src_keys.get(
                        tid.split(".")[-1])
                else:
                    sub.source_keys = src_keys
                sub.source_ddl = getattr(self, "source_ddl", None)
                sub.write(tdf)
            return
        url = resolve_jdbc_url(self.require("url"))
        sink_sql = self.opt("query")
        if sink_sql and not (self.opt("generate_sink_sql")
                             and (self.opt("table")
                                  or self.opt("table_path"))):
            # explicit DML statement (the reference's plain
            # JdbcOutputFormat shape: `query = "insert into sink (...)
            # values (?, ...)"`, or :name named parameters —
            # jdbc_sink_name_parameter_sql.conf). Positional '?' binds
            # the frame's column order: the conf's insert column list
            # mirrors its select list.
            user = str(self.opt("user", ""))
            password = str(self.opt("password", ""))
            body = df.drop(*[c for c in (TABLE_ID_COL, ROW_KIND_COL,
                                         "__offset", "__event_ts")
                             if c in df.columns])
            sql, param_cols = _positional_sql(str(sink_sql),
                                              body.columns)
            if bool(self.opt("is_exactly_once", False)):
                self._write_2pc(body.select(*param_cols), url, "",
                                user, password, sql=sql)
            else:
                self._wire_exec(body, url, sql, user, password,
                                param_cols)
            return
        tid_parts = str(getattr(self, "input_name", None)
                        or "default").split(".")
        table_opt = self.opt("table") or self.opt("table_path")
        if not table_opt and (self.opt("tablePrefix")
                              or self.opt("tableSuffix")
                              or self.opt("schema")):
            # schema + tablePrefix/tableSuffix build the sink path from
            # the SOURCE table name (JdbcSinkConfig's multi-table
            # table-path derivation; pgcdc multi-table-mode confs)
            sch = str(self.opt("schema") or "")
            table_opt = ((sch + ".") if sch else "") \
                + str(self.opt("tablePrefix") or "") + tid_parts[-1] \
                + str(self.opt("tableSuffix") or "")
        table = str(table_opt or self.require("table_path"))
        if "${table_name}" in table:
            table = table.replace("${table_name}", tid_parts[-1])
        if "${database_name}" in table:
            table = table.replace(
                "${database_name}",
                tid_parts[-2] if len(tid_parts) > 1 else "default")
        from seatunnel_spark.sql_exec import wire_family as _wf

        db_opt = self.opt("database")
        fam = _wf(url)
        if db_opt and not table.startswith(f"{db_opt}.") \
                and fam != "pg" \
                and (fam in ("mssql", "mysql") or "." not in table):
            # JdbcSinkConfig composes TablePath as database.table — the
            # write must target the declared database even when the URL
            # omits it (sqlservercdc_to_sqlserver: url has no
            # databaseName, sink declares database + dbo.table).
            # Postgres-family excluded: PG has no cross-database
            # qualification — there the database rides the connection.
            # Families without three-part names (db2, hana, …) only
            # compose db.table when the table isn't already qualified —
            # db.schema.table is invalid SQL there.
            table = f"{db_opt}.{table}"
        user = str(self.opt("user", ""))
        password = str(self.opt("password", ""))
        props = {"user": user, "password": password}
        if self.opt("driver"):
            props["driver"] = self.opt("driver")
        df = df.drop(*[c for c in (TABLE_ID_COL,) if c in df.columns])
        keys = self.opt("primary_keys")
        if keys and any("${primary_key}" in str(k) for k in keys):
            # ${primary_key} resolves from the source-declared /
            # discovered key (sink-options-placeholders.md)
            sk = getattr(self, "source_keys", None) or []
            keys = [k for k in keys if "${primary_key}" not in str(k)] + \
                list(sk)
            keys = keys or None
        if not keys:
            keys = getattr(self, "source_keys", None)
        if (self.opt("schema_save_mode") or self.opt("data_save_mode")) \
                and fam and not _jvm_driver_available(
                    df.sparkSession, self.opt("driver")):
            # conf-declared SaveMode semantics over the stdlib wire
            # clients (the reference's DefaultSaveModeHandler: schema
            # RECREATE/CREATE-IF-MISSING/ERROR-IF-MISSING × data
            # DROP/APPEND/ERROR/CUSTOM — jdbc_sap_hana confs declare
            # RECREATE_SCHEMA + DROP_DATA). Runs AFTER key resolution
            # so the generated PRIMARY KEY uses resolved/discovered
            # keys, never the raw ${primary_key} placeholder.
            self._wire_save_mode(df, url, table, user, password,
                                 [str(k) for k in (keys or [])])
        if keys and ROW_KIND_COL in df.columns:
            # CDC schema evolution to the sink table
            # (docs/en/concept/schema-evolution.md sink matrix: the
            # jdbc sink applies source DDL): ADD-COLUMN drift between
            # the incoming evolved frame and the sink table becomes
            # ALTER TABLE before the upsert.
            self._sync_schema(df, url, table, user, password)
            df = compact_changelog(df, keys)
            if bool(self.opt("is_exactly_once", False)):
                # XA-wrapped upserts: every partition prepares its
                # branch, the driver commits all (the reference's
                # exactly-once + upsert combination,
                # mysqlcdc_to_mysql_with_schema_change_exactly_once)
                from seatunnel_spark.jdbc_dialects import dialect_for

                dialect = dialect_for(url, self.opt("compatible_mode"))
                up = dialect.upsert_sql(table, df.columns, keys)
                self._write_2pc(df, url, table, user, password, sql=up)
            else:
                self._upsert(df, url, table, user, password, keys)
            return
        df = df.drop(*[c for c in (ROW_KIND_COL, "__offset", "__event_ts")
                       if c in df.columns])
        if keys and bool(self.opt("generate_sink_sql")) \
                and not bool(self.opt("use_copy_statement", False)):
            # generate_sink_sql + primary_keys upserts even for plain
            # batch rows (the reference's upsert-by-query mode,
            # jdbc_sink_auto_generate_upsql_sql.conf)
            if bool(self.opt("is_exactly_once", False)):
                from seatunnel_spark.jdbc_dialects import dialect_for

                dialect = dialect_for(url, self.opt("compatible_mode"))
                self._write_2pc(df, url, table, user, password,
                                sql=dialect.upsert_sql(
                                    table, df.columns, keys))
            else:
                self._upsert(df, url, table, user, password, keys)
            return
        if bool(self.opt("is_exactly_once", False)):
            self._write_2pc(df, url, table, user, password)
            return
        from seatunnel_spark.sql_exec import wire_family

        if bool(self.opt("use_wire_client", False)) or (
                wire_family(url) and not _jvm_driver_available(
                    df.sparkSession, self.opt("driver"))):
            # a conf-declared JVM driver class that isn't on the
            # classpath (no jars in this sandbox) falls back to the
            # stdlib wire client instead of failing the job
            self._wire_insert(df, url, table, user, password)
            return
        mode = {
            "DROP_DATA": "overwrite",
            "APPEND_DATA": "append",
            "ERROR_WHEN_DATA_EXISTS": "errorifexists",
            "IGNORE": "ignore",
        }.get(str(self.opt("data_save_mode", "APPEND_DATA")).upper(), "append")
        df.write.mode(mode).jdbc(url, table, properties=props)

    # -- stdlib wire-client paths -----------------------------------------
    def _batch_size(self) -> int:
        return int(self.opt("batch_size", 500))

    _SPARK_TO_SQL = {
        "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INT",
        "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
        "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
        "string": "VARCHAR(255)", "binary": "BLOB",
    }

    def _sync_schema(self, df: DataFrame, url: str, table: str,
                     user: str, password: str) -> None:
        """Apply ADD-COLUMN drift to the sink table (the reference's
        schema-evolution sink support: connector-jdbc applies the
        source's AlterTableAddColumnEvent as DDL —
        mysqlcdc_to_mysql_with_schema_change.conf). The incoming frame
        carries the source's EVOLVED schema; columns the sink table
        lacks are added with ALTER TABLE before the write. Probe
        failure or an unknown table is a no-op (nothing to evolve)."""
        from seatunnel_spark.sql_exec import WireExecutor, wire_family

        if not wire_family(url):
            return
        meta = {ROW_KIND_COL, TABLE_ID_COL, "__offset", "__event_ts"}
        try:
            ex = WireExecutor(url, user, password)
        except Exception:  # noqa: BLE001 - no server/auth: nothing to sync
            return
        try:
            probe = _probe_sql(wire_family(url), table)
            try:
                cols, _, _ = ex.query(probe)
            except (ConnectionError, OSError):
                raise  # transport failure is not "unknown table"
            except Exception:  # noqa: BLE001 - server error: table absent
                return
            if not cols:
                return
            have = {c.lower() for c in cols}
            self._apply_source_ddl(ex, url, table, have)
            for f in df.schema.fields:
                if f.name in meta or f.name.lower() in have:
                    continue
                s = f.dataType.simpleString()
                sql_t = s.upper() if s.startswith("decimal") else \
                    self._SPARK_TO_SQL.get(s, "VARCHAR(255)")
                ex.execute(f"ALTER TABLE {table} "
                           f"ADD COLUMN {f.name} {sql_t}")
                have.add(f.name.lower())
        finally:
            ex.close()

    _DSL_TO_SQL = {
        "tinyint": "TINYINT", "smallint": "SMALLINT", "int": "INT",
        "bigint": "BIGINT", "float": "FLOAT", "double": "DOUBLE",
        "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
        "string": "VARCHAR(255)",
    }

    def _apply_source_ddl(self, ex, url: str, table: str,
                          have: set) -> None:
        """Replay the source's schema-change DDL on the sink table, in
        stream order — DROP / RENAME(CHANGE) / MODIFY beyond the
        frame-diff ADD pass (the reference's schema-evolution contract,
        docs/en/concept/schema-evolution.md:9-13: add/drop/rename/
        modify all reach jdbc sinks as DDL). Ops that no longer apply
        (column already dropped/renamed on a retry) are skipped, so the
        replay is idempotent."""
        from seatunnel_spark.sources.cdc_replay import (ddl_for_table,
                                                        parse_ddl_ops)

        ddls = ddl_for_table(getattr(self, "source_ddl", None) or {},
                             getattr(self, "input_name", None),
                             table.split(".")[-1])
        pg = "postgres" in url or "opengauss" in url
        for ddl in ddls:
            for op in parse_ddl_ops(ddl):
                kind = op[0]
                if kind == "add" and op[1].lower() not in have:
                    t = self._dsl_sql_type(op[2])
                    ex.execute(f"ALTER TABLE {table} "
                               f"ADD COLUMN {op[1]} {t}")
                    have.add(op[1].lower())
                elif kind == "drop" and op[1].lower() in have:
                    ex.execute(f"ALTER TABLE {table} "
                               f"DROP COLUMN {op[1]}")
                    have.discard(op[1].lower())
                elif kind == "rename" and op[1].lower() in have:
                    old, new, dsl = op[1], op[2], op[3]
                    t = self._dsl_sql_type(dsl)
                    if pg:
                        ex.execute(f"ALTER TABLE {table} RENAME "
                                   f"COLUMN {old} TO {new}")
                    else:
                        ex.execute(f"ALTER TABLE {table} "
                                   f"CHANGE COLUMN {old} {new} {t}")
                    have.discard(old.lower())
                    have.add(new.lower())
                elif kind == "modify" and op[1].lower() in have:
                    t = self._dsl_sql_type(op[2])
                    if pg:
                        ex.execute(f"ALTER TABLE {table} ALTER "
                                   f"COLUMN {op[1]} TYPE {t}")
                    else:
                        ex.execute(f"ALTER TABLE {table} "
                                   f"MODIFY COLUMN {op[1]} {t}")

    def _dsl_sql_type(self, dsl: str) -> str:
        return dsl.upper() if dsl.startswith("decimal") else \
            self._DSL_TO_SQL.get(dsl, "VARCHAR(255)")

    def _wire_save_mode(self, df: DataFrame, url: str, table: str,
                        user: str, password: str,
                        keys: list[str]) -> None:
        """schema_save_mode × data_save_mode over a wire client — the
        reference's DefaultSaveModeHandler.java contract: schema
        RECREATE_SCHEMA (drop + create), CREATE_SCHEMA_WHEN_NOT_EXIST,
        ERROR_WHEN_SCHEMA_NOT_EXIST, IGNORE; data DROP_DATA (truncate),
        APPEND_DATA, ERROR_WHEN_DATA_EXISTS, CUSTOM_PROCESSING
        (custom_sql). `keys` are the RESOLVED primary keys
        (placeholder substitution + source-key discovery applied)."""
        from seatunnel_spark.jdbc_dialects import dialect_for
        from seatunnel_spark.sql_exec import WireExecutor, wire_family

        ssm = str(self.opt("schema_save_mode",
                           "CREATE_SCHEMA_WHEN_NOT_EXIST")).upper()
        dsm = str(self.opt("data_save_mode", "APPEND_DATA")).upper()
        fam = wire_family(url)
        dialect = dialect_for(url, self.opt("compatible_mode"))
        meta = {ROW_KIND_COL, TABLE_ID_COL, "__offset", "__event_ts"}
        tid = dialect.table_identifier(table)
        ex = WireExecutor(url, user, password)
        try:
            def exists() -> bool:
                # probe the QUOTED identifier DDL addresses (unquoted
                # names case-fold differently on pg-family servers)
                try:
                    ex.query(_probe_sql(fam, tid))
                    return True
                except (ConnectionError, OSError):
                    raise
                except Exception:  # noqa: BLE001 - server "unknown table"
                    return False

            from seatunnel_spark.plans.ddl_builders import \
                generic_create_table

            create = generic_create_table(
                tid,
                [(f.name, self._dsl_sql_type(f.dataType.simpleString()))
                 for f in df.schema.fields if f.name not in meta],
                primary_key=keys or None, quote=dialect.quote_char)
            if ssm == "RECREATE_SCHEMA":
                if exists():
                    ex.execute(f"DROP TABLE {tid}")
                ex.execute(create)
            elif ssm == "CREATE_SCHEMA_WHEN_NOT_EXIST":
                if not exists():
                    ex.execute(create)
            elif ssm == "ERROR_WHEN_SCHEMA_NOT_EXIST":
                if not exists():
                    raise RuntimeError(
                        f"sink table {table} does not exist "
                        "(schema_save_mode=ERROR_WHEN_SCHEMA_NOT_EXIST)")
            if dsm == "DROP_DATA" and ssm != "RECREATE_SCHEMA":
                # a freshly recreated table is already empty
                ex.execute(f"TRUNCATE TABLE {tid}")
            elif dsm == "ERROR_WHEN_DATA_EXISTS":
                _, _, rows = ex.query(_limit1_sql(fam, tid))
                if rows:
                    raise RuntimeError(
                        f"sink table {table} already has data "
                        "(data_save_mode=ERROR_WHEN_DATA_EXISTS)")
            elif dsm == "CUSTOM_PROCESSING" and self.opt("custom_sql"):
                ex.execute(str(self.opt("custom_sql")))
        finally:
            ex.close()

    def _wire_insert(self, df: DataFrame, url: str, table: str,
                     user: str, password: str) -> None:
        from seatunnel_spark.jdbc_dialects import dialect_for
        from seatunnel_spark.sql_exec import wire_family

        if bool(self.opt("use_copy_statement", False)) \
                and wire_family(url) == "pg":
            # COPY table (cols) FROM STDIN — the reference's bulk-load
            # path for pg sinks (jdbc_postgres_source_and_sink_copy_
            # stmt.conf; CopyManagerProxy in connector-jdbc)
            self._wire_copy(df, url, table, user, password)
            return
        dialect = dialect_for(url, self.opt("compatible_mode"))
        self._wire_exec(df, url, dialect.insert_sql(table, df.columns),
                        user, password, df.columns)

    def _wire_exec(self, df: DataFrame, url: str, sql: str, user: str,
                   password: str, cols) -> None:
        """Partition-parallel batched execution of one DML statement,
        bound per row in `cols` order."""
        cols = list(cols)
        batch = self._batch_size()

        def run_partition(rows):
            from seatunnel_spark.sql_exec import WireExecutor, bind

            ex = None
            pending = []
            try:
                for row in rows:
                    if ex is None:
                        ex = WireExecutor(url, user, password)
                    pending.append(bind(sql, [row[c] for c in cols]))
                    if len(pending) >= batch:
                        ex.execute_batch(pending)
                        pending = []
                if ex is not None:
                    ex.execute_batch(pending)
            finally:
                if ex is not None:
                    ex.close()

        df.foreachPartition(run_partition)

    def _wire_copy(self, df: DataFrame, url: str, table: str,
                   user: str, password: str) -> None:
        cols = df.columns

        def run_partition(rows):
            from seatunnel_spark.pg_wire import PgClient

            it = iter(rows)
            first = next(it, None)
            if first is None:
                return
            import itertools as _it

            cl = PgClient.from_jdbc_url(url, user, password)
            try:
                cl.copy_in(table, cols,
                           ([r[c] for c in cols]
                            for r in _it.chain([first], it)))
            finally:
                cl.close()

        df.foreachPartition(run_partition)

    def _upsert(self, df: DataFrame, url: str, table: str, user: str,
                password: str, keys: list[str]) -> None:
        """Partition-parallel batched upsert using the dialect's native
        statement (INSERT..ON DUPLICATE KEY / ON CONFLICT / MERGE INTO,
        seatunnel_spark.jdbc_dialects), falling back to the reference's
        update-then-insert pair when the dialect has none
        (JdbcDialect.java:166-207). Executors each hold one connection —
        the reference's sink resource-sharing pattern."""
        from seatunnel_spark.jdbc_dialects import dialect_for

        cols = df.columns
        dialect = dialect_for(url, self.opt("compatible_mode"))
        sql = dialect.upsert_sql(table, cols, keys)
        param_cols = list(cols)
        upd = ins = None
        if sql is None:
            # dialect without a native upsert: update-then-insert pair
            upd = dialect.update_sql(table, cols, keys)
            ins = dialect.insert_sql(table, cols)
        batch = self._batch_size()

        def run_partition(rows):
            from seatunnel_spark.sql_exec import WireExecutor, bind

            ex = None
            pending = []
            try:
                for row in rows:
                    if ex is None:
                        ex = WireExecutor(url, user, password)
                    if sql is not None:
                        pending.append(bind(sql, [row[c]
                                                  for c in param_cols]))
                    else:
                        non_keys = [c for c in cols if c not in keys]
                        pending.append(bind(
                            upd, [row[c] for c in non_keys]
                            + [row[k] for k in keys]))
                        pending.append(bind(ins, [row[c] for c in cols]))
                    if len(pending) >= batch:
                        ex.execute_batch(pending)
                        pending = []
                if ex is not None:
                    ex.execute_batch(pending)
            finally:
                if ex is not None:
                    ex.close()

        df.foreachPartition(run_partition)

    def _write_2pc(self, df: DataFrame, url: str, table: str, user: str,
                   password: str, sql: str | None = None) -> None:
        """Exactly-once 2PC: all partitions PREPARE, then the driver
        commits every branch; any prepare failure aborts the job before
        a single branch commits (XaFacade semantics)."""
        from seatunnel_spark.jdbc_dialects import dialect_for
        from seatunnel_spark.sql_exec import wire_family

        family = wire_family(url)
        if family is None:
            raise NotImplementedError(
                "is_exactly_once needs a pg/mysql-family URL for the "
                "stdlib XA path (or deploy a JVM XA driver jar)")
        dialect = dialect_for(url, self.opt("compatible_mode"))
        cols = df.columns
        sql = sql or dialect.insert_sql(table, cols)
        run_id = uuid.uuid4().hex[:12]
        batch = self._batch_size()

        def prepare_partition(idx, rows):
            from seatunnel_spark.sql_exec import WireExecutor, bind

            xid = f"seatunnel_{run_id}_{idx}"
            ex = None
            try:
                statements = []
                for row in rows:
                    statements.append(bind(sql, [row[c] for c in cols]))
                if not statements:
                    return iter(())
                ex = WireExecutor(url, user, password)
                if family == "pg":
                    ex.execute("BEGIN")
                    for i in range(0, len(statements), batch):
                        ex.execute_batch(statements[i:i + batch])
                    ex.execute(f"PREPARE TRANSACTION '{xid}'")
                else:
                    ex.execute(f"XA START '{xid}'")
                    for s in statements:
                        ex.execute(s)
                    ex.execute(f"XA END '{xid}'")
                    ex.execute(f"XA PREPARE '{xid}'")
                return iter([xid])
            finally:
                if ex is not None:
                    ex.close()

        prepared = df.rdd.mapPartitionsWithIndex(prepare_partition).collect()
        from seatunnel_spark.sql_exec import WireExecutor

        ex = WireExecutor(url, user, password)
        try:
            for xid in prepared:
                if family == "pg":
                    ex.execute(f"COMMIT PREPARED '{xid}'")
                else:
                    ex.execute(f"XA COMMIT '{xid}'")
        finally:
            ex.close()
