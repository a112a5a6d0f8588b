"""Doris and StarRocks sources over the MySQL wire protocol.

Reference surfaces: connector-doris DorisSourceOptions.java (fenodes,
query-port 9030, table.identifier, doris.read.field,
doris.filter.query) and connector-starrocks SourceConfig/CommonConfig
(nodeUrls, database, table, scan_filter, username, password).

The reference readers stream Arrow batches from BE tablet scans
(DorisSource via FE REST query plan + thrift; StarRocksBeReadClient).
Both FEs are MySQL-protocol compatible on the query port, so the
rebuild pushes the projected + filtered SELECT through mysql_wire —
the FE then distributes the scan across BEs itself. For Spark-side
parallelism, `partition_column`/`partition_num` fan the read out as
MOD(column, n) = i predicates, one executor task per slice (the
tablet-split analog; the single-slice path still runs inside one
executor task, never on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.base import Source

_MYSQL_TO_SPARK = {
    "TINYINT": "tinyint", "SMALLINT": "smallint", "INT": "int",
    "BIGINT": "bigint", "FLOAT": "float", "DOUBLE": "double",
    "DECIMAL": "decimal(38,10)", "DATE": "date", "TIME": "string",
    "DATETIME": "timestamp", "TIMESTAMP": "timestamp",
    "VARCHAR": "string", "CHAR": "string", "TEXT": "string",
}


def _fetch_slice(host: str, port: int, user: str, password: str,
                 database: str, sql: str) -> list[tuple]:
    from seatunnel_spark.mysql_wire import MySqlClient

    cl = MySqlClient(host, port, user, password, database)
    try:
        _, types, rows = cl.query(sql)
        # normalize Decimals/dates to strings for the exchange; the
        # typed cast happens in the DataFrame schema
        out = []
        for r in rows:
            out.append(tuple(None if v is None else str(v) for v in r))
        return out
    finally:
        cl.close()


class _MySqlProtocolSource(Source):
    """Shared SELECT-pushdown source; subclasses map option names."""

    def table_id(self) -> str | None:
        # ${table_name} placeholder resolution uses the FE table path
        # (sink-options-placeholders.md TablePath semantics)
        try:
            return self._table()
        except Exception:  # noqa: BLE001 — table_list form has no single id
            return super().table_id()

    def _endpoint(self) -> tuple[str, int]:
        raise NotImplementedError

    def _table(self) -> str:
        raise NotImplementedError

    def _projection(self) -> str:
        raise NotImplementedError

    def _filter(self) -> str | None:
        raise NotImplementedError

    def read(self, spark: SparkSession):
        table_list = self.opt("table_list")
        if table_list:
            # per-table sub-configs (DorisSourceConfig table_list) —
            # dict routing so Assert tables_configs sees each table
            base = {k: v for k, v in self.options.items()
                    if k != "table_list"}
            out = {}
            for sub in table_list:
                src = type(self)({**base, **sub})
                out[src._table()] = src._read_single(spark)
            return out if len(out) > 1 else next(iter(out.values()))
        return self._read_single(spark)

    def _read_single(self, spark: SparkSession) -> DataFrame:
        from seatunnel_spark.mysql_wire import (
            TYPE_NAMES,
            MySqlClient,
        )
        from seatunnel_spark.net import apply_host_aliases

        host, port = self._endpoint()
        resolved = apply_host_aliases(f"tcp://{host}:{port}")
        hostpart = resolved.split("://", 1)[-1]
        host, _, p = hostpart.rpartition(":")
        port = int(p)
        user = self.opt("username", "root")
        password = self.opt("password", "")
        table = self._table()
        database = table.split(".")[0] if "." in table else ""
        base_sql = f"SELECT {self._projection()} FROM {table}"
        filt = self._filter()
        if filt:
            base_sql += f" WHERE {filt}"

        # schema probe (LIMIT 0) on the driver
        cl = MySqlClient(host, port, user, password, database)
        try:
            cols, types, _ = cl.query(base_sql + " LIMIT 0")
        finally:
            cl.close()
        part_col = self.opt("partition_column")
        nparts = int(self.opt("partition_num", 1)) if part_col else 1
        if part_col and nparts > 1:
            conj = "AND" if filt else "WHERE"
            slices = [f"{base_sql} {conj} MOD({part_col}, {nparts}) = {i}"
                      for i in range(nparts)]
        else:
            slices = [base_sql]

        rdd = spark.sparkContext.parallelize(slices, len(slices)).flatMap(
            lambda s: _fetch_slice(host, port, user, password, database, s))
        str_ddl = ", ".join(f"`{c}` string" for c in cols)
        raw = spark.createDataFrame(rdd, str_ddl)
        from pyspark.sql import functions as F

        typed = [F.col(f"`{c}`").cast(
            _MYSQL_TO_SPARK.get(TYPE_NAMES.get(t, ""), "string"))
            .alias(c) for c, t in zip(cols, types)]
        return raw.select(*typed)


class DorisSource(_MySqlProtocolSource):
    NAME = "Doris"

    def _endpoint(self) -> tuple[str, int]:
        fe = str(self.require("fenodes")).split(",")[0].strip()
        host = fe.split(":")[0]
        return host, int(self.opt("query-port", 9030))

    def _table(self) -> str:
        ident = self.opt("table.identifier")
        if ident:
            return str(ident)
        # table_list entries use database= / table= pairs
        return f"{self.require('database')}.{self.require('table')}"

    def _projection(self) -> str:
        return self.opt("doris.read.field", "*") or "*"

    def _filter(self) -> str | None:
        return self.opt("doris.filter.query")


class StarRocksSource(_MySqlProtocolSource):
    """Native scan path first (the reference's own flow — FE
    `_query_plan` REST + BE thrift Arrow scan, StarRocksSourceReader /
    StarRocksBeReadClient.java), falling back to the FE MySQL query
    port when the REST endpoint is unreachable (both FE surfaces are
    public; the MySQL port distributes the scan FE-side)."""

    NAME = "StarRocks"

    def _endpoint(self) -> tuple[str, int]:
        node = str(self.require("nodeUrls") if not isinstance(
            self.opt("nodeUrls"), list)
            else self.opt("nodeUrls")[0]).strip("[]' ")
        host = node.split(":")[0]
        return host, int(self.opt("query-port", 9030))

    def _table(self) -> str:
        return f"{self.require('database')}.{self.require('table')}"

    def _projection(self) -> str:
        return "*"

    def _filter(self) -> str | None:
        return self.opt("scan_filter") or None

    def _read_single(self, spark: SparkSession) -> DataFrame:
        nodes = self.opt("nodeUrls")
        nodes = [str(n).strip() for n in
                 (nodes if isinstance(nodes, list) else [nodes])]
        db = str(self.require("database"))
        table = str(self.require("table"))
        user = str(self.opt("username", "root"))
        pw = str(self.opt("password", ""))
        fields = (self.opt("schema") or {}).get("fields") or {}
        proj = ", ".join(f"`{c}`" for c in fields) if fields else "*"
        sql = f"select {proj} from `{db}`.`{table}`"
        filt = self._filter()
        if filt:
            sql += f" where {filt}"

        from seatunnel_spark.starrocks_scan import (
            StarRocksScanError,
            assign_tablets,
            fetch_query_plan,
            scan_partition,
        )

        plan = partitions = None
        for node in nodes:
            try:
                plan, partitions = fetch_query_plan(node, db, table, sql,
                                                    user, pw)
                break
            except StarRocksScanError:
                raise  # the FE answered and rejected: a real error
            except Exception:  # noqa: BLE001 — not an FE REST endpoint
                continue  # (refused / timeout / non-HTTP): try next
        if plan is None:
            # no FE REST endpoint answered — MySQL query-port fallback
            return super()._read_single(spark)
        if not fields:
            raise StarRocksScanError(
                "StarRocks source requires a declared schema "
                "(SourceConfig.java: the native scan projects by it)")
        parts = assign_tablets(
            partitions, int(self.opt("request_tablet_size", 1024)))
        batch = int(self.opt("scan_batch_rows", 1024))
        props = {str(k)[len("scan.params."):]: str(v)
                 for k, v in self.options.items()
                 if str(k).startswith("scan.params.")}

        def fetch(p):
            be, tablets = p
            return scan_partition(be, db, table, tablets, plan, user, pw,
                                  batch_size=batch, properties=props)

        from seatunnel_spark.types import parse_schema

        schema = parse_schema(fields)
        rdd = spark.sparkContext.parallelize(
            parts, max(1, len(parts))).flatMap(fetch)
        return spark.createDataFrame(rdd, schema)


__all__ = ["DorisSource", "StarRocksSource"]
