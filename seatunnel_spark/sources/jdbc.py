"""JDBC source — partitioned parallel reads for 30+ dialects.

Reference: connector-jdbc (config/JdbcOptions.java:169-185 —
partition_column / partition_num / partition_lower_bound /
partition_upper_bound; DynamicChunkSplitter.java:57 — dynamic chunking).

Spark-native design: `spark.read.jdbc` with either
  * numeric range partitioning (column/lower/upper/numPartitions —
    Spark generates the same WHERE-range chunks the reference's
    FixedChunkSplitter does), or
  * an explicit predicate list (the analog of DynamicChunkSplitter for
    skewed/non-numeric keys) via `predicates=[...]`.

The ~30 reference dialects (connector-jdbc/.../internal/dialect/) are
all URL-addressed drivers on the Spark side; `_DIALECT_DRIVERS` maps
url prefix -> driver class for the common ones so configs stay terse.
A driver jar must be on the Spark classpath at deploy time; in this
container there is no database to test against, so connect-time errors
surface from the JVM as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from seatunnel_spark.sources.base import Source

from seatunnel_spark.jdbc_dialects import dialect_for

JDBC_ALIAS_NAMES = ["Jdbc", "Mysql", "Postgres", "Oracle", "SqlServer", "Clickhouse",
                    "Doris", "StarRocks", "Greenplum", "Redshift", "Snowflake",
                    "Sqlite", "Teradata", "Vertica", "OceanBase", "Db2", "SapHana"]


class JdbcSource(Source):
    NAME = "Jdbc"

    def read(self, spark: SparkSession) -> DataFrame:
        url = self.require("url")
        props = {
            "user": str(self.opt("user", "")),
            "password": str(self.opt("password", "")),
        }
        dialect = dialect_for(url, self.opt("compatible_mode"))
        driver = self.opt("driver") or dialect.driver or None
        if driver:
            props["driver"] = driver

        table = self.opt("table_path") or self.opt("table")
        query = self.opt("query")
        dbtable = table if table else f"({query}) st_src" if query else None
        if dbtable is None:
            raise ValueError("Jdbc source: one of table_path/query required")

        part_col = self.opt("partition_column")
        if part_col:
            return spark.read.jdbc(
                url=url,
                table=dbtable,
                column=part_col,
                lowerBound=int(self.require("partition_lower_bound")),
                upperBound=int(self.require("partition_upper_bound")),
                numPartitions=int(self.opt("partition_num", 8)),
                properties=props,
            )
        predicates = self.opt("predicates")
        if predicates:
            return spark.read.jdbc(url=url, table=dbtable, predicates=predicates,
                                   properties=props)
        return spark.read.jdbc(url=url, table=dbtable, properties=props)


def dynamic_chunk_predicates(
    spark: SparkSession, url: str, table: str, column: str, props: dict, chunk_rows: int
) -> list[str]:
    """DynamicChunkSplitter analog: probe min/max/count, emit balanced
    range predicates for `read.jdbc(predicates=...)`.

    Reference behavior: connector-cdc-base/.../AbstractJdbcSourceChunkSplitter.java
    (split.size rows per chunk). Probing runs 3 scalar queries driver-side.
    """
    probe = spark.read.jdbc(
        url=url,
        table=f"(SELECT MIN({column}) lo, MAX({column}) hi, COUNT(*) n FROM {table}) p",
        properties=props,
    ).collect()[0]
    lo, hi, n = probe["lo"], probe["hi"], probe["n"]
    if n == 0 or lo is None:
        return ["1=1"]
    chunks = max(1, int(n) // max(chunk_rows, 1))
    step = max((int(hi) - int(lo)) // chunks, 1)
    preds, cur = [], int(lo)
    while cur < int(hi):
        nxt = cur + step
        preds.append(f"{column} >= {cur} AND {column} < {nxt}")
        cur = nxt
    preds.append(f"{column} >= {int(hi)}")  # inclusive tail chunk
    preds.append(f"{column} IS NULL")
    return preds
