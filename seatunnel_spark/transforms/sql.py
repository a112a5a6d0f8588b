"""Sql transform — the query surface.

Reference: transform/sql/SQLTransform.java:47-108 with the Zeta
interpreter (sql/zeta/ZetaSQLEngine.java). The reference accepts ONLY
single-table SELECT/WHERE/LATERAL VIEW and rejects joins, GROUP BY,
ORDER BY, LIMIT, subqueries (ZetaSQLEngine.java:144-157).

The rebuild is a strict superset: the query runs through spark.sql()
against a temp view, so joins/aggregates/windows/set-ops come free via
Catalyst. Zeta-dialect function names that Spark doesn't know are
rewritten by seatunnel_spark.functions.zeta_sql_compat() first, so
reference job configs run unchanged.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from seatunnel_spark.functions import (
    register_zeta_udfs,
    rewrite_aliasless_lateral,
    rewrite_typed_zeta,
    rewrite_zeta_sql,
)
from seatunnel_spark.transforms.base import Transform


class SqlTransform(Transform):
    """Options (docs/en/transform-v2/sql.md): ``query`` (required);
    the input table is referenced by its plugin_input name (or any
    placeholder; we alias the view both ways)."""

    NAME = "Sql"

    def __init__(self, options: dict | None = None):
        super().__init__(options)
        self.input_name = (options or {}).get("plugin_input") or (options or {}).get(
            "source_table_name"
        )

    def apply(self, df: DataFrame) -> DataFrame:
        query = self.require("query")
        spark = df.sparkSession
        register_zeta_udfs(spark)
        sql = rewrite_zeta_sql(query)
        sql = rewrite_typed_zeta(sql, df)
        sql = rewrite_aliasless_lateral(sql, df.columns)
        # Register the input under its DAG name plus the reference's
        # pseudo-table names so SELECT ... FROM <anything declared> works.
        names = {self.input_name, "dual", "input"} - {None}
        tmp = f"__st_sql_in_{uuid.uuid4().hex[:8]}"
        df.createOrReplaceTempView(tmp)
        for n in names:
            df.createOrReplaceTempView(n)
        try:
            return spark.sql(sql)
        finally:
            pass  # views are session-scoped; harmless to leave registered
