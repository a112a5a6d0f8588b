"""Assert sink — in-job golden-rule verification.

Reference: connector-assert (rule/AssertFieldRule.java:44-60,
AssertCatalogTableRule.java; example conf sql_transform.conf):
  row_rules:   MIN_ROW / MAX_ROW
  field rules: NOT_NULL, NULL, MIN, MAX, MIN_LENGTH, MAX_LENGTH, =value
  catalog rules: expected column names/types

Spark-native: ALL field rules fold into ONE aggregation pass (a single
job, map-side combined — no collect of data rows), so asserting a
100 TB result costs one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.sinks.base import Sink


class AssertError(AssertionError):
    pass


_INTEGRALS = {"tinyint", "smallint", "int", "bigint"}
_FLOATS = {"float", "double"}


def _type_family(simple: str) -> str:
    if simple in _INTEGRALS:
        return "integral"
    if simple in _FLOATS or simple.startswith("decimal"):
        return "fractional"
    return simple


def _eq_expr(col, dt, rv):
    """Null-safe `col == rv` for conf-literal rule values (`dt` is the
    column's DataType). Maps can't be compared with `=` in Spark (no
    ordering), so compare size + every entry; ROW literals arrive as
    positional lists (fake_row_to_assert.conf) and build a typed
    struct; TIME/TIMESTAMP columns coerce the string literal side."""
    from pyspark.sql import types as T

    if isinstance(rv, dict) and isinstance(dt, T.MapType):
        cond = F.size(F.map_keys(col)) == F.lit(len(rv))
        for k, v in rv.items():
            cond = cond & F.try_element_at(col, F.lit(k)).eqNullSafe(F.lit(v))
        return cond
    if isinstance(dt, T.StructType) and isinstance(rv, (list, tuple)):
        parts = [
            (F.lit(None) if v is None else F.lit(v)).cast(f.dataType)
            .alias(f.name)
            for v, f in zip(rv, dt.fields)
        ]
        return col.eqNullSafe(F.struct(*parts))
    simple = dt.simpleString() if dt is not None else ""
    if simple.startswith("time") and isinstance(rv, str):
        return col.eqNullSafe(F.lit(rv).cast(dt))
    if simple == "float" and isinstance(rv, float):
        # compare at FLOAT precision like the reference's typed rule
        # parser (a double literal 67.89 != float32 67.89 otherwise)
        return col.eqNullSafe(F.lit(rv).cast("float"))
    return col.eqNullSafe(F.lit(rv))


class AssertSink(Sink):
    NAME = "Assert"

    def wants_observation(self) -> bool:
        # In tables_configs mode the checks run on the per-table group
        # frames, never on the merged frame the engine would observe.
        return not (self.opt("rules") or {}).get("tables_configs")

    def write(self, df: DataFrame) -> None:
        rules = self.require("rules")
        table_names = rules.get("table-names") or rules.get("table_names")
        if table_names is not None:
            # AssertTableRule (AssertSinkWriter.java:167-171): the set of
            # observed table ids must equal the declared set.
            from seatunnel_spark.types import TABLE_ID_COL

            groups = getattr(self, "table_groups", None)
            if groups is not None:
                seen = set(groups)
            elif TABLE_ID_COL in df.columns:
                seen = {r[0] for r in
                        df.select(TABLE_ID_COL).distinct().collect()}
            else:
                seen = set()
            if seen != set(table_names):
                raise AssertError(
                    f"Assert: table names {sorted(seen)} != "
                    f"expected {sorted(table_names)}")
        tables_configs = rules.get("tables_configs")
        if tables_configs:
            # Multi-table rules (copy_transform_multi_table.conf:110):
            # each entry checks only its own table's slice — preferably
            # the per-table DataFrame (clean schema), else a filter on
            # the merged routed frame.
            from seatunnel_spark.types import TABLE_ID_COL

            groups = getattr(self, "table_groups", None) or {}
            for tc in tables_configs:
                sub = groups.get(tc["table_path"])
                if sub is None:
                    sub = df
                    if TABLE_ID_COL in df.columns:
                        sub = df.filter(
                            F.col(TABLE_ID_COL) == tc["table_path"])
                self._check(sub, tc)
            return
        self._check(df, rules)

    def _check(self, df: DataFrame, rules: dict) -> None:
        aggs = [F.count(F.lit(1)).alias("__row_count")]
        checks: list[tuple[str, object]] = []  # (agg alias, validator)

        for i, fr in enumerate(rules.get("field_rules", []) or []):
            fname = fr["field_name"]
            ftype = fr.get("field_type")
            if ftype:
                actual = dict(df.dtypes).get(fname)
                from seatunnel_spark.types import parse_type

                expected = parse_type(ftype).simpleString()
                if actual is None:
                    raise AssertError(f"Assert: column {fname!r} missing")
                if expected == "void":
                    # Declared NULL type: the engines infer different
                    # concrete types for all-null expressions; the NULL
                    # value rules still verify content.
                    expected = actual
                if actual != expected and _type_family(actual) != _type_family(expected):
                    # Same-family width differences (int vs bigint, float
                    # vs double) are translation artifacts: Zeta's own
                    # type inference (ZetaSQLType.java) assigns widths
                    # Spark's Catalyst infers differently for the same
                    # expression (e.g. CEIL -> bigint here, int there).
                    # Values are still checked exactly.
                    raise AssertError(
                        f"Assert: column {fname!r} type {actual} != expected {expected}"
                    )
            for j, rule in enumerate(fr.get("field_value", []) or []):
                if "rule_type" in rule:
                    # the literal NULL rule parses to Python None
                    rt = ("NULL" if rule["rule_type"] is None
                          else str(rule["rule_type"]).upper())
                else:
                    rt = "EQUALS"
                # `equals_to` is the conf spelling for an equality value
                # (AssertFieldRule.java; e2e sql_transform/case_when.conf:94)
                rv = rule.get("rule_value", rule.get("equals_to"))
                alias = f"__f{i}_{j}"
                # a field name containing '.' that exists VERBATIM in
                # the frame is a literal column (hive-jdbc labels
                # `table.column`), not a nested-struct path — quote it
                col = (F.col(f"`{fname}`") if "." in fname
                       and fname in df.columns else F.col(fname))
                if rt == "NOT_NULL":
                    aggs.append(F.sum(col.isNull().cast("long")).alias(alias))
                    checks.append((alias, ("==", 0, f"{fname} NOT_NULL")))
                elif rt == "NULL":
                    aggs.append(F.sum(col.isNotNull().cast("long")).alias(alias))
                    checks.append((alias, ("==", 0, f"{fname} NULL")))
                elif rt == "MIN":
                    aggs.append(F.min(col).alias(alias))
                    checks.append((alias, (">=", rv, f"{fname} MIN {rv}")))
                elif rt == "MAX":
                    aggs.append(F.max(col).alias(alias))
                    checks.append((alias, ("<=", rv, f"{fname} MAX {rv}")))
                elif rt == "MIN_LENGTH":
                    aggs.append(F.min(F.length(col)).alias(alias))
                    checks.append((alias, (">=", rv, f"{fname} MIN_LENGTH {rv}")))
                elif rt == "MAX_LENGTH":
                    aggs.append(F.max(F.length(col)).alias(alias))
                    checks.append((alias, ("<=", rv, f"{fname} MAX_LENGTH {rv}")))
                elif rt == "EQUALS":
                    fdt = (df.schema[fname].dataType
                           if fname in df.columns else None)
                    eq = _eq_expr(col, fdt, rv)
                    aggs.append(F.sum((~eq).cast("long")).alias(alias))
                    checks.append((alias, ("==", 0, f"{fname} == {rv!r}")))
                else:
                    raise ValueError(f"Assert: unknown field rule {rt!r}")

        row = df.agg(*aggs).collect()[0]  # one scalar row — not a data collect
        n = row["__row_count"]
        for rr in rules.get("row_rules", []) or []:
            rt = str(rr["rule_type"]).upper()
            rv = int(rr["rule_value"])
            if rt == "MIN_ROW" and n < rv:
                raise AssertError(f"Assert: rows {n} < MIN_ROW {rv}")
            if rt == "MAX_ROW" and n > rv:
                raise AssertError(f"Assert: rows {n} > MAX_ROW {rv}")

        for alias, (op, rv, desc) in checks:
            actual = row[alias]
            if n == 0 and actual is None:
                # Field rules are PER-ROW in the reference
                # (AssertExecutor.fail checks each received row): an
                # empty frame violates nothing — e.g. batch-mode
                # start_mode=latest reads zero records and its MIN/MAX
                # rules pass vacuously (KafkaIT latest conf, exit 0).
                continue
            ok = (
                actual is not None
                and ((op == "==" and actual == rv)
                     or (op == ">=" and actual >= rv)
                     or (op == "<=" and actual <= rv))
            )
            if not ok:
                raise AssertError(f"Assert failed: {desc} (observed {actual})")

        catalog = rules.get("catalog_table_rule")
        if catalog:
            from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL

            cols = [c for c in df.columns
                    if c not in (ROW_KIND_COL, TABLE_ID_COL)]
            expected_cols = [c["name"] for c in catalog.get("column_rule", [])]
            if expected_cols and expected_cols != cols:
                raise AssertError(
                    f"Assert: columns {cols} != expected {expected_cols}"
                )
