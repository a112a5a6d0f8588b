"""Structural transforms: Copy, FieldMapper, Filter, FieldRename,
TableRename, TableMerge, Metadata.

All are pure column projections/renames — Catalyst column pruning makes
them free at any scale (they push straight into the parquet scan).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.types import ROW_KIND_COL, TABLE_ID_COL


class CopyTransform(Transform):
    """Duplicate field(s) under new names.

    Reference: transform/copy/CopyFieldTransform.java:41-84,
    docs/en/transform-v2/copy.md — option ``fields {new = old}``, or the
    legacy single-field form ``src_field``/``dest_field``
    (copy_transform.conf:47-49).
    """

    NAME = "Copy"

    def apply(self, df: DataFrame) -> DataFrame:
        fields: dict = self.opt("fields")
        if not fields:
            fields = {self.require("dest_field"): self.require("src_field")}
        return df.withColumns({new: F.col(old) for new, old in fields.items()})


class FieldMapperTransform(Transform):
    """Select + reorder + rename in one mapping.

    Reference: transform/fieldmapper/FieldMapperTransform.java:45-79,
    docs/en/transform-v2/field-mapper.md — option ``field_mapper {old = new}``
    (insertion order defines output order).
    """

    NAME = "FieldMapper"

    def apply(self, df: DataFrame) -> DataFrame:
        mapper: dict = self.require("field_mapper")
        return df.select([F.col(old).alias(new) for old, new in mapper.items()])


class FilterFieldTransform(Transform):
    """Column projection via include/exclude lists.

    Reference: transform/filter/FilterFieldTransform.java:47-104,
    docs/en/transform-v2/filter.md — exactly one of ``include_fields`` /
    ``exclude_fields``.
    """

    NAME = "Filter"

    def apply(self, df: DataFrame) -> DataFrame:
        # `fields` is the legacy include-list spelling (filter_transform.conf:48)
        include = self.opt("include_fields") or self.opt("fields")
        exclude = self.opt("exclude_fields")
        if bool(include) == bool(exclude):
            raise ValueError("Filter: set exactly one of include_fields/exclude_fields")
        if include:
            return df.select(*include)
        return df.drop(*exclude)


def rename_with_rules(
    name: str,
    convert_case: str | None,
    prefix: str | None,
    suffix: str | None,
    replacements: list[dict] | None,
) -> str:
    """Shared rename rule engine for FieldRename/TableRename.

    Reference semantics: transform/rename/FieldRenameTransform.java:55-117 —
    regex replacements first, then case conversion, then prefix/suffix.
    """
    out = name
    for rule in replacements or []:
        out = re.sub(rule["replace_from"], rule["replace_to"], out)
    if convert_case:
        cc = convert_case.upper()
        if cc == "UPPER":
            out = out.upper()
        elif cc == "LOWER":
            out = out.lower()
        else:
            raise ValueError(f"convert_case must be UPPER|LOWER, got {convert_case!r}")
    if prefix:
        out = prefix + out
    if suffix:
        out = out + suffix
    return out


class FieldRenameTransform(Transform):
    """Bulk-rename columns: case conversion, prefix/suffix, regex rules.

    Reference: transform/rename/FieldRenameTransform.java:55-117,
    docs/en/transform-v2/field-rename.md.
    """

    NAME = "FieldRename"

    def apply(self, df: DataFrame) -> DataFrame:
        mapping = {}
        for c in df.columns:
            if c in (ROW_KIND_COL, TABLE_ID_COL):  # reserved metadata survives
                continue
            new = rename_with_rules(
                c,
                self.opt("convert_case"),
                self.opt("prefix"),
                self.opt("suffix"),
                self.opt("replacements_with_regex"),
            )
            if new != c:
                mapping[c] = new
        return df.withColumnsRenamed(mapping) if mapping else df


def convert_table_id(tid: str, opts: dict) -> str:
    """Reference TableRename naming (TableRenameTransform.java:148-213):
    database/schema parts get convert_case only; the TABLE part gets
    regex matches located in the ORIGINAL name, then case conversion,
    then splicing replace_to over the matched spans, then prefix/suffix.
    Only the LAST replacement rule with any match applies."""
    import re as _re

    def case(s: str) -> str:
        cc = (opts.get("convert_case") or "").upper()
        return s.upper() if cc == "UPPER" else s.lower() if cc == "LOWER" else s

    parts = tid.split(".")
    head, table = parts[:-1], parts[-1]
    replace_to, spans = None, []
    for rule in opts.get("replacements_with_regex") or []:
        frm = rule.get("replace_from") or ""
        if not frm:
            continue
        if rule.get("is_regex") is False:
            matched = [(0, len(table))] if frm == table else []
        else:
            matched = [m.span() for m in _re.finditer(frm, table)]
        if matched:
            replace_to, spans = str(rule.get("replace_to", "")).strip(), matched
    table = case(table)
    offset = 0
    for start, end in spans:
        table = table[: start + offset] + replace_to + table[end + offset:]
        offset += len(replace_to) - (end - start)
    prefix = (opts.get("prefix") or "").strip()
    suffix = (opts.get("suffix") or "").strip()
    return ".".join([case(p) for p in head] + [prefix + table + suffix])


class TableRenameTransform(Transform):
    """Rename the table id (multi-table routing key).

    Reference: transform/rename/TableRenameTransform.java:38,
    docs/en/transform-v2/table-rename.md. Operates on the __table_id
    metadata column; same rule engine as FieldRename.
    """

    NAME = "TableRename"

    def apply(self, df: DataFrame) -> DataFrame:
        if TABLE_ID_COL not in df.columns:
            return df
        convert_case = self.opt("convert_case")
        prefix = self.opt("prefix") or ""
        suffix = self.opt("suffix") or ""
        col = F.col(TABLE_ID_COL)
        for rule in self.opt("replacements_with_regex") or []:
            col = F.regexp_replace(col, rule["replace_from"], rule["replace_to"])
        if convert_case:
            cc = convert_case.upper()
            col = F.upper(col) if cc == "UPPER" else F.lower(col)
        col = F.concat(F.lit(prefix), col, F.lit(suffix))
        return df.withColumn(TABLE_ID_COL, col)


class TableMergeTransform(Transform):
    """Re-tag N sharded tables as one target table (union semantics).

    Reference: transform/table/TableMergeTransform.java:27-57,
    docs/en/transform-v2/table-merge.md — options ``table_match_regex``,
    ``database``/``schema``/``table``. Rows whose __table_id matches the
    regex get the new id; the engine's multi-table router then treats
    them as one table (Spark union is implicit — same DataFrame).
    """

    NAME = "TableMerge"

    def apply(self, df: DataFrame) -> DataFrame:
        target = ".".join(
            p for p in [self.opt("database"), self.opt("schema"), self.require("table")] if p
        )
        if TABLE_ID_COL not in df.columns:
            return df.withColumn(TABLE_ID_COL, F.lit(target))
        pattern = self.opt("table_match_regex", ".*")
        return df.withColumn(
            TABLE_ID_COL,
            F.when(F.col(TABLE_ID_COL).rlike(pattern), F.lit(target)).otherwise(
                F.col(TABLE_ID_COL)
            ),
        )


class MetadataTransform(Transform):
    """Surface pipeline metadata as ordinary columns.

    Reference: transform/metadata/MetadataTransform.java:42,
    docs/en/transform-v2/metadata.md — ``metadata_fields {Key = out_col}``
    with keys Database/Table/RowKind/EventTime/Delay/Partition.
    """

    NAME = "Metadata"

    def apply(self, df: DataFrame) -> DataFrame:
        fields: dict = self.require("metadata_fields")
        out = df
        table_id = F.col(TABLE_ID_COL) if TABLE_ID_COL in df.columns else F.lit(None)
        for key, dest in fields.items():
            k = key.lower()
            if k == "database":
                expr = F.split(table_id, r"\.").getItem(0)
            elif k == "table":
                expr = F.element_at(F.split(table_id, r"\."), -1)
            elif k == "rowkind":
                expr = (
                    F.col(ROW_KIND_COL)
                    if ROW_KIND_COL in df.columns
                    else F.lit("+I")
                )
            elif k == "eventtime":
                # CDC frames carry the change event's ts_ms; otherwise
                # processing time (metadata.md: EventTime semantics).
                from seatunnel_spark.types import EVENT_TS_COL

                expr = (
                    F.col(EVENT_TS_COL).cast("long")
                    if EVENT_TS_COL in df.columns
                    else (F.unix_timestamp(F.current_timestamp()) * 1000)
                    .cast("long")
                )
            elif k == "delay":
                from seatunnel_spark.types import EVENT_TS_COL

                expr = (
                    ((F.unix_timestamp(F.current_timestamp()) * 1000)
                     - F.col(EVENT_TS_COL)).cast("long")
                    if EVENT_TS_COL in df.columns
                    else F.lit(None).cast("long")
                )
            elif k == "partition":
                # Only meaningful for CDC connectors (metadata.md note); null otherwise.
                expr = F.lit(None).cast("string")
            else:
                raise ValueError(f"Metadata: unknown metadata key {key!r}")
            out = out.withColumn(dest, expr)
        return out
