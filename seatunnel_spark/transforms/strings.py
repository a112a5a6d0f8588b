"""String-shaping transforms: Replace, Split, JsonPath.

All expressed as Catalyst expressions (regexp_replace / split /
get_json_object) so they stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.types import parse_type


class ReplaceTransform(Transform):
    """Literal or regex substring replacement on one field.

    Reference: transform/replace/ReplaceTransform.java:35,
    docs/en/transform-v2/replace.md — options replace_field, pattern,
    replacement, is_regex (default false), replace_first (default false).
    """

    NAME = "Replace"

    def apply(self, df: DataFrame) -> DataFrame:
        field = self.require("replace_field")
        pattern = str(self.require("pattern"))
        replacement = str(self.require("replacement"))
        is_regex = bool(self.opt("is_regex", False))
        replace_first = bool(self.opt("replace_first", False))

        if not is_regex:
            # Literal replacement of every occurrence.
            expr = F.replace(F.col(field), F.lit(pattern), F.lit(replacement))
        elif replace_first:
            # Anchor on the first match only: wrap pattern so everything
            # after the first match is preserved verbatim.
            expr = F.regexp_replace(
                F.col(field), f"({pattern})(.*)", re.sub(r"\$", r"\\$", replacement) + "$2"
            )
        else:
            expr = F.regexp_replace(F.col(field), pattern, replacement)
        return df.withColumn(field, expr)


class SplitTransform(Transform):
    """Split a string field into N new fields (null-padded).

    Reference: transform/split/SplitTransform.java:33-80,
    docs/en/transform-v2/split.md — separator, split_field, output_fields.
    The reference pads missing pieces with null and keeps the original field.
    """

    NAME = "Split"

    def apply(self, df: DataFrame) -> DataFrame:
        sep = str(self.require("separator"))
        field = self.require("split_field")
        outputs: list[str] = self.require("output_fields")
        # Literal separator (the reference treats it literally). F.get is
        # the null-safe accessor (reference null-pads missing pieces;
        # plain getItem would throw under Spark 4's ANSI mode).
        parts = F.split(F.col(field), re.escape(sep))
        return df.withColumns(
            {name: F.get(parts, i) for i, name in enumerate(outputs)}
        )


class JsonPathTransform(Transform):
    """Extract JSONPath expressions into typed destination columns.

    Reference: transform/jsonpath/JsonPathTransform.java:48-183,
    docs/en/transform-v2/jsonpath.md — ``columns`` array of
    {src_field, path, dest_field, dest_type}, error handling FAIL/SKIP.

    Implementation: `get_json_object` handles `$.a.b[0]`-style paths
    natively in the JVM; dest_type applies a cast using the schema DSL.
    """

    NAME = "JsonPath"

    def apply(self, df: DataFrame) -> DataFrame:
        columns: list[dict] = self.require("columns")
        out = df
        new_cols = {}
        for spec in columns:
            src = spec["src_field"]
            path = spec["path"]
            dest = spec["dest_field"]
            dest_type = spec.get("dest_type", "string")
            src_col = F.col(src)
            if dict(df.dtypes).get(src) not in ("string",):
                src_col = F.to_json(src_col)
            extracted = F.get_json_object(src_col, path)
            dt = parse_type(dest_type)
            if dt.simpleString() != "string":
                # try_cast: malformed values become null (the reference's
                # SKIP error-handling), instead of failing under ANSI mode.
                extracted = extracted.try_cast(dt)
            new_cols[dest] = extracted
        out = out.withColumns(new_cols)
        if str(self.opt("row_error_handle_way", "FAIL")).upper() == "SKIP_ROW":
            out = out.na.drop(subset=list(new_cols))
        return out
