"""Changelog (RowKind) transforms.

The reference carries a per-row changelog kind (+I/-U/+U/-D,
seatunnel-api/.../type/RowKind.java:21-47). Here it rides as the
reserved ``__row_kind`` column (SURVEY.md §1.1) — same technique
Flink/Debezium-on-Spark pipelines use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.types import ROW_KIND_COL, ROW_KIND_FULL


class FilterRowKindTransform(Transform):
    """Keep/drop rows by changelog kind.

    Reference: transform/filterrowkind/FilterRowKindTransform.java:36-71,
    docs/en/transform-v2/filter-rowkind.md — exactly one of
    include_kinds / exclude_kinds; kinds accepted in SHORT (+I) or
    FULL (INSERT) spelling.
    """

    NAME = "FilterRowKind"

    @staticmethod
    def _normalize(kinds: list[str]) -> list[str]:
        full_to_short = {v: k for k, v in ROW_KIND_FULL.items()}
        return [full_to_short.get(k.upper(), k) for k in kinds]

    def apply(self, df: DataFrame) -> DataFrame:
        include = self.opt("include_kinds")
        exclude = self.opt("exclude_kinds")
        if bool(include) == bool(exclude):
            raise ValueError("FilterRowKind: set exactly one of include_kinds/exclude_kinds")
        kind = (
            F.col(ROW_KIND_COL) if ROW_KIND_COL in df.columns else F.lit("+I")
        )
        if include:
            return df.filter(kind.isin(self._normalize(include)))
        return df.filter(~kind.isin(self._normalize(exclude)))


class RowKindExtractorTransform(Transform):
    """Materialize the changelog kind as a data column (append-only log).

    Reference: transform/rowkind/RowKindExtractorTransform.java:36-55,
    docs/en/transform-v2/rowkind-extractor.md — custom_field_name
    (default row_kind), transform_type SHORT|FULL.
    """

    NAME = "RowKindExtractor"

    def apply(self, df: DataFrame) -> DataFrame:
        dest = self.opt("custom_field_name", "row_kind")
        style = str(self.opt("transform_type", "SHORT")).upper()
        kind = F.col(ROW_KIND_COL) if ROW_KIND_COL in df.columns else F.lit("+I")
        if style == "FULL":
            mapping = F.create_map(
                *[F.lit(x) for kv in ROW_KIND_FULL.items() for x in kv]
            )
            expr = mapping.getItem(kind)
        elif style == "SHORT":
            expr = kind
        else:
            raise ValueError(f"transform_type must be SHORT|FULL, got {style!r}")
        return df.withColumn(dest, expr)
