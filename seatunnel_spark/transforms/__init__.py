"""Transform registry: the reference's 17 row-level transforms, Spark-native.

Reference inventory: seatunnel-transforms-v2/src/main/java/org/apache/seatunnel/transform/
(SURVEY.md §2.2). Every transform here is a pure DataFrame -> DataFrame
function built from Catalyst expressions — no Python UDFs except where
semantics demand user code (DynamicCompile) or model inference (LLM/Embedding).
"""

from __future__ import annotations

from seatunnel_spark.transforms.base import Transform
from seatunnel_spark.transforms.basic import (
    CopyTransform,
    FieldMapperTransform,
    FilterFieldTransform,
    FieldRenameTransform,
    TableRenameTransform,
    TableMergeTransform,
    MetadataTransform,
)
from seatunnel_spark.transforms.strings import (
    ReplaceTransform,
    SplitTransform,
    JsonPathTransform,
)
from seatunnel_spark.transforms.rowkind import (
    FilterRowKindTransform,
    RowKindExtractorTransform,
)
from seatunnel_spark.transforms.sql import SqlTransform
from seatunnel_spark.transforms.dynamic import DynamicCompileTransform
from seatunnel_spark.transforms.nlp import LLMTransform, EmbeddingTransform

TRANSFORMS: dict[str, type[Transform]] = {
    t.NAME: t
    for t in [
        CopyTransform,
        FieldMapperTransform,
        FilterFieldTransform,
        FieldRenameTransform,
        TableRenameTransform,
        TableMergeTransform,
        MetadataTransform,
        ReplaceTransform,
        SplitTransform,
        JsonPathTransform,
        FilterRowKindTransform,
        RowKindExtractorTransform,
        SqlTransform,
        DynamicCompileTransform,
        LLMTransform,
        EmbeddingTransform,
    ]
}


def get_transform(name: str, options: dict) -> Transform:
    key = name.strip()
    if key not in TRANSFORMS:
        # case-insensitive lookup, matching the reference's factory discovery
        lower = {k.lower(): k for k in TRANSFORMS}
        if key.lower() in lower:
            key = lower[key.lower()]
        else:
            raise KeyError(f"unknown transform {name!r}; known: {sorted(TRANSFORMS)}")
    return TRANSFORMS[key](options)


__all__ = ["Transform", "TRANSFORMS", "get_transform"]
