"""Transform base class.

The reference models transforms as per-row map/flatMap with a schema
rewrite (seatunnel-api/.../transform/SeaTunnelMapTransform.java:29,
SeaTunnelTransform.java:47). Here a transform is a declarative
DataFrame -> DataFrame function; Catalyst fuses consecutive transforms
into one whole-stage-codegen span, which is what the reference's
TransformChainAction does by hand (ExecutionPlanGenerator.java:284-340).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class Transform:
    NAME: str = "?"

    def __init__(self, options: dict | None = None):
        self.options = dict(options or {})

    def opt(self, key: str, default=None):
        return self.options.get(key, default)

    def require(self, key: str):
        if key not in self.options:
            raise ValueError(f"transform {self.NAME}: missing required option {key!r}")
        return self.options[key]

    def apply(self, df: DataFrame) -> DataFrame:  # pragma: no cover - interface
        raise NotImplementedError

    def __repr__(self):
        return f"<{type(self).__name__} {self.options}>"
