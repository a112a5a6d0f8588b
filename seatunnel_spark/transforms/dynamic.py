"""DynamicCompile — user-supplied code appending computed columns.

Reference: transform/dynamiccompile/DynamicCompileTransform.java:38-86
(docs/en/transform-v2/dynamic-compile.md): the reference compiles
user Java/Groovy at runtime. The PySpark-native equivalent takes user
*Python* source defining a function, and applies it either as a
vectorized pandas transform (preferred) or a row map.

Options:
  source_code    : str — python source defining `transform(pdf)` (pandas
                   DataFrame -> pandas DataFrame) or `transform_row(row)`
                   (dict -> dict)
  compile_pattern: 'SOURCE_CODE' (inline) | 'ABSOLUTE_PATH' (file path)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from seatunnel_spark.transforms.base import Transform


class DynamicCompileTransform(Transform):
    NAME = "DynamicCompile"

    def _load_code(self) -> str:
        pattern = str(self.opt("compile_pattern", "SOURCE_CODE")).upper()
        if pattern == "ABSOLUTE_PATH":
            with open(self.require("absolute_path")) as f:
                return f.read()
        return self.require("source_code")

    def apply(self, df: DataFrame) -> DataFrame:
        namespace: dict = {}
        exec(self._load_code(), namespace)  # noqa: S102 — explicit user-code feature
        if "transform" in namespace:
            fn = namespace["transform"]
            probe = fn(df.limit(100).toPandas())
            schema = df.sparkSession.createDataFrame(probe).schema
            return df.mapInPandas(lambda it: (fn(pdf) for pdf in it), schema=schema)
        if "transform_row" in namespace:
            fn = namespace["transform_row"]

            def _map_rows(iterator):
                import pandas as pd

                for pdf in iterator:
                    yield pd.DataFrame([fn(r) for r in pdf.to_dict("records")])

            import pandas as pd

            probe = pd.DataFrame(
                [fn(r) for r in df.limit(100).toPandas().to_dict("records")]
            )
            schema = df.sparkSession.createDataFrame(probe).schema
            return df.mapInPandas(_map_rows, schema=schema)
        raise ValueError(
            "DynamicCompile: source must define transform(pdf) or transform_row(row)"
        )
