"""FakeSource — deterministic schema-driven row generator.

Reference: connector-fake (FakeDataGenerator.java:62-120,
config/FakeOption.java:30-213): row.num, split.num, per-type min/max
ranges, templates, explicit `rows`.

Spark-native design: `spark.range(row.num)` gives a distributed,
splittable id space (the analog of the reference's SourceSplit
enumerator — split.num maps to range partitions); every column is a
deterministic Catalyst expression of `id`, so output is identical for
any parallelism — exactly the property the reference's seeded
generator has, but fully JVM-side and scalable to any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from seatunnel_spark.sources.base import Source
from seatunnel_spark.types import parse_schema


def _gen_column(field: T.StructField, opts: dict, seed: int):
    """Deterministic generator expression for one field, driven by `id`.
    Per-type range/template options and defaults mirror FakeOption.java
    (tinyint/smallint/int/bigint/float/double .min/.max/.template)."""
    dt = field.dataType
    # xxhash64 gives a stable 64-bit stream per (id, column, seed).
    h = F.abs(F.xxhash64(F.col("id"), F.lit(field.name), F.lit(seed)))

    def template(prefix):
        tpl = opts.get(f"{prefix}.template")
        if tpl:
            arr = F.array(*[F.lit(x) for x in tpl])
            return F.element_at(arr, (h % F.lit(len(tpl)) + 1).cast("int"))
        return None

    def ranged(prefix, lo_def, hi_def):
        t = template(prefix)
        if t is not None:
            return t
        lo = int(opts.get(f"{prefix}.min", lo_def))
        hi = int(opts.get(f"{prefix}.max", hi_def))
        span = max(hi - lo, 1)
        return (h % F.lit(span)) + F.lit(lo)

    def franged(prefix, hi_def):
        t = template(prefix)
        if t is not None:
            return t
        lo = float(opts.get(f"{prefix}.min", 0.0))
        hi = float(opts.get(f"{prefix}.max", hi_def))
        frac = (h % F.lit(1_000_000)) / F.lit(1_000_000.0)
        return F.lit(lo) + frac * F.lit(hi - lo)

    if isinstance(dt, T.ByteType):
        return ranged("tinyint", 0, 127).cast(dt)
    if isinstance(dt, T.ShortType):
        return ranged("smallint", 0, 32767).cast(dt)
    if isinstance(dt, T.IntegerType):
        return ranged("int", 0, 2**31 - 1).cast(dt)
    if isinstance(dt, T.LongType):
        return ranged("bigint", 0, 2**63 - 1).cast(dt)
    if isinstance(dt, T.FloatType):
        return franged("float", 3.4e38).cast(dt)
    if isinstance(dt, T.DoubleType):
        return franged("double", 1.7e308).cast(dt)
    if isinstance(dt, T.DecimalType):
        frac = (h % F.lit(10 ** min(dt.precision, 15))) / F.lit(float(10**dt.scale))
        return frac.cast(dt)
    if isinstance(dt, T.BooleanType):
        return (h % 2 == 0)
    if isinstance(dt, T.StringType):
        length = int(opts.get("string.length", 8))
        template = opts.get("string.template")
        if template:
            arr = F.array(*[F.lit(str(x)) for x in template])
            return F.element_at(arr, (h % F.lit(len(template)) + 1).cast("int"))
        return F.substring(F.sha2(F.concat(F.lit(field.name), F.col("id").cast("string"),
                                           F.lit(seed)), 256), 1, length)
    if isinstance(dt, T.BinaryType):
        # the reference's randomBytes is randomAlphabetic(...).getBytes()
        # — always PRINTABLE ASCII (FakeDataRandomUtils.java:63), which
        # downstream text renderings (excel row-joins, csv) rely on
        return F.encode(
            F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 8),
            "UTF-8")
    if isinstance(dt, T.DateType):
        return F.date_add(F.to_date(F.lit("2024-01-01")), (h % 365).cast("int"))
    if hasattr(T, "TimeType") and isinstance(dt, T.TimeType):
        return F.date_format(
            F.timestamp_seconds(h % F.lit(86400)), "HH:mm:ss").cast(dt)
    if isinstance(dt, T.TimestampType):
        return F.timestamp_seconds(F.lit(1704067200) + (h % F.lit(86400 * 365)))
    if isinstance(dt, T.ArrayType):
        inner = _gen_column(T.StructField(field.name + "_e", dt.elementType), opts, seed)
        # float arrays honor vector.dimension (the milvus confs declare
        # float_vector columns sized by it — FakeOption VECTOR_DIMENSION)
        size = int(opts.get("vector.dimension", opts.get("array.size", 3))
                   if isinstance(dt.elementType, (T.FloatType,
                                                  T.DoubleType))
                   else opts.get("array.size", 3))
        return F.array(*[inner for _ in range(size)])
    if isinstance(dt, T.MapType):
        k = _gen_column(T.StructField(field.name + "_k", dt.keyType), opts, seed)
        v = _gen_column(T.StructField(field.name + "_v", dt.valueType), opts, seed + 1)
        return F.create_map(k, v)
    if isinstance(dt, T.StructType):
        return F.struct(
            *[
                _gen_column(f, opts, seed + i).alias(f.name)
                for i, f in enumerate(dt.fields)
            ]
        )
    if isinstance(dt, T.NullType):
        return F.lit(None)
    raise ValueError(f"FakeSource: no generator for type {dt}")


def _coerce(value, dt: T.DataType):
    """Parse a config-literal row value into the declared Spark type —
    the FakeDataGenerator conversion (connector-fake/.../FakeDataGenerator.java):
    decimals/dates/timestamps arrive as strings, bytes as base64."""
    if value is None:
        return None
    if isinstance(dt, T.DecimalType):
        import decimal

        return decimal.Decimal(str(value))
    if isinstance(dt, T.BinaryType):
        if isinstance(value, str):
            import base64

            return bytearray(base64.b64decode(value))
        return bytearray(value)
    if isinstance(dt, T.DateType):
        import datetime

        return (value if not isinstance(value, str)
                else datetime.date.fromisoformat(value))
    if hasattr(T, "TimeType") and isinstance(dt, T.TimeType):
        import datetime

        return (value if not isinstance(value, str)
                else datetime.time.fromisoformat(value))
    if isinstance(dt, T.TimestampType):
        import datetime

        if value == "CURRENT_TIMESTAMP":  # prometheus_remote_write.conf
            return datetime.datetime.now()
        return (value if not isinstance(value, str)
                else datetime.datetime.fromisoformat(value))
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(value)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(value)
    if isinstance(dt, T.ArrayType):
        return [_coerce(v, dt.elementType) for v in value]
    if isinstance(dt, T.MapType):
        return {_coerce(k, dt.keyType): _coerce(v, dt.valueType)
                for k, v in dict(value).items()}
    if isinstance(dt, T.StructType):
        vals = list(value.values()) if isinstance(value, dict) else list(value)
        return tuple(_coerce(v, f.dataType) for v, f in zip(vals, dt.fields))
    return value


# FakeSource row kind spellings (RowKind.java:21-47)
_ROW_KINDS = {"INSERT": "+I", "UPDATE_BEFORE": "-U",
              "UPDATE_AFTER": "+U", "DELETE": "-D"}


class FakeSource(Source):
    NAME = "FakeSource"

    def read(self, spark: SparkSession) -> DataFrame:
        tables_configs = self.opt("tables_configs")
        if tables_configs:
            # Multi-table FakeSource (copy_transform_multi_table.conf:26):
            # one source declares N tables; the engine routes by table id.
            out: dict[str, DataFrame] = {}
            for tc in tables_configs:
                sub = {k: v for k, v in self.options.items()
                       if k != "tables_configs"}
                sub.update(tc)
                tid = (tc.get("schema") or {}).get("table") or f"table{len(out)}"
                out[tid] = FakeSource(sub).read(spark)
            return out
        schema_opt = self.opt("schema") or {}
        fields = schema_opt.get("fields") or self.opt("fields")
        if not fields and schema_opt.get("columns"):
            # List-of-columns schema form (schema-feature.md:118-139).
            fields = {c["name"]: c["type"] for c in schema_opt["columns"]}
        if not fields:
            raise ValueError("FakeSource: schema.fields required")
        schema = parse_schema(fields)
        explicit_rows = self.opt("rows")
        # rows = [] DECLARED empty means "no rows" (the paimon
        # changelog ddl conf creates a table with an empty batch) —
        # only an ABSENT rows option falls back to the generator
        if explicit_rows is not None:
            data = [
                tuple(_coerce(v, f.dataType)
                      for v, f in zip(r["fields"], schema.fields))
                for r in explicit_rows
            ]
            kinds = [str(r.get("kind", "INSERT")).upper() for r in explicit_rows]
            if any(k != "INSERT" for k in kinds):
                from seatunnel_spark.types import ROW_KIND_COL

                # a changelog feed's row order IS its event order —
                # stamp the position as __offset so keyed sinks resolve
                # last-event-per-key deterministically regardless of
                # partition layout (changelog sinks drop the column)
                schema = schema.add(ROW_KIND_COL, T.StringType()) \
                    .add("__offset", T.LongType())
                data = [d + (_ROW_KINDS.get(k, "+I"), i)
                        for i, (d, k) in enumerate(zip(data, kinds))]
            return spark.createDataFrame(data, schema=schema)
        # Reference default is 5 rows (FakeOption.java:36-40)
        num = int(self.opt("row.num", 5))
        splits = int(self.opt("split.num", 0)) or None
        seed = int(self.opt("seed", 42))
        base = spark.range(0, num, numPartitions=splits)
        cols = [
            _gen_column(f, self.options, seed + i).alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
        return base.select(*cols)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        # Explicit `rows` in a STREAMING job (the paimon changelog
        # confs: job.mode=Streaming with a declared +I/-U/+U/-D list)
        # emit exactly the declared changelog as one bounded microbatch
        # — the reference's FakeSource plays its row list once and the
        # IT cancels the job; random generation would replace the
        # declared events entirely.
        if self.opt("rows") is not None:
            return self.read(spark)
        # Bounded-as-stream: the rate source drives ids, same generators apply.
        num = int(self.opt("row.num", 5))
        rate = spark.readStream.format("rate").option(
            "rowsPerSecond", int(self.opt("rows.per.second", 100))
        ).load()
        schema_opt = self.opt("schema") or {}
        fields = schema_opt.get("fields") or self.opt("fields")
        if not fields and schema_opt.get("columns"):
            fields = {c["name"]: c["type"] for c in schema_opt["columns"]}
        if not fields:
            raise ValueError("FakeSource: schema.fields required")
        schema = parse_schema(fields)
        seed = int(self.opt("seed", 42))
        base = rate.withColumnRenamed("value", "id").filter(F.col("id") < num)
        cols = [
            _gen_column(f, self.options, seed + i).alias(f.name)
            for i, f in enumerate(schema.fields)
        ]
        return base.select(*cols)
