"""Z-order (Morton) data layout — multi-dimensional file pruning.

At 100 TB the cheapest query is the one that never reads the file:
parquet scans prune on per-file/row-group min-max statistics, but a
sort on ONE column makes only that column's ranges narrow — a filter
on any other column still touches every file. Interleaving the bits
of k columns into one Morton key and sorting by it makes EVERY
participating column's per-file range narrow (each file covers a
small k-dimensional tile), so selective filters on ANY of the columns
skip most files. This is the layout technique behind Delta/Iceberg
OPTIMIZE ZORDER BY; here it is plain DataFrame algebra: a codegen'd
bit-interleave projection + one range-partitioned sort-write.

The reference engine moves rows and has no layout optimizer — this
extends the lakehouse-write surface (sinks/lakehouse.py) the way the
training-data operators extend transforms.

Determinism: the key is a pure function of the row given the value
bounds, so any engine replays it (the DuckDB oracle recomputes the
same interleave arithmetic); results of queries over z-ordered data
are byte-identical to the unsorted table — layout changes WHERE rows
sit, never WHAT they are.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]


def _scale_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Normalize a numeric column to an integer in [0, 2^bits) given
    its (lo, hi) bounds — constant columns land at 0."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span == 0, F.lit(0.0)) \
        .otherwise((col.cast("double") - lo.cast("double")) / span)
    top = F.lit((1 << bits) - 1)
    return F.least(F.greatest(
        F.floor(frac * top).cast("long"), F.lit(0)), top.cast("long"))


def zorder_key(cols: list[Column], bounds: list[tuple[Column, Column]],
               bits: int = 16) -> Column:
    """Morton key: interleave the top `bits` bits of each scaled
    column (column i contributes bit b to key position b*k + i).
    Pure shift/or arithmetic — whole-stage codegen, zero UDF, and
    trivially replayable in any SQL engine.

    The key lives in a signed 64-bit long, so bits * k must fit in the
    63 value bits: with the old unchecked arithmetic, k=4 at the
    default bits=16 put the top interleave bit in the SIGN bit
    (negative keys sort before all positive — inverting that
    dimension's ordering) and k>=5 wrapped shiftleft mod 64, aliasing
    high bits into low positions. `bits` is therefore auto-reduced to
    63 // k when the requested width doesn't fit (precision loss only
    — 15 bits/dim at k=4 still gives 32k-tile pruning); an explicit
    bits that can NEVER fit (k > 63) raises."""
    k = len(cols)
    if k == 0:
        raise ValueError("zorder_key needs at least one column")
    if k > 63:
        raise ValueError(f"zorder_key supports at most 63 columns, got {k}")
    bits = min(bits, 63 // k)
    scaled = [_scale_to_bits(c, lo, hi, bits)
              for c, (lo, hi) in zip(cols, bounds)]
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * k + i))
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 16, num_files: int | None = None) -> None:
    """Rewrite `df` to parquet at `path` z-ordered on `cols`:
    one stats pass for the per-column bounds (a 1-row broadcast),
    the Morton-key projection, then a range-partitioned sort-write so
    consecutive key ranges land in separate files and parquet footer
    min-max stats become tight k-dimensional tiles. One shuffle total
    (the range exchange) — the same cost as any global sort-write,
    paid once at layout time and amortized over every pruned scan."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = [(F.lit(row[f"__lo_{c}"]), F.lit(row[f"__hi_{c}"]))
              for c in cols]
    key = zorder_key([F.col(c) for c in cols], bounds, bits)
    out = df.withColumn("__z", key)
    out = (out.repartitionByRange(num_files, "__z") if num_files
           else out.repartitionByRange("__z"))
    (out.sortWithinPartitions("__z").drop("__z")
        .write.mode("overwrite").parquet(path))
