"""Embedding-column operators: int8 quantization and distributed
k-means clustering.

Training pipelines ship embedding shards to trainers and cluster them
for curation (SemDeDup-style pruning, domain discovery, IVF coarse
quantizers). Both operators here are pure Catalyst higher-order
functions over `array<float>` columns — no UDFs, no vector library —
so they run JVM-side at scan speed.

100 TB design:
- `quantize_int8` is a single codegen'd projection (4× size cut on the
  wire and at rest; the scale factor travels with each row) — zero
  shuffles, zero driver involvement.
- `kmeans_fit` is classic distributed Lloyd's: centroids live in the
  plan as broadcast literals (k×dim floats), each iteration is ONE
  map-side-combined shuffle of k×dim partial averages — the vectors
  themselves never move and never reach the driver. Determinism knobs
  (`round_to` on distances and means, lowest-index tiebreak) make the
  whole fit replayable bit-for-bit in any engine, which is how the
  DuckDB oracle verifies it.

The reference engine has no vector operators at all (its type system
stops at arrays of scalars — seatunnel-api/.../type/ArrayType.java);
these extend the engine for LLM-corpus work per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  q_col: str = "q", scale_col: str = "scale") -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(127·x_i/maxabs),
    plus the `scale` (maxabs) needed to dequantize (x̂_i = q_i·scale/127).

    One projection, no shuffle. An all-zero vector quantizes to zeros
    with scale 0 (guarded divide). Computation is in double so the
    rounding boundary is engine-stable.
    """
    x = F.col(vec_col).cast("array<double>")
    maxabs = F.array_max(F.transform(x, lambda e: F.abs(e)))
    safe = F.when(maxabs == 0.0, F.lit(1.0)).otherwise(maxabs)
    q = F.transform(x, lambda e: F.round(e * 127.0 / safe).cast("int"))
    return df.withColumns({scale_col: maxabs, q_col: q})


def dequant_error(df: DataFrame, vec_col: str = "embedding",
                  q_col: str = "q", scale_col: str = "scale",
                  out_col: str = "mse") -> DataFrame:
    """Per-row mean squared reconstruction error of the int8 code —
    the quantization-quality audit column (≈ scale²/(12·127²) for
    uniform error). Sequential fold, so cross-engine deterministic."""
    x = F.col(vec_col).cast("array<double>")
    err = F.zip_with(
        x, F.col(q_col),
        lambda e, qi: (e - qi * F.col(scale_col) / F.lit(127.0))
        * (e - qi * F.col(scale_col) / F.lit(127.0)))
    return df.withColumn(
        out_col,
        F.aggregate(err, F.lit(0.0), lambda a, b: a + b) / F.size(x))


def _dist2(vec: Column, centroid: list[float]) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, b: a + b)


def _assign_struct(vec: Column, centroids: list[list[float]],
                   round_to: int | None) -> Column:
    """struct<d,i> of the nearest centroid by squared L2; ties ->
    LOWEST index (array_min on struct<d,i> compares d then i).
    `round_to` rounds distances first so the argmin can't flip on
    last-bit arithmetic differences between engines."""
    scores = []
    for i, c in enumerate(centroids):
        d = _dist2(vec, c)
        if round_to is not None:
            d = F.round(d, round_to)
        scores.append(F.struct(d.alias("d"), F.lit(i).alias("i")))
    return F.array_min(F.array(*scores))


def _assign_expr(vec: Column, centroids: list[list[float]],
                 round_to: int | None) -> Column:
    return _assign_struct(vec, centroids, round_to)["i"]


def kmeans_fit(df: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id", k: int = 8, iters: int = 2,
               round_to: int | None = 6) -> list[list[float]]:
    """Distributed Lloyd's k-means; returns the k×dim centroid matrix.

    Deterministic by construction: init = the k lowest-id vectors (in
    id order), assignment = rounded-distance argmin with lowest-index
    tiebreak, update = per-dim mean rounded to `round_to`. Each
    iteration shuffles only (cluster, dim, partial-avg) triples
    (map-side combined to k×dim rows per partition); only the k×dim
    matrix is ever collected.
    """
    init = (df.select(F.col(id_col).alias("__id"),
                      F.col(vec_col).cast("array<double>").alias("__v"))
            .orderBy("__id").limit(k).collect())
    centroids = [[float(v) for v in r["__v"]] for r in init]
    x = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = df.select(
            _assign_expr(x, centroids, round_to).alias("__c"),
            x.alias("__v"))
        rows = (assigned.select("__c", F.posexplode("__v").alias("__d", "__x"))
                .groupBy("__c", "__d")
                .agg(F.avg("__x").alias("__m"))
                .collect())
        new = [list(c) for c in centroids]  # empty cluster keeps its centroid
        for r in rows:
            m = float(r["__m"])
            new[r["__c"]][r["__d"]] = round(m, round_to) if round_to else m
        centroids = new
    return centroids


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding", out_col: str = "cluster",
                  dist_col: str | None = None,
                  round_to: int | None = 6) -> DataFrame:
    """Label every row with its nearest centroid — a broadcast-literal
    projection (no join, no shuffle). `dist_col` additionally emits
    the (rounded) squared L2 distance to that centroid."""
    x = F.col(vec_col).cast("array<double>")
    s = _assign_struct(x, centroids, round_to)
    out = df.withColumn(out_col, s["i"])
    if dist_col is not None:
        out = out.withColumn(dist_col, s["d"])
    return out


__all__ = ["quantize_int8", "dequant_error", "kmeans_fit", "kmeans_assign"]
