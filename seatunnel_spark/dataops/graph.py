"""Iterative graph analytics as DataFrame algebra: PageRank.

Reference parity: the reference has no graph engine; this extends the
training-data-pipeline surface (site/source importance weighting for
crawl corpora, citation-graph scoring) the brief asks for.

Scale shape: each PageRank iteration is exactly one shuffle of
(dst, contribution) pairs — the edge list itself is never moved after
the first degree join, and ranks are a |V|-row table, never collected
to the driver. Dedup-ed edges + out-degrees are computed once and
reused across iterations. At cluster scale, `write_bucketed_edges` +
`pagerank_on_bucketed` make the co-location durable: the edge list is
written bucketed by source ONCE, and every iteration's degree/rank
join reads it pre-partitioned with zero edge-side exchange
(plan-tested in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "write_bucketed_edges", "pagerank_on_bucketed",
           "triangles_on_bucketed", "degree_distribution"]


def _pagerank_iterations(e: DataFrame, iters: int, damping: float,
                         round_to: int) -> DataFrame:
    """Shared fixed-iteration core over a deduped edge frame with
    columns (__src, __dst). One (dst, contribution) shuffle per
    iteration; ranks never collected."""
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select("__dst"))
        .distinct()
    )
    deg = e.groupBy("__src").agg(F.count("*").alias("__deg"))
    n1 = F.broadcast(nodes.agg(F.count("*").cast("double").alias("__n")))
    ranks = nodes.join(n1).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contribs = (
            e.join(deg, "__src")
            .join(ranks.withColumnRenamed("node", "__src"), "__src")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .join(n1)
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                    round_to,
                ).alias("rank"),
            )
        )
    return ranks


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    src: str = "src",
    dst: str = "dst",
    num_buckets: int = 32,
    dedupe: bool = True,
) -> None:
    """Persist a deduped edge list bucketed + sorted by source — the
    durable co-location every ITERATIVE graph algorithm wants: pay the
    edge shuffle ONCE at write time, and every later per-iteration
    rank/degree join hashed on source finds the edges already
    partitioned on disk (zero edge-side exchange, plan-tested). The
    in-memory `pagerank(dedupe=True)` path re-shuffles the edge list
    per run; this is the cluster-scale alternative its docstring
    promises (same write-once/probe-many pattern as
    similarity.write_ivf_index and plans.bucketing.write_bucketed).

    Columns are stored under the canonical internal names (__src,
    __dst) so `pagerank_on_bucketed` consumes the scan with no
    renaming projection between the bucketed FileScan and the joins.
    """
    from seatunnel_spark.plans.bucketing import write_bucketed

    spark = edges.sparkSession
    # qualified names (db.tbl) would turn the orphan-directory cleanup
    # below into a literal "<warehouse>/db.tbl" path that can alias a
    # foreign directory — resolve them properly or not at all
    if "." in table:
        raise ValueError(
            f"write_bucketed_edges takes an unqualified table name "
            f"(got {table!r}); qualified names don't map to a single "
            f"default warehouse path")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # with the in-memory catalog, a previous SESSION's table survives
    # only as an orphaned warehouse directory the DROP above cannot
    # see, and CTAS then fails with LOCATION_ALREADY_EXISTS — clear
    # it. Guard rails: only when the catalog confirms the table does
    # NOT exist (so we never delete a live table's data on a shared
    # warehouse) and only the default location for the unqualified
    # name. A durable metastore on a real cluster never hits this.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, table.lower())
    if (wh and os.path.isdir(loc)
            and not spark.catalog.tableExists(table)):
        shutil.rmtree(loc, ignore_errors=True)
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    if dedupe:
        e = e.distinct()
    write_bucketed(e, table, ["__src"], num_buckets=num_buckets)


def pagerank_on_bucketed(
    spark,
    table: str,
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """PageRank over an edge table written by `write_bucketed_edges`
    -> (node, rank), numerically identical to `pagerank` on the same
    edges (same fixed-iteration, round-per-iteration arithmetic).

    Scale shape vs the in-memory path: the edge list is read already
    hash-partitioned by __src, so per-iteration `edges ⋈ deg ⋈ ranks`
    plans with NO exchange on the edge side — only the |V|-row ranks
    table moves to meet the edges, then the one inherent
    (dst, contribution) shuffle runs. The graph (the 100 TB part)
    never reshuffles, not even once per job."""
    return _pagerank_iterations(spark.table(table), iters, damping,
                                round_to)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
    dedupe: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list -> (node, rank).

    Nodes are the union of endpoints; initial rank is 1/N. Each
    iteration computes r'(v) = (1-d)/N + d * sum over in-edges u->v of
    r(u)/outdeg(u); nodes with no out-edges (dangling) simply leak
    their mass, the classic simplification — feed a symmetrized edge
    list if you need mass conservation. Ranks are rounded to
    `round_to` after every iteration so fixed-iteration runs are
    reproducible bit-for-bit across engines and summation orders
    (same convention as embeddings.kmeans_fit).
    """
    # The deduped edge list feeds degree, the node set, and every
    # iteration: persist() so upstream joins/distinct run ONCE instead
    # of once per consumer. persist (compressed columnar
    # InMemoryRelation, MEMORY_AND_DISK) rather than localCheckpoint:
    # checkpoint blocks are DESERIALIZED row objects (~10x larger) and
    # the truncated lineage cannot recompute an evicted block — at
    # sf10 (60M-row lineitem) the 2x~30M-edge list OOMed a 16g heap
    # and died on the first lost block, while the columnar cache fits
    # and any evicted piece just recomputes. At cluster scale use
    # write_bucketed_edges + pagerank_on_bucketed instead — the
    # durable form of this co-location. Pass dedupe=False when the
    # input is already distinct — e.g. deduped upstream on narrower
    # pre-stringified keys — to skip a full edge shuffle.
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    if dedupe:
        e = e.distinct()
    e = e.persist()
    return _pagerank_iterations(e, iters, damping, round_to)


def triangles_on_bucketed(spark, table: str,
                          max_degree: int | None = 10_000) -> DataFrame:
    """Triangle count over a CANONICAL (src < dst, deduped) edge table
    written by `write_bucketed_edges` -> one row (n_triangles),
    numerically identical to analytics.triangle_count on the same
    edges — the write-once/probe-many form of the wedge join, the
    same durable co-location pagerank_on_bucketed gets.

    Plan shape (the reason this variant exists): the wedge build is a
    SELF-join on __src — both sides read the same bucketed+sorted
    scan, so it plans with ZERO exchange and zero sort. The close
    join's edge side is again the bucketed scan: its bucket key __src
    is a subset of the join keys (__src, __dst), so only the
    wedge-side rows shuffle to meet it (needs
    spark.sql.requireAllClusterKeysForCoPartition=false, a
    session.py default; Spark's own default refuses subset
    co-partitioning and re-shuffles the edge side too). The in-memory form
    (`_closed_wedges`) shuffles the edge list on every run; here the
    graph paid one shuffle at write time and never moves again —
    across any number of runs or jobs.

    Canonical-orientation wedge identity: each triangle a<b<c is
    found exactly once as the wedge (a,b)+(a,c) at its minimum vertex
    closed by the canonical edge (b,c). Orientation trade vs the
    in-memory path: analytics._closed_wedges enumerates in DEGREE
    order (O(m^1.5) on skewed graphs) but must reshuffle to do it;
    this variant keeps the ID order the table was bucketed in, which
    is what makes it exchange-free — prefer it for bounded-degree
    graphs probed by many jobs, prefer the in-memory form for
    power-law graphs (or write the bucketed table from a pre-capped,
    degree-filtered edge list). Super-hub vertices above
    `max_degree` are pre-dropped with the same broadcast anti joins
    as analytics._capped_edges (broadcast joins pass the bucketed
    partitioning through, so the zero-exchange wedge build
    survives)."""
    t = spark.table(table)
    if max_degree is not None:
        hubs = (t.select(F.col("__src").alias("__v"))
                .unionAll(t.select(F.col("__dst").alias("__v")))
                .groupBy("__v").agg(F.count(F.lit(1)).alias("__deg"))
                .filter(F.col("__deg") > max_degree)
                .select("__v"))
        t = (t.join(F.broadcast(hubs), t["__src"] == hubs["__v"],
                    "left_anti")
             .join(F.broadcast(hubs), t["__dst"] == hubs["__v"],
                   "left_anti"))
    x, y = t.alias("x"), t.alias("y")
    wedges = (x.join(y, (F.col("x.__src") == F.col("y.__src"))
                     & (F.col("x.__dst") < F.col("y.__dst")))
              .select(F.col("x.__dst").alias("__src"),
                      F.col("y.__dst").alias("__dst")))
    closed = wedges.join(t, ["__src", "__dst"])
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def degree_distribution(edges: DataFrame, src: str = "src",
                        dst: str = "dst") -> DataFrame:
    """Degree histogram of an undirected graph given as canonical
    edges -> (degree, n_vertices), the first thing to look at before
    any wedge-bound algorithm (triangles, clustering coefficient):
    a power-law tail here is the early warning that Σ deg² is about
    to explode and super-hubs need capping.

    Two map-side-combined aggregations over the edge list (union of
    endpoints -> degree per vertex -> count per degree); the output
    is at most |distinct degrees| rows."""
    ends = (edges.select(F.col(src).alias("v"))
            .unionAll(edges.select(F.col(dst).alias("v"))))
    deg = ends.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_vertices")))
