"""Synthesize an sf1-scale bench dataset by 10x key-shifted replication
of /root/testdata/sf0.1 (the driver ships no sf1; this is a
PERFORMANCE dataset — correctness oracles stay on the driver's own
sf0.01 parquet). Key columns are offset per replica so join fan-outs
and group cardinalities scale the way real TPC-H data does:
orderkeys/custkeys/partkeys/suppkeys/doc_ids/vec_ids shift together,
dimension tables (region/nation) stay fixed like dbgen's. Output:
$SPARK_GRAFT_SF1_DIR (default /tmp/seatunnel_sf1), ~10x sf0.1 rows.

Usage: python tools/gen_sf1.py [copies]
       python tools/gen_sf1.py [copies] --zipf [s]

--zipf additionally REMAPS the skew-sensitive keys through a
truncated Zipf(s) (default s=1.2) and writes to $SPARK_GRAFT_SKEW_DIR
(default /tmp/seatunnel_sf1_zipf): the adversarial power-law shape
TPC-H's uniform keys never produce, for benching the in-code hot-key
guards (max_degree, max_basket, max_events, _cap_buckets).

Remap: u = md5-uniform(old_key) in (0,1); rank = ceil(u^(-1/(s-1)))
(the Pareto inverse-CDF whose pmf is ~r^-s); keys whose rank exceeds
the truncation keep their original value. At s=1.2 rank 1 absorbs
~13%% of distinct keys — a real mega-hub/mega-basket/bot-user.
Applied to: lineitem.l_partkey + l_orderkey (hot item, mega-basket),
orders.o_custkey (hub customer in the pagerank graph),
events.user_id (bot entity); documents with rank <= 3 have their
text replaced by one of 3 boilerplate templates (hot MinHash/SimHash
buckets). Deterministic — same input, same skew.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/seatunnel_sf1")

# key columns shifted by replica * stride (stride > max key in sf0.1)
_SHIFT = {
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
# replicated without shift (dimensions stay dimension-sized)
_FIXED = ("region", "nation")


# Zipf remap targets: (table, key column, truncation = max hot rank)
_ZIPF_KEYS = {
    "lineitem": [("l_partkey", 20_000), ("l_orderkey", 150_000)],
    "orders": [("o_custkey", 15_000)],
    "events": [("user_id", 10_000)],
}

_DOC_TEMPLATES = [
    "the quick brown fox jumps over the lazy dog again and again "
    "while the market data pipeline keeps counting tokens forever",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua",
    "all work and no play makes the batch job a dull pipeline all "
    "work and no play makes the batch job a dull pipeline",
]


def _zipf_rank(col, s: float):
    """Deterministic truncated-Zipf rank of a key: md5-uniform u in
    (0,1), rank = ceil(u^(-1/(s-1))) — pmf ~ r^-s. Pure codegen."""
    from pyspark.sql import functions as F

    u = ((F.conv(F.substring(F.md5(col.cast("string")), 1, 13),
                 16, 10).cast("double") % 1_000_000) + 0.5) / 1_000_000.0
    return F.ceil(F.pow(u, -1.0 / (s - 1.0))).cast("long")


def _apply_zipf(df, name: str, s: float):
    from pyspark.sql import functions as F

    for col, cap in _ZIPF_KEYS.get(name, []):
        r = _zipf_rank(F.col(col), s)
        df = df.withColumn(
            col, F.when(r <= cap, r).otherwise(F.col(col))
            .cast(dict(df.dtypes)[col]))
    if name == "documents":
        r = _zipf_rank(F.col("doc_id"), s)
        t = F.col("text")
        for i, tpl in enumerate(_DOC_TEMPLATES):
            t = F.when(r == i + 1, F.lit(tpl)).otherwise(t)
        df = df.withColumn("text", t)
    return df


def main() -> None:
    from pyspark.sql import functions as F

    from seatunnel_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    copies = int(args[0]) if args else 10
    zipf_s = None
    if "--zipf" in sys.argv:
        i = sys.argv.index("--zipf")
        zipf_s = (float(sys.argv[i + 1])
                  if len(sys.argv) > i + 1
                  and not sys.argv[i + 1].startswith("-") else 1.2)
    out_dir = (os.environ.get("SPARK_GRAFT_SKEW_DIR",
                              "/tmp/seatunnel_sf1_zipf")
               if zipf_s is not None else OUT)
    spark = get_spark("gen-sf1")
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        src = f"{SRC}/{name}.parquet"
        dst = f"{out_dir}/{name}.parquet"
        df = spark.read.parquet(src)
        if name in _FIXED:
            df.write.mode("overwrite").parquet(dst)
            continue
        shifts = _SHIFT[name]
        frames = []
        for i in range(copies):
            f = df
            for col, stride in shifts.items():
                f = f.withColumn(
                    col, (F.col(col) + F.lit(i * stride))
                    .cast(dict(df.dtypes)[col]))
            frames.append(f)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        if zipf_s is not None:
            out = _apply_zipf(out, name, zipf_s)
        out.write.mode("overwrite").parquet(dst)
        print(f"{name}: {df.count()} x {copies}"
              + (f" (zipf s={zipf_s})" if zipf_s is not None else ""))
    print(f"dataset at {out_dir}")


if __name__ == "__main__":
    main()
