"""Synthesize an sf1-scale bench dataset by 10x key-shifted replication
of /root/testdata/sf0.1 (the driver ships no sf1; this is a
PERFORMANCE dataset — correctness oracles stay on the driver's own
sf0.01 parquet). Key columns are offset per replica so join fan-outs
and group cardinalities scale the way real TPC-H data does:
orderkeys/custkeys/partkeys/suppkeys/doc_ids/vec_ids shift together,
dimension tables (region/nation) stay fixed like dbgen's. Output:
$SPARK_GRAFT_SF1_DIR (default /tmp/seatunnel_sf1), ~10x sf0.1 rows.

Usage: python tools/gen_sf1.py [copies]
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


def main() -> None:
    from pyspark.sql import functions as F

    from seatunnel_spark.session import get_spark

    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("gen-sf1")
    os.makedirs(OUT, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        src = f"{SRC}/{name}.parquet"
        dst = f"{OUT}/{name}.parquet"
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
        out.write.mode("overwrite").parquet(dst)
        print(f"{name}: {df.count()} x {copies}")
    print(f"sf1 dataset at {OUT}")


if __name__ == "__main__":
    main()
