"""Log PPJoin candidate counts at a given SF dir — the observable for
verdict-r8 #2 ("BENCH shows candidate-count reduction vs r08; log the
candidate counts"): plain prefix index vs +length filter vs
+length+positional, plus the verified output size, printed as one JSON
line and (by the skew bench wrapper) embedded into the BENCH_SKEW
artifact.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ppjoin_candidates.py [t]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from seatunnel_spark.dataops.dedup import (jaccard_prefix_candidates,
                                               jaccard_prefix_pairs)
    from seatunnel_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    spark = get_spark("ppjoin-candidates")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out = {"sf_dir": sf_dir, "threshold": t}
    for tag, kw in [
        ("plain_prefix", dict(length_filter=False,
                              positional_filter=False)),
        ("with_length", dict(positional_filter=False)),
        ("with_length_positional", dict()),
    ]:
        t0 = time.perf_counter()
        out[tag] = jaccard_prefix_candidates(
            d, "doc_id", "text", k=3, threshold=t, **kw).count()
        out[f"{tag}_sec"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    t0 = time.perf_counter()
    out["verified_pairs"] = jaccard_prefix_pairs(
        d, "doc_id", "text", k=3, threshold=t).count()
    out["verified_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
