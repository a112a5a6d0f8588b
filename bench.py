"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() forces the full plan;
results stay distributed — no driver collect).

Multi-run protocol: after a warm-up pass (codegen compile + file
listing), each query is timed $SPARK_GRAFT_BENCH_RUNS times (default 5)
and the MIN is reported — single runs at sub-second scale showed
±25 % noise across rounds, which made per-query regression rules
unenforceable. The min of 5 is the stable lower envelope of the
plan's true cost on an otherwise-idle machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q_window_top_orders",
    "q_events_hourly",
    "q_agg_stats",
    # transform pipeline
    "t_sql_functions",
    "t_zeta_datetime",
    # training-data ops
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_pairs",
    "text_quality",
    "text_langid",
    "sim_topk",
    # round-2 additions (kept after the original 14 so per-query
    # timings stay comparable across rounds)
    "decontam_ngram",
    "sample_domain_mix",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from seatunnel_spark.session import get_spark

    spark = get_spark("seatunnel-bench")
    qs = entry.queries()

    # warm the JVM + file listing once (excluded from timings)
    entry._t(spark, sf_dir, "lineitem").count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        qs[name](spark, sf_dir).count()  # warm-up: codegen compile + listing
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()  # timed steady-state run
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
