"""CLI entry point — the `bin/seatunnel.sh --config job.conf` analog.

Usage:
  python -m seatunnel_spark --config job.conf [-i key=value ...] [--master local[*]]

Accepts HOCON (.conf/.hocon), JSON (.json), and SQL-config (.sql) job
files (reference: docs/en/concept/config.md, sql-config.md).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="seatunnel-spark")
    ap.add_argument("--config", "-c", required=True, help="job config file")
    ap.add_argument("-i", "--variable", action="append", default=[],
                    metavar="K=V", help="config variable substitution")
    ap.add_argument("--master", default=None, help="spark master override")
    args = ap.parse_args(argv)

    variables = {}
    for kv in args.variable:
        k, _, v = kv.partition("=")
        variables[k] = v

    from seatunnel_spark.job.engine import JobEngine
    from seatunnel_spark.job.spec import JobSpec
    from seatunnel_spark.session import get_spark

    spec = JobSpec.from_file(args.config, variables)
    extra = {}
    if spec.env.get("parallelism"):
        extra["spark.default.parallelism"] = str(spec.env["parallelism"])
    spark = get_spark(spec.env.get("job.name", "seatunnel-spark-job"), extra)

    t0 = time.time()
    JobEngine(spark).run(spec)
    print(f"job finished in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
