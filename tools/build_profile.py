"""Per-query BUILD-time profiler (guide §1/§5 — the driver is part of
the query path).

Times ``q.build(spark, sf_dir)`` alone — the py4j plan-construction /
eager-analysis cost, no action — for every bench query (or the names
given). One warm pass first (table() memo, JIT), then min of N.

Usage: python tools/build_profile.py [--runs 3] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeapi_spark.queries import QUERIES  # noqa: E402
from lakeapi_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakeapi-spark-buildprof")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    names = args.names or [n for n, q in QUERIES.items() if q.bench]

    # NOTE: build-only timing UNDERSTATES builders that run actions
    # inside build() (count probes, persist materializations, first()):
    # those show up here as execution time mixed in. That is the honest
    # per-request driver cost either way.
    for name in names:  # warm pass
        QUERIES[name].build(spark, sf_dir)
        spark.catalog.clearCache()
    times: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(args.runs):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name].build(spark, sf_dir)
            dt = time.perf_counter() - t0
            times[name] = min(times[name], dt)
            spark.catalog.clearCache()
    for name in sorted(names, key=lambda n: -times[n]):
        print(f"{times[name]:7.3f}  {name}", flush=True)
    print(f"BUILD TOTAL(min) {sum(times.values()):.3f}  n={len(names)}")


if __name__ == "__main__":
    main()
