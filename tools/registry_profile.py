"""Registry-wide per-query wall profiler (VERDICT r13 #8).

Times every registered query (build + collect) at sf0.01 — the
full-registry drive's per-query wall, without the DuckDB oracle side —
and prints the slowest N. The bench queries are profiled elsewhere
(tools/profile_bench.py at sf0.1); this surfaces the non-bench tail
that shares the same helpers but is never job-profiled.

Usage: python tools/registry_profile.py [--top 20] [--skip-bench]
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
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--skip-bench", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("lakeapi-spark-registry-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    names = args.names or [
        n
        for n, q in QUERIES.items()
        if not (args.skip_bench and q.bench) and not n.startswith("stream_")
    ]
    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            QUERIES[name].build(spark, sf_dir).collect()
            times[name] = time.perf_counter() - t0
        except Exception as ex:  # noqa: BLE001 - report, keep sweeping
            print(f"ERROR {name}: {ex}", flush=True)
        spark.catalog.clearCache()
    total = sum(times.values())
    print(f"\nslowest {args.top} of {len(times)} (TOTAL {total:.1f}s, single pass, sf={sf_dir}):")
    for name in sorted(times, key=lambda n: -times[n])[: args.top]:
        print(f"{times[name]:7.3f}  {name}", flush=True)


if __name__ == "__main__":
    main()
