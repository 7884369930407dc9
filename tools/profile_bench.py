"""Per-query profiling harness for the optimization rounds (guide §1).

For every bench-flagged query (or the names given on argv) at
$SPARK_GRAFT_SF_DIR: one warm-up run, then N timed runs (same action
as bench.py: collect / noop), Spark job count per run (statusTracker
via job group), and `.explain("formatted")` dumped to
plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/profile_bench.py [--runs 3] [--tag r13] [--suffix before] [names...]

Prints one line per query: name, min/median seconds, #jobs, and a
total at the end. This is a diagnostic tool, not the official bench —
bench.py stays the artifact of record.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeapi_spark.queries import QUERIES  # noqa: E402
from lakeapi_spark.session import get_spark  # noqa: E402

from bench import BIG_OUTPUT  # single source of truth for the noop-sink set


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakeapi-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    names = args.names or [n for n, q in QUERIES.items() if q.bench]
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag
    )
    os.makedirs(plans_dir, exist_ok=True)

    sc = spark.sparkContext

    def run(name: str, tag: str) -> tuple[float, int]:
        q = QUERIES[name]
        sc.setJobGroup(tag, name)
        sc.setJobDescription(name)
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        if name in BIG_OUTPUT:
            df.write.mode("overwrite").format("noop").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup("", "")
        spark.catalog.clearCache()
        return dt, jobs

    # bench.py methodology: one full warm pass (JIT + codegen — a cold
    # JVM reads 2-3x slow for the first ~60s of query work), then
    # interleaved timed rounds, min per query across rounds.
    for name in names:
        run(name, f"{name}-warm")
    times: dict[str, list[float]] = {n: [] for n in names}
    jobs: dict[str, int] = {}
    for i in range(args.runs):
        for name in names:
            dt, nj = run(name, f"{name}-{i}")
            times[name].append(dt)
            jobs[name] = nj
    for name in names:
        if not args.no_plans:
            q = QUERIES[name]
            try:
                plan = q.build(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    q.build(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
        best = min(times[name])
        med = statistics.median(times[name])
        print(f"{best:7.3f}  med {med:7.3f}  jobs {jobs[name]:3d}  {name}", flush=True)

    print(f"TOTAL(min) {sum(min(t) for t in times.values()):.3f}  n={len(names)}")


if __name__ == "__main__":
    main()
