"""Per-JOB time attribution for one or more queries (guide §1.1/§7.1).

Runs each named query once warm then once timed (same action as
bench.py), and prints every Spark job of the timed run with its wall
duration, stage names, and task-time totals — pulled from the live UI
REST API. This answers "where do the seconds go" at a granularity the
total cannot: scheduler latency shows up as (wall - task_time/cores),
and per-exchange AQE stage-jobs are each visible.

Usage: python tools/job_profile.py [--warm 2] names...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeapi_spark.queries import QUERIES  # noqa: E402
from lakeapi_spark.session import get_spark  # noqa: E402

from bench import BIG_OUTPUT  # single source of truth for the noop-sink set


def rest(path: str):
    url = f"http://localhost:4040/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakeapi-spark-jobprof")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    sc = spark.sparkContext
    app_id = sc.applicationId

    def run(name: str) -> float:
        q = QUERIES[name]
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        if name in BIG_OUTPUT:
            df.write.mode("overwrite").format("noop").save()
        else:
            df.collect()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # global warm pass over all requested names, bench.py-style
    for _ in range(args.warm):
        for name in args.names:
            run(name)

    for name in args.names:
        before = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
        sc.setJobDescription(name)
        dt = run(name)
        sc.setJobDescription(None)
        jobs = [
            j
            for j in rest(f"applications/{app_id}/jobs")
            if j["jobId"] not in before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: {dt:.3f}s wall, {len(jobs)} jobs ===")
        tot = 0.0
        for j in jobs:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second precision from the GMT strings' .mmm suffix
            ms0 = int(j["submissionTime"][20:23])
            ms1 = int(j["completionTime"][20:23])
            dur = (time.mktime(t1) + ms1 / 1e3) - (time.mktime(t0) + ms0 / 1e3)
            tot += dur
            stages = j.get("stageIds", [])
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s  tasks={j['numCompletedTasks']:>4}"
                f"  stages={len(stages)}  {j.get('description') or j.get('name','')[:60]}"
            )
        print(f"  sum(job walls) = {tot:.3f}s (gaps to {dt:.3f} = driver/planning)")


if __name__ == "__main__":
    main()
