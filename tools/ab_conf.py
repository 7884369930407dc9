"""Paired A/B of runtime-settable SQL confs (guide §1: measure first).

Host speed here drifts 2-3x within minutes, so sequential full runs of
two configs cannot be compared. This harness interleaves the two arms
INSIDE one session per round — conf A, run query; conf B, run query —
so each pair shares a ~seconds-wide host window, and reports per-query
min per arm plus the pairwise win/loss.

Only works for confs that are runtime-settable (spark.sql.*). Usage:

    python tools/ab_conf.py --rounds 2 \
        --b "spark.sql.adaptive.coalescePartitions.parallelismFirst=false" \
        [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeapi_spark.queries import QUERIES  # noqa: E402
from lakeapi_spark.session import get_spark  # noqa: E402

from bench import BIG_OUTPUT  # single source of truth for the noop-sink set


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--b", action="append", default=[], help="k=v for the B arm")
    ap.add_argument("--a", action="append", default=[], help="k=v for the A arm (default: session defaults)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    b_conf = dict(kv.split("=", 1) for kv in args.b)
    a_conf = dict(kv.split("=", 1) for kv in args.a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("lakeapi-spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    names = args.names or [n for n, q in QUERIES.items() if q.bench]
    defaults = {k: spark.conf.get(k, None) for k in set(a_conf) | set(b_conf)}

    def apply(conf: dict[str, str]) -> None:
        for k, v in defaults.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for k, v in conf.items():
            spark.conf.set(k, v)

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

    # warm both arms once
    for name in names:
        apply(a_conf)
        run(name)
        apply(b_conf)
        run(name)

    best_a: dict[str, float] = {n: float("inf") for n in names}
    best_b: dict[str, float] = {n: float("inf") for n in names}
    wins_b: dict[str, int] = {n: 0 for n in names}
    pairs: dict[str, int] = {n: 0 for n in names}
    for r in range(args.rounds):
        for name in names:
            # alternate which arm goes first to cancel order effects
            order = [("a", a_conf), ("b", b_conf)]
            if (r + hash(name)) % 2:
                order.reverse()
            got = {}
            for arm, conf in order:
                apply(conf)
                got[arm] = run(name)
            best_a[name] = min(best_a[name], got["a"])
            best_b[name] = min(best_b[name], got["b"])
            wins_b[name] += got["b"] < got["a"]
            pairs[name] += 1

    print(f"{'query':42s} {'A_min':>7s} {'B_min':>7s} {'B/A':>6s}  B_wins")
    for name in names:
        ratio = best_b[name] / best_a[name] if best_a[name] else float("nan")
        print(
            f"{name:42s} {best_a[name]:7.3f} {best_b[name]:7.3f} {ratio:6.2f}  "
            f"{wins_b[name]}/{pairs[name]}"
        )
    ta, tb = sum(best_a.values()), sum(best_b.values())
    print(f"TOTAL A {ta:.3f}  B {tb:.3f}  B/A {tb / ta:.3f}")


if __name__ == "__main__":
    main()
