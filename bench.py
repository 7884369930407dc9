#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

- data dir: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
- parallelism: local[$SPARK_GRAFT_CPUS] (default all cores)

Method: session warmed with one tiny action; partitioned copies are
pre-built (storage layout is write-side cost, not query cost); then each
bench-flagged query runs once, timed end-to-end including the driver
Arrow collect for small results. Large-output scans are executed via the
noop sink so we measure compute+IO, not driver pickling of 100k rows —
at scale results land on a sink, they are not collect()ed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakeapi_spark.queries import QUERIES  # noqa: E402
from lakeapi_spark.session import get_spark  # noqa: E402

#: queries whose output is big enough that collect() would measure
#: driver pickling instead of query execution. r13 measurement fix
#: (guide §1.4, declared in OPTIMIZATION_r13.md with the old numbers
#: kept): the four additions return 90-120k rows at sf0.1 and paid a
#: measured 0.2-0.6 s of driver row-pickling per run — noop computes
#: every column of every row and drops the driver transfer, exactly
#: like the original three entries.
BIG_OUTPUT = {
    "partition_prune_direct",
    "dedup_minhash_lsh",
    "delta_delete_dv",
    "feature_hash_docs",
    "channel_sessions_stats",
    "events_sessionize_30m",
    "events_tumbling_5m",
}


def cpu_calibration() -> float:
    """Fixed pure-Python single-thread CPU probe (hashing + integer
    loop — deliberately NO BLAS: numpy's matmul parallelizes across
    whatever cores happen to be free, which would make the probe track
    free-core count instead of per-core speed). Emitted as
    ``calib_sec`` so cross-round bench deltas can be adjudicated
    against host speed: rounds 6→8 showed uniform ±20-25% swings on
    IDENTICAL code (every query, including trivial constant-cost
    probes, moved together and tracked host load), so a raw total is
    only comparable after dividing out this constant."""
    import hashlib

    t0 = time.perf_counter()
    h = b"calib"
    for _ in range(60_000):
        h = hashlib.md5(h).digest()
    s = 0
    for i in range(3_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def _par_calib_worker(_: int) -> float:
    """One slice of the multi-core probe: same kernel shape as
    cpu_calibration at 1/4 weight, run in a separate PROCESS."""
    import hashlib

    t0 = time.perf_counter()
    h = b"calib"
    for _ in range(15_000):
        h = hashlib.md5(h).digest()
    s = 0
    for i in range(750_000):
        s += i
    return time.perf_counter() - t0


PAR_WORKERS = 8


def cpu_calibration_parallel() -> float:
    """Multi-core probe (VERDICT r12 #8): wall-clock of PAR_WORKERS
    concurrent processes each running the 1/4-weight kernel. Round 12
    found an asymmetric host failure mode — multi-core throughput
    degraded 20-25% while the single-thread calib was UNCHANGED — so
    the single-thread probe alone can read `settled` on a host whose
    parallel stages are degraded. On an uncontended 32-core host the
    8 workers run fully parallel and this reads ~= one 1/4-weight
    kernel (~0.035s) + pool spawn overhead; contention shows up as a
    multiple of that."""
    import concurrent.futures

    with concurrent.futures.ProcessPoolExecutor(max_workers=PAR_WORKERS) as ex:
        # first map pays pool spawn (~60-90ms of fork+import noise that
        # would swamp the ~35ms kernel); the timed second map is pure
        # concurrent compute + tiny IPC
        list(ex.map(_par_calib_worker, range(PAR_WORKERS)))
        t0 = time.perf_counter()
        list(ex.map(_par_calib_worker, range(PAR_WORKERS)))
        return round(time.perf_counter() - t0, 3)


#: rows for the CPU-bound scaling canary — sized so the probe runs a
#: few hundred ms at full width (large enough that per-task scheduling
#: is noise, small enough not to distort the bench run)
CANARY_ROWS = 1 << 27


def cpu_canary(spark) -> float:
    """Engine-side CPU-bound scaling probe (VERDICT r13 #2): a wide
    xxhash64 fold over ``CANARY_ROWS`` synthetic rows, partitioned at
    the session's defaultParallelism — pure per-core compute with no
    shuffle and no IO, so its wall time MUST track the core count.

    Why it exists: the real bench queries at sf0.1 are dominated by a
    fixed per-query driver/scheduler floor, so their 8-vs-32-core
    scaling curve is flat — which the driver's heuristic cannot
    distinguish from "the env contract is ignored". The canary makes
    the distinction observable in the artifact itself: a flat QUERY
    curve plus a canary that tracks the core ratio reads
    "driver-latency-bound at this SF", a flat canary would read "env
    ignored"."""
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism
    df = spark.range(0, CANARY_ROWS, 1, par).select(
        F.xxhash64(F.xxhash64(F.xxhash64("id"))).alias("h")
    )
    t0 = time.perf_counter()
    # bit_xor: overflow-free under ANSI mode, cannot be constant-folded
    df.agg(F.expr("bit_xor(h)")).collect()
    return round(time.perf_counter() - t0, 3)


def _affinity_cpus() -> int:
    """Effective core count: the scheduling AFFINITY width, not the
    host's physical count (ADVICE r13) — a taskset/cgroup-limited run
    must not record full width (and thereby replace the full-width
    BENCH_BEST companion, the exact bug the width gate exists for)."""
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def code_fingerprint() -> str:
    """Short content hash of the query catalog, embedded in every
    artifact so BENCH_BEST staleness is detected when queries are
    REIMPLEMENTED (not just added/removed): a same-name-set artifact
    from an older code state must not survive as the best-settled
    record (ADVICE r12)."""
    import hashlib

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "lakeapi_spark", "queries.py"
    )
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(os.path.normpath(sf_dir)).removeprefix("sf") or "0.1")
    spark = get_spark("lakeapi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM / codegen paths once
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    bench_queries = {n: q for n, q in QUERIES.items() if q.bench}

    # pre-build partitioned copies outside the timed section
    from lakeapi_spark.sources.partitioned import partitioned_copy

    partitioned_copy(spark, sf_dir, "lineitem", ["l_returnflag"])

    # pre-build the DV demo table (write-side cost, not query cost):
    # the timed delta_delete_dv run measures the merge-on-read READ
    # path — log replay + roaring decode + broadcast anti-join
    from lakeapi_spark.queries import _dv_demo_table

    _dv_demo_table(spark, sf_dir)

    def run(name: str, q) -> float:
        t0 = time.perf_counter()
        df = q.build(spark, sf_dir)
        if name in BIG_OUTPUT:
            df.write.mode("overwrite").format("noop").save()
        else:
            df.collect()
        return time.perf_counter() - t0

    # the baseline envelope is WARM latency (reference asserts <1.5s on a
    # warm in-process engine): one warm-up pass, then min across three
    # timed ROUNDS (single-pass numbers swing +-50% with JVM GC on
    # local[32]). Rounds are interleaved — all queries in round 1, then
    # all in round 2, ... — so a sustained host-contention burst (observed:
    # back-to-back full runs of identical code at 18.4s vs 28.7s in the
    # round-3 sandbox) cannot poison every sample of one query; the
    # per-query min is taken across temporally-separated rounds.
    # clearCache between queries: operators that persist() intermediates
    # (minhash shingles) must not leak cached partitions into the next
    # query's memory budget.
    for name, q in bench_queries.items():
        run(name, q)  # warm-up: codegen + shuffle-file reuse, untimed
        spark.catalog.clearCache()

    # Capture discipline (VERDICT r10): the recorded artifact must not
    # depend on which host-load window it happened to land in. Every
    # round is bracketed by a calib probe and ALL calibs are embedded;
    # if even the best calib stays above CALIB_SETTLED (a contended
    # window — BENCH_r10 recorded 0.146 while settled runs measured
    # 0.118-0.136), up to EXTRA_ROUNDS additional full passes run, so
    # the per-query min gets a shot at a settled window. If the host
    # never settles, host_contended=true says so IN the artifact
    # instead of leaving adjudication to BENCHNOTES archaeology.
    CALIB_SETTLED = 0.140
    # multi-core probe threshold (VERDICT r12 #8): warmed 8-process
    # sweep measured 0.046-0.083 on a settled host (min of the ~4+
    # bracketing probes lands <= 0.065); the r12 degraded-host episode
    # (-20-25% multi-core at unchanged single-thread calib) maps to
    # sustained readings >= ~0.085
    PAR_CALIB_SETTLED = 0.070
    EXTRA_ROUNDS = 5
    calibs: list[float] = [cpu_calibration()]
    par_calibs: list[float] = [cpu_calibration_parallel()]
    # engine-side scaling canary: one warm run, then min of the
    # bracketing timed runs (same discipline as the calib probes)
    cpu_canary(spark)
    canaries: list[float] = [cpu_canary(spark)]
    timings: dict[str, float] = {n: float("inf") for n in bench_queries}

    def timed_round() -> None:
        for name, q in bench_queries.items():
            timings[name] = min(timings[name], run(name, q))
            spark.catalog.clearCache()  # drop operator-persisted intermediates
        calibs.append(cpu_calibration())
        par_calibs.append(cpu_calibration_parallel())
        canaries.append(cpu_canary(spark))

    def contended() -> bool:
        return min(calibs) > CALIB_SETTLED or min(par_calibs) > PAR_CALIB_SETTLED

    rounds = 0
    for _ in range(3):
        timed_round()
        rounds += 1
    while contended() and rounds < 3 + EXTRA_ROUNDS:
        timed_round()
        rounds += 1
    timings = {n: round(t, 3) for n, t in timings.items()}

    total = round(sum(timings.values()), 3)
    artifact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "calib_sec": min(calibs),
        "calibs": [round(c, 3) for c in calibs],
        "par_calib_sec": min(par_calibs),
        "par_calibs": [round(c, 3) for c in par_calibs],
        "rounds": rounds,
        "host_contended": contended(),
        "code_fingerprint": code_fingerprint(),
        # the parallelism the session ACTUALLY runs at (must equal the
        # cpus field when the env contract holds) plus the CPU-bound
        # scaling canary — see cpu_canary() for why a flat real-query
        # scaling curve needs this to be adjudicable
        "parallelism": spark.sparkContext.defaultParallelism,
        "cpu_canary_sec": min(canaries),
        "canary_rows": CANARY_ROWS,
        # the parallelism this run measured at — the driver also runs
        # the bench at reduced core counts for scaling curves, and a
        # cross-width capture must never replace the full-width
        # companion (r13: an 8-core run silently replaced a 32-core
        # BENCH_BEST because the rule had no width field)
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", _affinity_cpus())),
    }
    line = json.dumps(artifact)
    print(line)

    # Capture discipline, part 2 (VERDICT r11 #3): two consecutive
    # official captures landed in contended windows despite the
    # auto-extension. Persist the best SETTLED run as a committed
    # companion (BENCH_BEST.json) so a contended official artifact is
    # adjudicated against a settled measurement of the same code, not
    # against BENCHNOTES archaeology. Replacement rule: take the new
    # run if the existing companion is missing/contended, if its
    # query set is stale (code added/removed bench entries), or if
    # the new SETTLED total is lower — the single-thread calib cannot
    # rank two settled runs (measured: a calib-0.133 run read 20%
    # slower than a calib-0.137 run because only MULTI-core
    # throughput was degraded), so among settled runs the total is
    # the comparator.
    if not artifact["host_contended"] and sf == 0.1:
        best_path = os.environ.get(
            "SPARK_GRAFT_BENCH_BEST",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BEST.json"),
        )
        try:
            with open(best_path) as f:
                prev = json.load(f)
        except Exception:
            prev = None
        if should_replace_best(prev, artifact, _affinity_cpus()):
            with open(best_path, "w") as f:
                f.write(line + "\n")


def should_replace_best(prev, artifact: dict, full_width_cpus: int) -> bool:
    """BENCH_BEST replacement predicate for a SETTLED candidate run.

    Only FULL-width runs may own the companion (it exists to
    adjudicate the official full-width artifact; the driver also runs
    the bench at reduced core counts for scaling curves, and r13 found
    an 8-core run silently replacing a 32-core companion). A
    full-width candidate replaces when the existing companion is
    missing, contended, stale (query-set, code-fingerprint, or width
    mismatch — totals are only comparable between same-width settled
    runs), or simply slower."""
    if artifact["cpus"] != full_width_cpus:
        return False
    return (
        prev is None
        or prev.get("host_contended", True)
        or set(prev.get("queries", {})) != set(artifact["queries"])
        # fingerprint mismatch == the catalog changed since the
        # companion was captured (reimplemented queries don't move
        # the name set) — treat as stale (ADVICE r12)
        or prev.get("code_fingerprint") != artifact["code_fingerprint"]
        # a missing/different width also means stale (r13)
        or prev.get("cpus") != artifact["cpus"]
        or artifact["value"] < prev.get("value", float("inf"))
    )


if __name__ == "__main__":
    main()
