"""Model-based randomized testing of the delta write surface.

Random sequences of append / DV-delete / merge-upsert / merge-delete /
optimize / checkpoint / vacuum run against BOTH the real table
(sources/delta.py) and a driver-side dict model; after every step the
table read must equal the model exactly. This is the strongest
correctness evidence the write path has: any interaction bug between
deletion vectors, copy-on-write merges, compaction, checkpoint replay
and log vacuuming surfaces as a mismatch at the step that broke it."""

from __future__ import annotations

import random

import pytest


def _mk_df(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, p string")


def _p(k: int) -> str:
    return str(k % 4)


def _read(spark, path) -> dict[int, int]:
    from lakeapi_spark.sources.delta import read_delta_fallback

    out = {}
    for r in read_delta_fallback(spark, path).collect():
        assert r.k not in out, f"duplicate key {r.k} in table read"
        assert r.p == _p(r.k), f"partition drift for key {r.k}"
        out[r.k] = r.v
    return out


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    from lakeapi_spark.sources.delta import (
        checkpoint_delta,
        delete_delta,
        merge_delta,
        optimize_delta,
        vacuum_delta,
        write_delta,
    )

    rnd = random.Random(seed)
    path = str(tmp_path / f"model_{seed}")
    model: dict[int, int] = {}
    next_key = 0

    def fresh_keys(n):
        nonlocal next_key
        ks = list(range(next_key, next_key + n))
        next_key += n
        return ks

    # seed commit
    ks = fresh_keys(40)
    write_delta(
        _mk_df(spark, [(k, k * 2, _p(k)) for k in ks]),
        path,
        partition_by=["p"],
    )
    model.update({k: k * 2 for k in ks})

    ops = ["append", "delete", "merge_upsert", "merge_delete", "optimize",
           "checkpoint", "vacuum"]
    history = []
    for step in range(12):
        op = rnd.choice(ops)
        history.append(op)
        if op == "append":
            ks = fresh_keys(rnd.randint(1, 15))
            write_delta(
                _mk_df(spark, [(k, k * 3, _p(k)) for k in ks]),
                path,
                mode="append",
                partition_by=["p"],
            )
            model.update({k: k * 3 for k in ks})
        elif op == "delete":
            m, r = rnd.randint(2, 9), rnd.randint(0, 1)
            delete_delta(spark, path, f"k % {m} = {r}")
            for k in [k for k in model if k % m == r]:
                del model[k]
        elif op in ("merge_upsert", "merge_delete"):
            existing = sorted(model)
            upd = rnd.sample(existing, min(len(existing), rnd.randint(0, 8)))
            new = fresh_keys(rnd.randint(0, 5))
            src_rows = [(k, k * 7, _p(k)) for k in upd + new]
            if not src_rows:
                continue
            if op == "merge_upsert":
                merge_delta(_mk_df(spark, src_rows), path, on=["k"])
                model.update({k: k * 7 for k in upd + new})
            else:
                merge_delta(
                    _mk_df(spark, src_rows),
                    path,
                    on=["k"],
                    when_matched="delete",
                    when_not_matched="ignore",
                )
                for k in upd:
                    del model[k]
        elif op == "optimize":
            optimize_delta(spark, path)
        elif op == "checkpoint":
            checkpoint_delta(spark, path)
        elif op == "vacuum":
            vacuum_delta(spark, path)
        got = _read(spark, path)
        assert got == model, (
            f"seed {seed} diverged after step {step} ({' -> '.join(history)}): "
            f"{len(got)} rows vs model {len(model)}; "
            f"extra={sorted(set(got) - set(model))[:5]} "
            f"missing={sorted(set(model) - set(got))[:5]}"
        )
