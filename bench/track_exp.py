#!/usr/bin/env python
"""Tracker-body straight-line experiment (dev tool).

track_update carries two lax.cond constructs per scan step: the
empty-frame branch and the death-frame compaction branch. Under the
table's layout invariant both straight-line equivalents are
semantically identical (an all-invalid detection frame degenerates
update_with_dets to exactly update_no_dets's state transition, and
compact() with still == active is the identity incl. the zeroed free
slots), so the conds only buy skipped work — but each cond also costs
per-step control sequencing at 16-wide shapes. This measures both
variants on the chip over (a) a bench-like all-valid sequence and (b) a
churn sequence with deaths + empty frames, asserting bit-equal states
and rows first.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, args, iters=16, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def make_scan(update, unroll=8):
    def g(ts, dets, dv, fi):
        def step(s, inp):
            d, v, f = inp
            s, rows, rv = update(
                s, d, v, f, max_dist=80.0, death_patience=5,
                assigner="hungarian",
            )
            return s, (rows, rv)

        return lax.scan(step, ts, (dets, dv, fi), unroll=unroll)

    return jax.jit(g)


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    from tpuva.track import init_track_state, track_update
    from tpuva.track.table import track_update_straightline

    N, T, D = 256, 16, 8
    rng = np.random.default_rng(0)
    base = rng.uniform(100, 900, (D, 2)).astype(np.float32)
    drift = rng.normal(0, 2, (N, D, 2)).astype(np.float32).cumsum(0)
    dets = np.concatenate(
        [base[None] + drift, np.full((N, D, 1), 800, np.float32)], axis=2
    )
    # (a) bench-like: 6 valid per frame throughout
    dv_a = np.zeros((N, D), bool)
    dv_a[:, :6] = True
    # (b) churn: blobs drop out for > patience windows and return; some
    # frames fully empty
    dv_b = dv_a.copy()
    for k in range(6):
        dv_b[10 + 30 * k:25 + 30 * k, k % 6] = False
    dv_b[40:44, :] = False
    fidx = jnp.arange(N, dtype=jnp.int32)
    ts0 = init_track_state(T)

    for name, dv in (("bench", dv_a), ("churn", dv_b)):
        dvj = jnp.asarray(dv)
        dj = jnp.asarray(dets)
        f_cond = make_scan(track_update)
        f_line = make_scan(track_update_straightline)
        (s1, o1) = f_cond(ts0, dj, dvj, fidx)
        (s2, o2) = f_line(ts0, dj, dvj, fidx)
        for a, b in zip(jax.tree_util.tree_leaves((s1, o1)),
                        jax.tree_util.tree_leaves((s2, o2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        print(f"{name}: bit-equal", flush=True)
        dt, _ = timeit(f_cond, (ts0, dj, dvj, fidx))
        print(f"{name} cond        : {dt*1e3:7.2f} ms/batch "
              f"({dt/N*1e6:6.2f} us/step)", flush=True)
        dt, _ = timeit(f_line, (ts0, dj, dvj, fidx))
        print(f"{name} straightline: {dt*1e3:7.2f} ms/batch "
              f"({dt/N*1e6:6.2f} us/step)", flush=True)


if __name__ == "__main__":
    main()
