#!/usr/bin/env python
"""Probe: per-op cost of the fused kernel's building blocks on the real
chip (dev tool): adds, muls, sublane (axis-0) rolls, lane (axis-1) rolls,
and roll+add pairs, at f32 on the fused kernel's tile shape. Locates
where the blur's 8.7 ms/batch actually goes (rolls vs ALU)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def bench_pair(name, body, SH, SW, n_ops, r1=4096, r2=65536):
    """Slope timing: per-op cost from the delta between two rep counts,
    cancelling the ~7 ms per-call dispatch+sync tunnel overhead."""
    t1 = bench_body(name, body, SH, SW, r1, n_ops)
    t2 = bench_body(name, body, SH, SW, r2, n_ops)
    per_op = (t2 - t1) / ((r2 - r1) * n_ops)
    el = SH * SW
    print(f"{name:26s}: {per_op*1e9:8.1f} ns/op  "
          f"({el/per_op/1e12:5.2f} Telem/s)")
    return per_op


def bench_body(name, body, SH, SW, reps, n_ops):
    def kernel(x_ref, o_ref):
        f = x_ref[:].astype(jnp.int32).astype(jnp.float32)

        def step(r, f):
            return body(f) + 1e-7  # defeat loop-invariant hoisting

        f = lax.fori_loop(0, reps, step, f)
        o_ref[:] = f.astype(jnp.int32).astype(jnp.uint8)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SH, SW), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(x)

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 200, (SH, SW), np.uint8)
    )
    t, _ = timeit(run, (x,))
    return t


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    SH, SW = 112, 1152
    reps = 256

    bench_pair("add f+f", lambda f: f + f, SH, SW, 1)
    bench_pair("mul f*c", lambda f: f * 1.0001, SH, SW, 1)
    bench_pair(
        "roll axis0 (sublane)",
        lambda f: pltpu.roll(f, 1, axis=0), SH, SW, 1,
    )
    bench_pair(
        "roll axis1 (lane)",
        lambda f: pltpu.roll(f, 1, axis=1), SH, SW, 1,
    )
    bench_pair(
        "roll axis1 by 8",
        lambda f: pltpu.roll(f, 8, axis=1), SH, SW, 1,
    )
    bench_pair(
        "roll0 + add",
        lambda f: f + pltpu.roll(f, 1, axis=0), SH, SW, 2,
    )
    bench_pair(
        "roll1 + add",
        lambda f: f + pltpu.roll(f, 1, axis=1), SH, SW, 2,
    )
    # slice-based lane shift (halo makes a 1-px narrower read legal):
    # read two static overlapping slices, add, write back padded
    def slice_shift(f):
        a = f[:, 0 : SW - 128]
        b = f[:, 1 : SW - 127]
        s = a + b
        return jnp.pad(s, ((0, 0), (0, 128)))

    bench_pair("slice1+add (unaligned)", slice_shift, SH, SW, 2)

    # the actual k=5 two-axis cascade, one rep = 16 ops
    def cascade(f):
        for axis in (1, 0):
            for d in range(2):
                f = f + pltpu.roll(f, 1, axis=axis)
            for d in range(2):
                f = f + pltpu.roll(
                    f, (SH - 1) if axis == 0 else (SW - 1), axis=axis
                )
        return f * (2.0 ** -8)

    bench_pair("k5 cascade (17 ops)", cascade, SH, SW, 17)


if __name__ == "__main__":
    main()
