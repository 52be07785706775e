#!/usr/bin/env python
"""Probe: VPU throughput of pltpu.roll + add at f32 vs int16/uint16 vs
int32 on the real chip (dev tool). Decides whether the fused kernel's
binomial blur cascade should run its integer partial sums at 16-bit
width (2 elements/lane -> half the VPU cycles) — sums stay exact:
row pass <= 255*16 = 4080 (i16 ok), both passes <= 65280 (u16 ok).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def make_cascade(dtype, SH, SW, reps):
    """Kernel: load u8 tile, cast to dtype, run `reps` x the 16-op k=5
    two-axis cascade, write low byte back (forces the work to be live)."""

    def kernel(x_ref, o_ref):
        f = x_ref[:].astype(jnp.int32).astype(dtype)
        acc = f

        def body(r, acc):
            f = acc
            for axis in (1, 0):
                for d in range(2):
                    f = f + pltpu.roll(f, 1, axis=axis)
                for d in range(2):
                    f = f + pltpu.roll(f, SH - 1 if axis == 0 else SW - 1,
                                       axis=axis)
            if dtype == jnp.float32:
                f = f * dtype(2.0 ** -8)
            else:
                f = (f.astype(jnp.int32) >> 8).astype(dtype)
            return f

        acc = lax.fori_loop(0, reps, body, acc)
        o_ref[:] = acc.astype(jnp.int32).astype(jnp.uint8)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SH, SW), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(x)

    return run


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    SH, SW = 112, 1152
    reps = 512  # amortize dispatch: ~16*reps full-tile ops
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (SH, SW), np.uint8)
    )
    for name, dt in [
        ("float32", jnp.float32),
        ("int32", jnp.int32),
        ("int16", jnp.int16),
        ("uint16", jnp.uint16),
    ]:
        try:
            fn = make_cascade(dt, SH, SW, reps)
            t, out = timeit(fn, (x,), iters=4, warmup=1)
            ops = 16 * reps
            el = SH * SW
            print(f"{name:8s}: {t*1e3:8.2f} ms/call  "
                  f"{t/ops*1e9:7.1f} ns/full-tile-op  "
                  f"({el*ops/t/1e12:.2f} Telem/s)")
        except Exception as e:
            print(f"{name:8s}: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
