#!/usr/bin/env python
"""Probe: cost of the fused kernel's raw-window REPOSITION building
blocks on the real chip (dev tool).

Per frame the kernel does: u8 window -> i32 cast -> DYNAMIC sublane roll
-> slice -> f32 store (fused_segment.py body()). The roll amount `ar` is
a function of the grid row only and takes ~3 distinct values at 1080p,
so it COULD be a static roll under a pl.when chain. This probe
slope-times the building blocks on the production window shape
(152, 1920) to see what static-amount rolls / skipping casts would buy.

Pattern per bench/roll_probe.py: the array rides the fori_loop carry so
reps can't be hoisted; slope between two rep counts cancels the
dispatch+sync tunnel overhead.
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


def timeit(fn, args, iters=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


RL, CL = 152, 1920  # fused raw window at 1080p fullwidth


def bench_case(name, body, n_ops, dtype=jnp.int32, r1=4096, r2=65536):
    def make(reps):
        def kernel(x_ref, o_ref):
            f = x_ref[:].astype(dtype)

            def step(r, f):
                return body(f, r)

            f = lax.fori_loop(0, reps, step, f)
            o_ref[:] = f.astype(jnp.int32).astype(jnp.uint8)

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((RL, CL), jnp.uint8),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=jax.default_backend() != "tpu",
            )(x)

        return run

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 200, (RL, CL), np.uint8)
    )
    try:
        t1, _ = timeit(make(r1), (x,))
        t2, _ = timeit(make(r2), (x,))
    except Exception as e:
        print(f"{name:34s}: FAIL {str(e)[:90]}", flush=True)
        return None
    per = (t2 - t1) / ((r2 - r1) * n_ops)
    el = RL * CL
    print(
        f"{name:34s}: {per*1e9:8.1f} ns/op ({el/per/1e12:5.2f} Telem/s)",
        flush=True,
    )
    return per


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    bench_case("i32 add (baseline)", lambda f, r: f + 1, 1)
    bench_case(
        "i32 static roll26 + add",
        lambda f, r: pltpu.roll(f, 26, axis=0) + 1, 2,
    )
    bench_case(
        "i32 dynamic roll + add",
        lambda f, r: pltpu.roll(f, r % RL, axis=0) + 1, 2,
    )
    bench_case(
        "i32 dyn-uniform roll + add",  # same dynamic amount each rep,
        # still traced (loop-carried scalar can't constant-fold)
        lambda f, r: pltpu.roll(f, (r - r) + 26, axis=0) + 1, 2,
    )
    bench_case(
        "f32 cast-hop f->i->f + add",
        lambda f, r: f.astype(jnp.int32).astype(jnp.float32) + 1.0, 3,
        dtype=jnp.float32,
    )
    bench_case(
        "f32 static roll + add",
        lambda f, r: pltpu.roll(f, 26, axis=0) + 1.0, 2,
        dtype=jnp.float32,
    )


if __name__ == "__main__":
    main()
