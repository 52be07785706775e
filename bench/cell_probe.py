#!/usr/bin/env python
"""Probe: Mosaic support + cost of sublane stride-2 extract/interleave
(dev tool). The planned cell-level CCL sweep (2-row cells = the scan
key's row pairs; a vertical pixel pair is an 8-conn clique, so cell
labels are exact) needs, per frame-tile visit:

  extract:    top = x[0::2, :], bot = x[1::2, :]    (SH, SW) -> (SH/2, SW)
  interleave: y[0::2] = a, y[1::2] = b               back to (SH, SW)

both as in-kernel VPU ops. This measures them against a full-height
roll+min baseline to decide whether the halved sweep pays for the
pack/unpack, and whether Mosaic lowers them at all.

VERDICT (measured on the v5e, round 4): the idea is DEAD on this
toolchain. Marginal cell ops do cost ~52% of full-height ops
(baseline_sweepish 41.6 us vs cell_sweepish 34.7 us at 64 ops/rep), but
the stride-2 extract + interleave relayout costs ~15 us per (80, 512)
roundtrip — equivalent to ~50 full-height ops, dwarfing the ~4.5 us/frame
sweep saving. A full gen-8 cell-sweep implementation of the raw CCL
kernel (bit-identical, all tests green) measured interior 13.6 -> 34.9,
bench 21.1 -> 65.0 ms/batch and was reverted. Avoiding the relayout
needs a cell-planar tilebuf/lab_out layout, which breaks the strided
write-back DMA (stride-2 row destinations are not expressible) and the
compact/stats coordinate contract. Do not retry without a Mosaic that
lowers sublane-stride-2 shuffles natively."""

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


def timeit(fn, args, iters=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


SH, SW = 80, 512
REPS = 256


def make(kind):
    def kernel(x_ref, o_ref):
        def body(r, acc):
            x = acc
            if kind == "baseline_min":
                # 8 full-height roll+min (one nb_min-ish sweep step)
                for _ in range(8):
                    x = jnp.minimum(x, pltpu.roll(x, 1, axis=0))
                return x
            if kind == "extract_roundtrip":
                t = x.reshape(SH // 2, 2, SW)[:, 0]
                b = x.reshape(SH // 2, 2, SW)[:, 1]
                # 8 half-height roll+min on each plane
                for _ in range(4):
                    t = jnp.minimum(t, pltpu.roll(t, 1, axis=0))
                    b = jnp.minimum(b, pltpu.roll(b, 1, axis=0))
                y = jnp.stack([t, b], axis=1).reshape(SH, SW)
                return y
            if kind == "baseline_sweepish":
                # ~64 full-height ops (a realistic per-frame sweep mix)
                for _ in range(16):
                    x = jnp.minimum(x, pltpu.roll(x, 1, axis=0))
                    x = jnp.minimum(x, pltpu.roll(x, SH - 1, axis=0))
                    x = jnp.minimum(x, pltpu.roll(x, 1, axis=1))
                    x = jnp.minimum(x, pltpu.roll(x, SW - 1, axis=1))
                return x
            if kind == "cell_sweepish":
                # one extract + ~64 HALF-height ops + one interleave —
                # the real kernel's amortization shape
                c = x.reshape(SH // 2, 2, SW)
                t, b = c[:, 0], c[:, 1]
                v = jnp.minimum(t, b)
                for _ in range(16):
                    v = jnp.minimum(v, pltpu.roll(v, 1, axis=0))
                    v = jnp.minimum(v, pltpu.roll(v, SH // 2 - 1, axis=0))
                    v = jnp.minimum(v, pltpu.roll(v, 1, axis=1))
                    v = jnp.minimum(v, pltpu.roll(v, SW - 1, axis=1))
                return jnp.stack([v, jnp.maximum(v, b)], axis=1).reshape(
                    SH, SW
                )
            raise ValueError(kind)

        o_ref[:] = lax.fori_loop(0, REPS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SH, SW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(x)

    return run


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, (SH, SW), np.int32)
    )
    for kind in ("baseline_min", "extract_roundtrip",
                 "baseline_sweepish", "cell_sweepish"):
        try:
            t, _ = timeit(make(kind), (x,))
            print(f"{kind:18s}: {t/REPS*1e6:8.2f} us/rep")
        except Exception as e:
            print(f"{kind:18s}: FAIL {str(e)[:160]}")


if __name__ == "__main__":
    main()
