#!/usr/bin/env python
"""Pass-count cost of the raw CCL kernel at 1080p (dev tool).

With the gen-6 EXACT pass-1 flag, a pass-2 frontier is scheduled only
when a tile's final labels can genuinely lower an already-visited
neighbor (min key on the later-visited side of a straddle). This probe
separates the multi-pass cost: identical blob count/size with (a) all
blobs tile-INTERIOR (single pass by construction), (b) all blobs
centered ON tile corners (maximal frontier), (c) the bench scene itself
(random straddles — roughly half still need pass 2). Measured on-chip
at gen-6 landing: interior 13.2 / bench 21.8 / corner 49.5 ms/batch
(bench was 23.4 with the conservative ring-carries-mask flag).

Tunnel discipline per CLAUDE.md: tiny-transfer sync, iters between
syncs, ~2.5 ms/dispatch overhead included in every number.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


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


def disks(n, h, w, centers, radius):
    yy, xx = np.mgrid[0:h, 0:w]
    m = np.zeros((n, h, w), np.uint8)
    rng = np.random.default_rng(0)
    for t in range(n):
        for cy, cx in centers:
            jy, jx = rng.integers(-3, 4), rng.integers(-3, 4)
            d = (yy - (cy + jy)) ** 2 + (xx - (cx + jx)) ** 2
            m[t][d <= radius * radius] = 255
    return m


def prep(mask, H, W):
    m = jnp.asarray(mask)
    Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256
    mp = jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))
    o1 = lax.reduce_window(
        mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
    )
    so = lax.reduce_window(
        o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
    )
    return mp, so


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    H, W, N, R = 1080, 1920, 256, 16

    # 6 blobs, tile-interior: centers far from every 64-row/256-col line
    interior = [(64 * i + 32, 256 * j + 128)
                for i, j in [(2, 1), (4, 3), (6, 5), (8, 6), (10, 2), (12, 4)]]
    # 6 blobs, on tile corners: 4-tile straddle each
    corner = [(64 * i, 256 * j)
              for i, j in [(2, 1), (4, 3), (6, 5), (8, 6), (10, 2), (12, 4)]]

    fn = jax.jit(
        lambda mp, so: label_components_tiled_raw(
            mp, so, H, W, compact_slots=48
        )
    )
    for name, centers in (("interior", interior), ("corner", corner)):
        mp, so = prep(disks(N, H, W, centers, R), H, W)
        dt, out = timeit(fn, (mp, so))
        assert bool(out[-1]), name
        print(f"ccl_raw {name:9s}: {dt*1e3:7.2f} ms/batch")

    # bench scene for reference
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)
    from tpuva.graph.pipeline import _fused_mask_stage, init_carry

    cfg = bench_main.build_config()
    clip, plate = bench_main.make_clip(H, W, N)
    carry = init_carry(cfg, H, W, plate)
    mask, _bg = _fused_mask_stage(cfg, carry, jnp.asarray(clip[:N]))
    mp, so = prep(mask, H, W)
    dt, out = timeit(fn, (mp, so))
    assert bool(out[-1])
    print(f"ccl_raw bench    : {dt*1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
