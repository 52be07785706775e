#!/usr/bin/env python
"""On-chip validation + timing for single-pass CCL reconcile (dev tool).

Runs process_batch_staged with ccl_single_pass=False vs True on (a) the
bench scene and (b) a corner-straddle scene (every blob centered on a
64-row/256-col tile corner — the multi-pass worst case measured at
~28 ms/batch of pure frontier re-sweeps). Asserts every tracked output
(rows, row_valid, n_det, row_sums, active_tracks, overflow flags) is
bit-identical across a chained multi-batch run, then times both modes.

Tunnel discipline per CLAUDE.md: tiny-transfer sync, several chained
batches between syncs, ~2.5 ms/dispatch overhead included.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def corner_clip(h, w, frames, radius=16):
    """Disks jittering around 64-row/256-col tile corners on a flat plate.

    Patch-stamped (a 2r+1 square disk mask placed per center) instead of
    full-frame distance fields: the original mgrid version cost ~0.5 s
    per 1080p frame on this 1-core box and dominated probe wall time."""
    plate = np.full((h, w), 40, np.uint8)
    centers = [(64 * i, 256 * j)
               for i, j in [(2, 1), (4, 3), (6, 5), (8, 6), (10, 2), (12, 4)]]
    rng = np.random.default_rng(7)
    r = radius
    py, px = np.mgrid[-r:r + 1, -r:r + 1]
    disk = (py * py + px * px) <= r * r
    clip = np.empty((frames, h, w), np.uint8)
    for t in range(frames):
        f = plate.copy()
        for cy, cx in centers:
            jy, jx = int(rng.integers(-2, 3)), int(rng.integers(-2, 3))
            y0, x0 = cy + jy - r, cx + jx - r
            f[y0:y0 + 2 * r + 1, x0:x0 + 2 * r + 1][disk] = 200
        clip[t] = f
    return clip, plate


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)

    from tpuva.graph.pipeline import init_carry, process_batch_staged

    H, W, N = 1080, 1920, 256
    cfg = bench_main.build_config()

    cache = "/tmp/tpuva_sp_bench_clip.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        bench_clip, bench_plate = z["clip"], z["plate"]
        print("bench clip loaded from cache", flush=True)
    else:
        bench_clip, bench_plate = bench_main.make_clip(H, W, 2 * N)
        np.savez(cache, clip=bench_clip, plate=bench_plate)
        print("bench clip generated + cached", flush=True)
    corn_clip, corn_plate = corner_clip(H, W, 2 * N)
    print("corner clip generated", flush=True)
    scenes = [
        ("bench", bench_clip, bench_plate),
        ("corner", corn_clip, corn_plate),
    ]

    keys = ("rows", "row_valid", "n_det", "row_sums", "active_tracks",
            "stats_overflow", "ccl_converged")
    for name, clip, plate in scenes:
        batches = [jnp.asarray(clip[i:i + N])
                   for i in range(0, clip.shape[0] - clip.shape[0] % N, N)]
        print(f"{name}: staging {len(batches)} batches", flush=True)
        outs = {}
        for sp in (False, True):
            carry = init_carry(cfg, H, W, plate)
            acc = []
            for b in batches:
                carry, out = process_batch_staged(
                    cfg, carry, b, max_components=32, ccl_single_pass=sp
                )
                acc.append({k: np.asarray(out[k]) for k in keys})
            outs[sp] = acc
        for i, (a, b) in enumerate(zip(outs[False], outs[True])):
            for k in keys:
                np.testing.assert_array_equal(
                    a[k], b[k], err_msg=f"{name} batch {i} key {k}"
                )
        print(f"{name:7s}: {len(batches)} batches bit-identical "
              f"(multi-pass vs single-pass)")

        # timing: chained batches between syncs, best of passes
        for sp in (False, True):
            carry = init_carry(cfg, H, W, plate)
            for b in batches:  # warm
                carry, out = process_batch_staged(
                    cfg, carry, b, max_components=32, ccl_single_pass=sp
                )
            sync(out)
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                nfr = 0
                for _ in range(4):
                    for b in batches:
                        carry, out = process_batch_staged(
                            cfg, carry, b, max_components=32,
                            ccl_single_pass=sp,
                        )
                        nfr += N
                sync(out)
                best = min(best, (time.perf_counter() - t0) / nfr)
            print(f"{name:7s} single_pass={sp}: {best*1e3*N:8.2f} ms/batch"
                  f"  ({1.0/best:8.1f} fps)")


if __name__ == "__main__":
    main()
