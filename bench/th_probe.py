#!/usr/bin/env python
"""Fused-kernel tile-height sweep on-chip (VERDICT r4 next #5 — the r4
attempt died on a transient remote-compile HTTP 500 and was never
retried).

Times fused_segment at 1080p/batch-128 with tile=(TH, 2048) (full-width
ring mode preserved: Wp stays 2048, Hp stays 1152) for TH in {96, 192,
288, 384}, asserting bit-identical masks/occ against the production
TH=96. Taller tiles amortize per-tile halo recompute (each tile computes
P=6 extra rows top+bottom) at the cost of VMEM pressure; the sweep says
whether the tradeoff pays on silicon.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)

    from tpuva.graph.pipeline import filter_batch, init_carry
    from tpuva.ops.pallas.fused_segment import fused_segment

    cfg = bench_main.build_config()
    H, W, N = 1080, 1920, 128
    clip, plate = bench_main.make_clip(H, W, N)
    frames = jnp.asarray(clip)
    bg0 = jnp.asarray(plate, jnp.float32)

    def run(tile):
        return fused_segment(
            frames, bg0,
            alpha=cfg.background.alpha,
            threshold=cfg.segment.threshold,
            blur_ksize=cfg.blur.ksize, blur_sigma=cfg.blur.sigma,
            open_shape=cfg.morph_open.shape,
            open_ksize=cfg.morph_open.ksize,
            open_iters=cfg.morph_open.iterations,
            close_shape=cfg.morph_close.shape,
            close_ksize=cfg.morph_close.ksize,
            close_iters=cfg.morph_close.iterations,
            tile=tile, padded_occ=True,
        )

    base = None
    for TH in (96, 192, 288, 384):
        tile = (TH, 2048)
        try:
            out = run(tile)
            sync(out)
        except Exception as e:
            print(f"TH={TH}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        # timing: several iters, tiny-transfer sync (CLAUDE.md tunnel)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = run(tile)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"TH={TH:4d}: {best*1e3:8.2f} ms/batch-{N}", flush=True)
        if base is None:
            base = out
        else:
            for a, b in zip(base, out):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)
                )
            print(f"TH={TH:4d}: bit-identical to TH=96", flush=True)


if __name__ == "__main__":
    main()
