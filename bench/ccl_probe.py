#!/usr/bin/env python
"""CCL kernel cost decomposition at 1080p (dev tool)."""

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


def timeit(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    from refimpl.synthetic import multi_blob_clip
    from tpuva.graph.pipeline import _fused_mask_stage, init_carry
    from tpuva.ops.pallas.ccl import label_components_tiled

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)

    cfg = bm.build_config()
    H, W = 1080, 1920
    clip, plate = bm.make_clip(H, W, cfg.batch * 2)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[cfg.batch :])
    mask, _bg = _fused_mask_stage(cfg, carry, frames)
    mask = jax.block_until_ready(mask)
    nfg = int(np.asarray((mask > 0).sum()))
    print(f"foreground px/frame: {nfg / cfg.batch:.0f}")

    empty = jnp.zeros_like(mask)

    for mr in (1, 2, 64):
        dt, _ = timeit(
            lambda m, mr=mr: label_components_tiled(m, max_rounds=mr),
            (mask,),
        )
        print(f"max_rounds={mr:2d}: {dt*1e3:7.2f} ms/batch")
    dt, _ = timeit(lambda m: label_components_tiled(m), (empty,))
    print(f"empty mask   : {dt*1e3:7.2f} ms/batch (init + traversal floor)")

    # init-only cost: the XLA prologue (where/pad/occupancy) isolated
    from tpuva.ops.label import _scan_key

    def prologue(m):
        mb = m > 0
        N, Hh, Ww = mb.shape
        kmap, _i, sent = _scan_key(Hh, Ww, 8)
        lab = jnp.where(mb, jnp.asarray(kmap)[None], jnp.int32(sent + 1))
        lab = jnp.pad(lab, ((0, 0), (8, 32), (128, 256)),
                      constant_values=sent + 1)
        return lab

    dt, _ = timeit(jax.jit(prologue), (mask,))
    print(f"where+pad    : {dt*1e3:7.2f} ms/batch")

    for fps_ in (2, 8):
        dt, _ = timeit(
            lambda m, f=fps_: label_components_tiled(m, frames_per_step=f),
            (mask,),
        )
        print(f"frames_per_step={fps_}: {dt*1e3:7.2f} ms/batch")
    for tl in ((256, 256), (128, 512), (256, 512)):
        dt, _ = timeit(
            lambda m, t=tl: label_components_tiled(m, tile=t), (mask,)
        )
        print(f"tile={tl}: {dt*1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
