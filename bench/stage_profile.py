#!/usr/bin/env python
"""Per-stage timing of the staged TPU pipeline at 1080p (dev tool).

Times each dispatch of process_batch_staged separately, plus the
sub-stages of the post-mask tail, to locate the throughput bottleneck
(VERDICT round-1 weak #2). Not part of the driver contract.

Timing discipline per CLAUDE.md: sync via a tiny np.asarray transfer
(block_until_ready through the tunnel is unreliable); chain many batches
between syncs.
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
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)
    build_config, make_clip = bench_main.build_config, bench_main.make_clip
    from tpuva.graph.pipeline import (
        _finish_batch,
        _fused_mask_stage,
        _post_mask_stage,
        init_carry,
    )
    from tpuva.ops.label import _root_table, _stats_from_root
    from tpuva.ops.pallas.ccl import label_components_tiled

    cfg = build_config()
    H, W = 1080, 1920
    clip, plate = make_clip(H, W, cfg.batch * 2)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[cfg.batch : 2 * cfg.batch])
    N = cfg.batch
    MC = 32

    dt, (mask, bg_last) = timeit(
        lambda c, f: _fused_mask_stage(cfg, c, f), (carry, frames)
    )
    print(f"fused_mask_stage      : {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")

    dt, root = timeit(lambda m: label_components_tiled(m), (mask,))
    print(f"label_components_tiled: {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")

    # gen-4 sub-stages
    from jax import lax

    from tpuva.ops.label import _stats_from_raw
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256

    @jax.jit
    def occ_of(m):
        mp = (
            m if (Hp, Wp) == (H, W)
            else jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))
        )
        o1 = lax.reduce_window(
            mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
        )
        so = lax.reduce_window(
            o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
        )
        return mp, so

    dt, (mp, so) = timeit(occ_of, (mask,))
    print(f"  strip_occ reduction : {dt*1e3:8.2f} ms/batch")
    dt, (labraw, _c) = timeit(
        lambda m, s: label_components_tiled_raw(m, s, H, W), (mp, so)
    )
    print(f"label_components_raw  : {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")
    # production shape: drop the dead zeros "labels" placeholder inside
    # the timed jit (as _post_mask_stage's DCE does) — timing the bare
    # function would add a (N, H, W) int32 zero write the pipeline
    # never pays (~2.6 ms at batch 256)
    def drop_labels(d):
        return {k: v for k, v in d.items() if k != "labels"}

    dt, _ = timeit(
        jax.jit(
            lambda l, s: drop_labels(_stats_from_raw(
                l, s, H, W, max_components=MC, sparse_strips=256
            ))
        ),
        (labraw, so),
    )
    print(f"_stats_from_raw       : {dt*1e3:8.2f} ms/batch")

    # gen-5: compact tile write-out + gather-free stats
    from tpuva.ops.label import _stats_from_compact

    del labraw  # 2.7 GB raw buffer still live would OOM the next
    # stage's own 2.7 GB output on a 16 GB chip (observed)

    dt, (_lr2, cbuf, _c2) = timeit(
        lambda m, s: label_components_tiled_raw(
            m, s, H, W, compact_slots=48
        ),
        (mp, so),
    )
    print(f"label_raw(+compact)   : {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")
    del _lr2  # 2.7 GB raw buffer — free before the next stage (HBM)
    dt, _ = timeit(
        jax.jit(
            lambda cb, s: drop_labels(_stats_from_compact(
                cb, s, H, W, max_components=MC
            ))
        ),
        (cbuf, so),
    )
    print(f"_stats_from_compact   : {dt*1e3:8.2f} ms/batch")
    del cbuf

    dt, _ = timeit(
        lambda r: _root_table(r, 8, MC), (root,)
    )
    print(f"  _root_table         : {dt*1e3:8.2f} ms/batch")

    dt, stats = timeit(
        lambda r: _stats_from_root(
            r, max_components=MC, compute_bbox=False, compute_labels=False,
            sparse_strips=256,
        ),
        (root,),
    )
    print(f"_stats_from_root(sparse): {dt*1e3:6.2f} ms/batch")

    fb = jax.jit(
        lambda c, s, m, b: _finish_batch(cfg, c, s, m, b, False),
        static_argnames=(),
    )
    dt, _ = timeit(fb, (carry, stats, mask, bg_last))
    print(f"_finish_batch (tracker): {dt*1e3:7.2f} ms/batch")

    dt, _ = timeit(
        lambda c, m, b: _post_mask_stage(cfg, c, m, b, max_components=MC),
        (carry, mask, bg_last),
    )
    print(f"post_mask_stage (all) : {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")

    def full(c, f):
        m, bl = _fused_mask_stage(cfg, c, f)
        return _post_mask_stage(cfg, c, m, bl, max_components=MC)

    dt, _ = timeit(full, (carry, frames))
    print(f"full staged           : {dt*1e3:8.2f} ms/batch "
          f"({N/dt:8.1f} fps)")


if __name__ == "__main__":
    main()
