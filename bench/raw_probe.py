#!/usr/bin/env python
"""Parameter probe for the gen-4 tail on TPU (dev tool).

Sweeps frames_per_step (grid size / VMEM tradeoff) for
label_components_tiled_raw and sparse_strips for _stats_from_raw on the
bench scene, plus the occ-enabled fused kernel cost. Remember the
~2.5 ms/dispatch tunnel overhead when reading absolute numbers.
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

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)
    from tpuva.graph.pipeline import _fused_mask_stage, init_carry
    from tpuva.ops.label import _stats_from_raw
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    cfg = bench_main.build_config()
    H, W = 1080, 1920
    clip, plate = bench_main.make_clip(H, W, cfg.batch * 2)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[cfg.batch : 2 * cfg.batch])
    N = cfg.batch

    dt, (mask, bg, occ128) = timeit(
        lambda c, f: _fused_mask_stage(cfg, c, f, padded_occ=True),
        (carry, frames),
    )
    print(f"fused+occ      : {dt*1e3:8.2f} ms/batch ({N/dt:8.1f} fps)")
    Nn, Hb, Qc2 = occ128.shape
    so = occ128.reshape(Nn, Hb, Qc2 // 2, 2).max(axis=3)

    for fps_ in (4, 8, 16):
        dt, (labraw, _c) = timeit(
            lambda m, s, f=fps_: label_components_tiled_raw(
                m, s, H, W, frames_per_step=f
            ),
            (mask, so),
        )
        print(f"ccl_raw F={fps_:3d}  : {dt*1e3:8.2f} ms/batch")

    # isolate grid-step overhead vs occupied-tile work
    empty = jnp.zeros_like(mask)
    so0 = jnp.zeros_like(so)
    dt, _ = timeit(
        lambda m, s: label_components_tiled_raw(m, s, H, W), (empty, so0)
    )
    print(f"ccl_raw EMPTY  : {dt*1e3:8.2f} ms/batch (pure grid overhead)")
    Hp2 = mask.shape[1]
    full = jnp.full_like(mask, 255)
    full = full.at[:, H:, :].set(0).at[:, :, W:].set(0)
    sof = jnp.ones_like(so).at[:, (H + 1) // 2:, :].set(0)
    dt, _ = timeit(
        lambda m, s: label_components_tiled_raw(m, s, H, W), (full, sof)
    )
    print(f"ccl_raw FULL   : {dt*1e3:8.2f} ms/batch (every tile occupied)")

    for tl in ((64, 512), (128, 256), (128, 512), (32, 256)):
        try:
            dt, _ = timeit(
                lambda m, s, t=tl: label_components_tiled_raw(
                    m, s, H, W, tile=t
                ),
                (mask, so),
            )
            print(f"ccl_raw tile={tl}: {dt*1e3:8.2f} ms/batch")
        except Exception as e:
            print(f"ccl_raw tile={tl}: FAIL {str(e)[:90]}")

    labraw, _ = label_components_tiled_raw(mask, so, H, W)
    occ_n = int(np.asarray((np.asarray(so) != 0).sum(axis=(1, 2))).max())
    print(f"max occupied strips/frame: {occ_n}")
    for K in (64, 128, 256):
        dt, st = timeit(
            lambda l, s, K=K: _stats_from_raw(
                l, s, H, W, max_components=32, sparse_strips=K
            ),
            (labraw, so),
        )
        ov = int(np.asarray(st["overflow"]).max())
        print(f"stats K={K:3d}   : {dt*1e3:8.2f} ms/batch (overflow {ov})")

    from tpuva.graph.pipeline import _finish_batch

    stats = _stats_from_raw(labraw, so, H, W, max_components=32)
    fb = jax.jit(lambda c, s, m, b: _finish_batch(cfg, c, s, m, b, False))
    dt, _ = timeit(fb, (carry, stats, mask, bg))
    print(f"tracker (finish): {dt*1e3:8.2f} ms/batch "
          f"(batch {cfg.batch}, {cfg.track.assigner})")


if __name__ == "__main__":
    main()
