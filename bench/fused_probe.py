#!/usr/bin/env python
"""Cost decomposition of the fused segmentation kernel on TPU (dev tool).

Times fused_segment at 1080p/batch-128 with stages progressively enabled
to locate where the VPU time goes (blur / bg+threshold / morph / occ).
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
    from tpuva.ops.pallas import fused_segment

    H, W = 1080, 1920
    N = 128
    clip, plate = bench_main.make_clip(H, W, N)
    frames = jnp.asarray(clip[:N])
    bg0 = jnp.asarray(plate, dtype=jnp.float32)

    base = dict(alpha=0.02, threshold=35.0)
    variants = [
        ("bg+thresh only", dict()),
        ("+blur5", dict(blur_ksize=5, blur_sigma=0.0)),
        ("+open3r", dict(blur_ksize=5, open_ksize=3, open_shape="rect")),
        ("+close3e (full)", dict(
            blur_ksize=5, open_ksize=3, open_shape="rect",
            close_ksize=3, close_shape="ellipse")),
        ("full+occ", dict(
            blur_ksize=5, open_ksize=3, open_shape="rect",
            close_ksize=3, close_shape="ellipse", padded_occ=True)),
    ]
    for name, kw in variants:
        dt, _ = timeit(
            lambda f, b: fused_segment(f, b, **base, **kw), (frames, bg0)
        )
        print(f"{name:18s}: {dt*1e3:8.2f} ms/batch ({N/dt:8.1f} fps)")

    full_kw = dict(
        blur_ksize=5, open_ksize=3, open_shape="rect",
        close_ksize=3, close_shape="ellipse")
    for tl in ((96, 2048), (192, 1024), (48, 1024), (96, 512)):
        try:
            dt, _ = timeit(
                lambda f, b, t=tl: fused_segment(
                    f, b, **base, **full_kw, tile=t),
                (frames, bg0),
            )
            print(f"full tile={tl}: {dt*1e3:8.2f} ms/batch "
                  f"({N/dt:8.1f} fps)")
        except Exception as e:
            print(f"full tile={tl}: FAIL {str(e)[:80]}")

    # all-foreground scene: every tile pays morphology
    ones = jnp.asarray(
        np.full((N, H, W), 200, np.uint8)
    )
    dt, _ = timeit(
        lambda f, b: fused_segment(
            f, b, **base, blur_ksize=5, open_ksize=3, open_shape="rect",
            close_ksize=3, close_shape="ellipse"),
        (ones, jnp.zeros((H, W), jnp.float32)),
    )
    print(f"{'full all-fg':18s}: {dt*1e3:8.2f} ms/batch ({N/dt:8.1f} fps)")


if __name__ == "__main__":
    main()
