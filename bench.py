#!/usr/bin/env python
"""Full-pipeline throughput benchmark (the primary metric, BASELINE.json:2).

Measures frames/sec/chip at 1080p for the complete TPU pipeline
(blur -> rolling background -> threshold -> morphology -> CCL+stats ->
Hungarian tracking, the config-3 shape of BASELINE.json:9) and the same
pipeline on the reference-equivalent NumPy/OpenCV CPU path (refimpl — the
baseline denominator, BASELINE.json:5,7).

Prints ONE JSON line:
  {"metric": ..., "value": fps_per_chip, "unit": "frames/sec/chip",
   "vs_baseline": speedup_vs_cpu}

The vs_baseline denominator is max(live cv2 measurement, PINNED_CPU_FPS):
the baseline is re-measured every run (so a faster host raises the bar),
but a contended box can only make the reported speedup SMALLER, never
larger. PINNED_CPU_FPS is the best uncontended cv2 throughput observed on
this host (BENCH_r01.json: 34.25 fps; a concurrent pytest run once
depressed the live number to 12.93, which would have inflated the
speedup 2.5x).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def build_config():
    from tpuva.graph.config import (
        BackgroundConfig,
        BlurConfig,
        MorphConfig,
        PipelineConfig,
        SegmentConfig,
        TrackConfig,
    )

    return PipelineConfig(
        background=BackgroundConfig(alpha=0.02),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        morph_close=MorphConfig(ksize=3, shape="ellipse"),
        segment=SegmentConfig(threshold=35.0, min_area=50, max_blobs=8),
        # exact Hungarian association (BASELINE.json:9): the unique-
        # column-minimum fast path makes it as fast as greedy on typical
        # frames (~2% apart at 1080p), so the flagship bench runs the
        # stronger assigner; contested frames pay the exact O(n^3) JV
        track=TrackConfig(
            max_dist=80.0, death_patience=5, max_tracks=16,
            assigner="hungarian",
        ),
        # batch 256 amortizes per-batch fixed costs (dispatch, CCL grid,
        # stats tables): ~3490 fps vs ~3270 at 128, ~1960 at 32
        batch=256,
    )


def make_clip(h, w, frames):
    # multi_blob_clip is deterministic (seed=1) but takes minutes at
    # 1080p on this 1-core box — cache the result on disk so repeated
    # bench/probe runs skip straight to the compile/measure phase
    cache = os.path.join(
        tempfile.gettempdir(), f"tpuva_clip_v1_{h}x{w}x{frames}.npz"
    )
    if os.path.exists(cache):
        z = np.load(cache)
        return z["clip"], z["plate"]

    from refimpl.synthetic import multi_blob_clip

    clip, _, _, plate = multi_blob_clip(
        h=h, w=w, frames=frames, n_blobs=6, radius=16, births_deaths=False,
        noise_sigma=2.0,
    )
    tmp = cache + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, clip=clip, plate=plate)
    os.replace(tmp, cache)
    return clip, plate


def bench_tpu(clip, plate, cfg, warmup_batches=2, max_components=32,
              repeats=12, passes=2):
    # max_components=32: 4x headroom over the scene's ~7 components; the
    # per-component one-hot contraction scales linearly with this capacity
    import jax
    import jax.numpy as jnp

    from tpuva.graph.pipeline import (
        _can_fuse,
        init_carry,
        process_batch,
        process_batch_staged,
    )

    staged = _can_fuse(cfg) and jax.default_backend() == "tpu"

    def run(carry, b):
        if staged:
            return process_batch_staged(
                cfg, carry, b, max_components=max_components
            )
        return process_batch(
            cfg, carry, b, parallel_bg=True, max_components=max_components
        )

    T, H, W = clip.shape
    N = cfg.batch
    batches = [
        jnp.asarray(clip[i : i + N])
        for i in range(0, T - (T % N), N)
    ]
    carry = init_carry(cfg, H, W, plate)
    # warm-up: compile + first batches
    for b in batches[:warmup_batches]:
        carry, out = run(carry, b)
    np.asarray(out["rows"])
    assert len(batches) > warmup_batches, (
        "need more frames than warmup batches"
    )
    # each pass chains `repeats` sweeps between syncs: this box's tunnel
    # sync costs ~28 ms, a fixed cost unrelated to pipeline throughput,
    # so amortize it over >1 s of work (CLAUDE.md). Best-of-passes damps
    # tunnel throughput hiccups, mirroring bench_cpu's max-over-trials.
    best = 0.0
    for _ in range(passes):
        t0 = time.perf_counter()
        n_frames = 0
        for _ in range(repeats):
            for b in batches[warmup_batches:]:
                carry, out = run(carry, b)
                n_frames += b.shape[0]
        np.asarray(out["rows"])  # forced sync (block_until_ready can lie
        # through the tunneled device)
        best = max(best, n_frames / (time.perf_counter() - t0))
    return best


# Best uncontended refimpl throughput observed on this host (see module
# docstring). Floors the vs_baseline denominator so host contention during
# the live measurement can never inflate the reported speedup. Override
# with TPUVA_PINNED_CPU_FPS on a different host (e.g. 0 to trust the live
# measurement only) instead of editing code.
import os as _os

PINNED_CPU_FPS = float(_os.environ.get("TPUVA_PINNED_CPU_FPS", "34.25"))


def bench_cpu(clip, plate, cfg, n_frames=16, trials=3):
    from refimpl.pipeline import run_pipeline

    sub = clip[:n_frames]
    run_pipeline(sub[:4], cfg, background0=plate)  # warm caches
    best = 0.0
    for _ in range(trials):  # max over trials: the fairest baseline
        t0 = time.perf_counter()
        run_pipeline(sub, cfg, background0=plate)
        best = max(best, n_frames / (time.perf_counter() - t0))
    return best


def accuracy_vs_reference(clip, plate, cfg, frames=48):
    """The accuracy half of the primary metric (BASELINE.json:2): run the
    TPU pipeline and the refimpl oracle on the same 1080p sub-clip and
    report the max centroid error (px; contract is <= 1, BASELINE.json:5)
    and whether every row pairs up by (track id, frame). Since the
    bit-exact uint8 Gaussian blur landed (ops.gaussian_blur_u8: cv2's
    fixed-point path reproduced exactly), every benchmarked config is
    mask-bit-equal end-to-end and this measures 0.0 with rows matching —
    the suite pins that stronger contract (tests/test_ops_golden,
    test_config_fuzz); the 1px band remains only as the contract's outer
    bound, not an expected slack."""
    from refimpl.pipeline import run_pipeline
    from tpuva.graph.pipeline import process_clip

    sub = clip[:frames]
    ref = run_pipeline(sub, cfg, background0=plate)
    rows, _, _ = process_clip(sub, cfg, background0=plate, use_pallas=True)
    key = lambda r: (r[1], r[0])
    ref_rows = sorted(ref.rows, key=key)
    got_rows = sorted(rows, key=key)
    if len(ref_rows) != len(got_rows):
        return float("inf"), False
    max_err = 0.0
    match = True
    for r, g in zip(ref_rows, got_rows):
        if int(r[0]) != int(g[0]) or int(r[1]) != int(g[1]):
            match = False
        max_err = max(max_err, abs(r[2] - g[2]), abs(r[3] - g[3]))
    return max_err, match


def tpu_preflight(timeout_s: float = 300.0, _probe=None) -> bool:
    """Bounded backend-init probe. The axon tunnel can wedge so hard that
    even jax.devices() blocks forever (observed 2026-08-17: >30 min hang
    on a trivial device enumeration). Probing in a daemon thread turns a
    dead tunnel into a clean nonzero exit in bounded time instead of
    hanging the driver's end-of-round run. Device enumeration normally
    completes in seconds even through the tunnel; 300 s is generous
    (compile/LOAD cost comes later and is unaffected)."""
    import threading

    out = {}

    def probe():
        import jax

        out["devices"] = [str(d) for d in jax.devices()]

    th = threading.Thread(target=_probe or probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        print(
            f"[bench] FATAL: jax backend init did not finish in "
            f"{timeout_s:.0f}s — TPU tunnel unresponsive; aborting "
            "instead of hanging (re-run when the tunnel recovers)",
            file=sys.stderr,
            flush=True,
        )
        return False
    if out:
        print(f"[bench] devices: {out['devices']}", file=sys.stderr,
              flush=True)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="short run")
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--cpu-frames", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None,
                    help="override cfg.batch (default 128)")
    ap.add_argument(
        "--profile", metavar="DIR", default=None,
        help="capture a jax.profiler trace of the TPU run into DIR "
             "(SURVEY.md §5.1)",
    )
    args = ap.parse_args()

    import os

    if not tpu_preflight(
        float(os.environ.get("TPUVA_BENCH_PREFLIGHT_S", "300"))
    ):
        return 2

    cpu_frames = args.cpu_frames or (8 if args.quick else 24)

    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()

    t0 = time.perf_counter()

    def phase(name):
        print(
            f"[bench] {name} done at +{time.perf_counter() - t0:.0f}s",
            file=sys.stderr, flush=True,
        )

    cfg = build_config()
    if args.batch:
        import dataclasses

        cfg = dataclasses.replace(cfg, batch=args.batch)
    # >= 2 warmup batches + >= 1 measured batch (bench_tpu asserts)
    frames = args.frames or cfg.batch * (3 if args.quick else 4)
    clip, plate = make_clip(args.height, args.width, frames)
    phase("clip gen")

    # CPU baseline first: the jax/TPU runtime's host threads depress cv2's
    # multithreaded throughput ~3x if measured afterwards
    fps_cpu = bench_cpu(clip, plate, cfg, cpu_frames)
    phase("cpu baseline")
    if args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            fps_tpu = bench_tpu(clip, plate, cfg)
    else:
        fps_tpu = bench_tpu(clip, plate, cfg)
    phase("tpu run")

    max_err, rows_match = accuracy_vs_reference(
        clip, plate, cfg, frames=min(48, frames)
    )
    phase("accuracy check")

    result = {
        "metric": f"full-pipeline throughput @{args.height}p",
        "value": round(fps_tpu, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_tpu / max(fps_cpu, PINNED_CPU_FPS), 2),
        "baseline_cpu_fps": round(max(fps_cpu, PINNED_CPU_FPS), 2),
        "baseline_cpu_fps_live": round(fps_cpu, 2),
        "max_centroid_err_px": round(max_err, 6),
        "rows_match_reference": bool(rows_match),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
