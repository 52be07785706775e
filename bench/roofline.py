#!/usr/bin/env python
"""Per-stage roofline decomposition of the staged TPU pipeline
(VERDICT round-3 weak #3: "no machine-readable bytes-moved /
%-of-roofline artifact").

For each stage of process_batch_staged at the bench scene (1080p,
batch 128) this measures ms/batch and computes the stage's *contract
floor* HBM traffic — the bytes the stage MUST move given its inputs and
outputs (halo re-reads counted for the fused kernel; label traffic
counted only for occupied CCL tiles, measured from the scene's
occupancy) — then reports achieved GB/s against that floor and the
percentage of the chip's peak HBM bandwidth. 100% means the stage is at
its memory-bandwidth speed-of-light; a low percentage on a
traffic-light stage means the stage is compute-(VPU-)bound or
latency-bound, and says how much headroom a better kernel could still
take.

Writes PERF_ROOFLINE.json at the repo root (committed artifact, so each
round starts from numbers instead of re-deriving where the headroom
is). Timing discipline per CLAUDE.md: warmup first (compile/LOAD
through the tunnel is 40-230 s and excluded), sync via a tiny
np.asarray transfer, several iters per stage.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# v5e: 16 GB HBM2 @ ~819 GB/s (public spec). Override for other chips.
PEAK_HBM_GBPS = float(os.environ.get("TPUVA_PEAK_HBM_GBPS", "819"))

# v5e compute peaks (round-5 compute-side roofline — VERDICT r4 item 4).
# MXU: 197 bf16 TFLOP/s public spec => 98.5e12 MAC/s.
# VPU: 4 independent ALUs x (8 sublanes x 128 lanes) vregs at the
# ~1.5 GHz implied by the MXU spec (197e12 / (2 flops x 4 MXUs x 128x128
# MACs) = 1.5e9) => ~6.1e12 elementwise f32 ops/s. Estimates, not specs:
# compute floors derived from them are ceilings good to ~±30%, which is
# enough to say whether a stage has 2x or 10x of headroom left.
PEAK_MXU_MACS = float(os.environ.get("TPUVA_PEAK_MXU_MACS", "98.5e12"))
PEAK_VPU_OPS = float(os.environ.get("TPUVA_PEAK_VPU_OPS", "6.1e12"))


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


def stage(name, t_s, bytes_floor, note="", vpu_ops=None, mxu_macs=None,
          seq_floor_ms=None):
    """One roofline row. bytes_floor -> HBM-side floor; vpu_ops/mxu_macs
    (structural op-count estimates, see call sites) -> compute-side
    floor = max(VPU time, MXU time) since the units overlap;
    seq_floor_ms -> a MEASURED serialization floor (e.g. the tracker's
    bare same-shape scan) used directly as the compute floor."""
    gbps = bytes_floor / t_s / 1e9 if bytes_floor else None
    pct = 100.0 * gbps / PEAK_HBM_GBPS if gbps else None
    if seq_floor_ms is not None:
        comp_ms = seq_floor_ms
    elif vpu_ops or mxu_macs:
        comp_ms = max(
            (vpu_ops or 0) / PEAK_VPU_OPS, (mxu_macs or 0) / PEAK_MXU_MACS
        ) * 1e3
    else:
        comp_ms = None
    cpct = 100.0 * comp_ms / (t_s * 1e3) if comp_ms else None
    row = {
        "stage": name,
        "ms_per_batch": round(t_s * 1e3, 3),
        "bytes_floor": int(bytes_floor) if bytes_floor else None,
        "achieved_gbps_vs_floor": round(gbps, 1) if gbps else None,
        "pct_of_hbm_roofline": round(pct, 1) if pct else None,
        "compute_floor_ms": round(comp_ms, 3) if comp_ms else None,
        "pct_of_compute_roofline": round(cpct, 1) if cpct else None,
        "vpu_ops_est": int(vpu_ops) if vpu_ops else None,
        "mxu_macs_est": int(mxu_macs) if mxu_macs else None,
        "note": note,
    }
    print(
        f"{name:24s}: {t_s*1e3:8.2f} ms  "
        + (
            f"{bytes_floor/1e6:8.1f} MB floor  {gbps:6.1f} GB/s  "
            f"{pct:5.1f}% of HBM"
            if bytes_floor
            else "(no byte floor)"
        )
        + (
            f"  compute-floor {comp_ms:6.2f} ms ({cpct:5.1f}% achieved)"
            if comp_ms
            else ""
        )
        + (f"  [{note}]" if note else ""),
        flush=True,
    )
    return row


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
    build_config, make_clip = bench_main.build_config, bench_main.make_clip

    from tpuva.graph.pipeline import (
        _finish_batch,
        _fused_mask_stage,
        _post_mask_stage,
        init_carry,
    )
    from tpuva.ops.label import _stats_from_compact
    from tpuva.ops.pallas.ccl import label_components_tiled_raw
    from tpuva.ops.pallas.fused_segment import _auto_tile, _ceil_to

    cfg = build_config()
    H, W = 1080, 1920
    N = cfg.batch
    cache = "/tmp/tpuva_sp_bench_clip.npz"  # shared with bench/sp_probe
    if os.path.exists(cache):
        z = np.load(cache)
        clip, plate = z["clip"], z["plate"]
    else:
        clip, plate = make_clip(H, W, N * 2)
        np.savez(cache, clip=clip, plate=plate)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[N : 2 * N])

    # geometry (fused grid; CCL grid)
    P = (cfg.blur.ksize // 2 if cfg.blur else 0)
    P += (cfg.median.ksize // 2 if cfg.median else 0)
    if cfg.morph_open:
        P += (cfg.morph_open.ksize // 2) * cfg.morph_open.iterations * 2
    if cfg.morph_close:
        P += (cfg.morph_close.ksize // 2) * cfg.morph_close.iterations * 2
    # mirror fused_segment's actual tiling decision (incl. the round-4
    # full-width ring mode: one tile column, circular halos, SW = TW)
    TH, TW = _auto_tile(H, W, P)
    gh, gw = -(-H // TH), -(-W // TW)
    Hp, Wp = gh * TH, gw * TW
    SH = _ceil_to(TH + 2 * P, 8)
    PRE, CPRE = _ceil_to(P, 32), _ceil_to(P, 128)
    fullwidth = (
        P >= 1 and gw == 1 and TW >= W + 2 * P
        and H % 8 == 0 and W % 128 == 0
        and H >= SH + PRE
    )
    SW = TW if fullwidth else _ceil_to(TW + 2 * P, 128)
    # raw-window mode (round 4): no pre-pad; each tile DMAs an ALIGNED
    # over-sized window straight from the raw batch (static RL x CL,
    # sized so the clipped start always lands the window in-image —
    # same formulas as fused_segment.fused_segment); ring mode reads
    # full raw rows (CL = W, no column over-read)
    RL = H - (H - SH - PRE) // 32 * 32
    CL = W if fullwidth else W - (W - SW - CPRE) // 128 * 128
    Hc, Wc = -(-H // 64) * 64, -(-W // 256) * 256

    stages = []

    # 1. fused mask kernel (raw-window mode; floor counts the per-tile
    # aligned over-reads + mask/occ/bg traffic — no pad stage exists)
    t, outs = timeit(
        lambda c, f: _fused_mask_stage(cfg, c, f, padded_occ=True),
        (carry, frames),
    )
    mask, bg_last, occ128 = outs
    fused_floor = (
        N * gh * gw * RL * CL  # raw window reads (alignment over-read)
        + gh * gw * SH * SW * 4  # bg tile read (f32, once)
        + N * Hp * Wp  # mask write
        + N * (Hp // 2) * (Wp // 128)  # occ write
        + Hp * Wp * 4  # bg out write
    )
    # compute-side floor (structural op counts from fused_segment's frame
    # loop at the bench config: binomial k=5 u8 blur, no median, open
    # rect3 + close ellipse3):
    #   row blur cascade       2*(k-1) roll+add   = 8 ops/px
    #   blur rescale + u8 requantize (floor(x+.5)) = 3
    #   bg update + |F-B| + strict compare         = 5
    #   widen/format + occ reduce + mask format    ~ 6
    #   morphology (skipped on fg-free tile-frames): erode+dilate, per SE
    #   ~10 ops/px => open+close ~ 40 ops/px, paid on occupied tiles only
    #   MXU column blur: k MACs/px (banded matmul)
    occ_a = np.asarray(occ128)
    TWb = occ_a.shape[2] // gw
    ftile_occ = occ_a.reshape(
        N, gh, TH // 2, gw, TWb
    ).max(axis=(2, 4))  # (N, gh, gw) fused-tile-granular occupancy
    fused_occ_frac = float((ftile_occ > 0).mean())
    px_all = N * gh * gw * SH * SW
    vpu_fused = px_all * 22 + fused_occ_frac * px_all * 40
    mxu_fused = px_all * (cfg.blur.ksize if cfg.blur else 0)
    stages.append(
        stage(
            "fused_mask_stage", t, fused_floor,
            f"raw-window {RL}x{CL}/tile; fused-tile occ "
            f"{fused_occ_frac:.2f}; op counts ±30%",
            vpu_ops=vpu_fused, mxu_macs=mxu_fused,
        )
    )
    # the IDEAL floor if windows could be read without alignment
    # over-read (1 u8 read + 1 u8 write per pixel + occ/bg): how far the
    # whole stage is from true speed-of-light
    ideal = N * H * W + N * Hp * Wp + N * (Hp // 2) * (Wp // 128) \
        + Hp * Wp * 4
    stages.append(
        stage(
            "fused_mask_ideal", t, ideal,
            "same timing vs no-over-read floor (headroom bound)",
        )
    )

    # CCL strip occupancy (tiny): the same pairwise max the post-mask
    # fast path uses (pipeline.py:262) — the CCL runs on the FUSED padded
    # grid (Hp x Wp), not the 64/256 cover of (H, W)
    occ = np.asarray(occ128)
    Nn, Hb2, Qc2 = occ.shape  # (N, Hp//2, Wp//128)
    so = occ.reshape(Nn, Hb2, Qc2 // 2, 2).max(axis=3)
    tile_occ = so.reshape(Nn, Hb2 * 2 // 64, 32, Qc2 // 2).max(axis=2)
    occ_frac = float(tile_occ.mean())
    Hc, Wc = Hb2 * 2, (Qc2 // 2) * 256

    @jax.jit
    def strip_occ(o):
        return lax.reduce_window(
            o, jnp.uint8(0), lax.max, (1, 1, 2), (1, 1, 2), "VALID"
        )

    so_dev = strip_occ(occ128)

    # 3. CCL raw + compact write-out: reads the mask everywhere, writes
    # int32 labels only into occupied tiles' raw + compact slots; stats
    # later reads the compact copy once. Floor: mask read + 2x occupied
    # label traffic (one write, one converge re-read) + compact write.
    t, ccl_outs = timeit(
        lambda m, s: label_components_tiled_raw(
            m, s, H, W, compact_slots=48
        ),
        (mask, so_dev),
    )
    occupied_label_bytes = occ_frac * N * Hc * Wc * 4
    ccl_floor = N * Hp * Wp + 2 * occupied_label_bytes
    # compute floor: pass-1 in-tile propagation visits each occupied px
    # with neighbor mins + run-scan work (truncated at 32) — structural
    # estimate ~30 VPU ops per occupied px, ±2x (the kernel's cost is
    # dominated by sweep sequencing, which this deliberately bounds from
    # below; frontier re-sweep passes are scene-dependent extra)
    occupied_px = occ_frac * N * Hc * Wc
    stages.append(
        stage(
            "ccl_raw_compact", t, ccl_floor,
            f"occupied-tile fraction {occ_frac:.3f} (scene-dependent); "
            "VPU count ±2x",
            vpu_ops=occupied_px * 30,
        )
    )
    _raw, cbuf, _conv = ccl_outs

    # 4. stats from the compact buffer (gather-free): reads occupied
    # compact slots (int32 labels) + emits tiny per-component stats
    occupied_slots = int(tile_occ.sum())
    del _raw

    # time the PRODUCTION shape: inside _post_mask_stage the stats dict's
    # zeros "labels" placeholder is dead code; timing the bare jit would
    # materialize a (N, H, W) int32 zero tensor (2.1 GB, ~2.6 ms at this
    # batch) that the pipeline never pays
    @jax.jit
    def stats_prod(cb, s):
        st = _stats_from_compact(cb, s, H, W, max_components=32)
        return {k: v for k, v in st.items() if k != "labels"}

    t, stats_out = timeit(stats_prod, (cbuf, so_dev))
    # compute floor: root-flag compares (~6 VPU ops per compact px) +
    # the 6-bit-limb MXU contraction (256-wide rows x C components x
    # ~10 limb planes of MACs per compact row)
    C_stats = 32
    stats_vpu = occupied_slots * 64 * 256 * 6
    stats_macs = occupied_slots * 64 * 256 * C_stats * 10
    stages.append(
        stage(
            "stats_from_compact", t, occupied_slots * 64 * 256 * 4,
            f"{occupied_slots} occupied 64x256 tiles over the batch "
            "(production shape: dead labels placeholder DCE'd)",
            vpu_ops=stats_vpu, mxu_macs=stats_macs,
        )
    )

    # 5. tracker tail: sequential scan over frames; latency-bound (state
    # is KB-sized) — no meaningful byte floor. Its compute floor is
    # MEASURED: a synthetic scan with the same carry leaf shapes, length
    # and unroll but a trivial body (one add per leaf) bounds what pure
    # lax.scan sequencing costs on this chip (VERDICT r4 weak #4: the
    # "near its scan floor" claim previously had no measurement).
    fb = jax.jit(lambda c, s, m, b: _finish_batch(cfg, c, s, m, b, False))
    t, _ = timeit(fb, (carry, stats_out, mask, bg_last))

    leaves = jax.tree_util.tree_leaves(carry.track)
    st0 = tuple(jnp.zeros(np.shape(l), jnp.float32) for l in leaves)
    xs_dummy = jnp.zeros((N, 8, 3), jnp.float32)

    @jax.jit
    def bare_scan(st, xs2):
        def step(s, x):
            bump = x[0, 0] + 1.0
            return tuple(a + bump for a in s), x[0, 0]

        return lax.scan(step, st, xs2, unroll=8)

    t_floor, _ = timeit(bare_scan, (st0, xs_dummy))
    stages.append(
        stage(
            "tracker_finish", t, None,
            "sequential lax.scan, unroll=8; floor = measured bare "
            "same-shape scan",
            seq_floor_ms=t_floor * 1e3,
        )
    )

    # end-to-end staged batch (both dispatches chained, one sync)
    def full(c, f):
        m, bl, o = _fused_mask_stage(cfg, c, f, padded_occ=True)
        return _post_mask_stage(
            cfg, c, m, bl, max_components=32, occ128=o, H=H, W=W
        )

    t, _ = timeit(full, (carry, frames))
    fps = N / t
    print(f"{'full staged':24s}: {t*1e3:8.2f} ms  ({fps:,.1f} fps)")

    artifact = {
        "scene": "bench.py make_clip (multi-blob synthetic)",
        "shape": [N, H, W],
        "device": str(jax.devices()[0]),
        "peak_hbm_gbps_assumed": PEAK_HBM_GBPS,
        "peak_vpu_ops_assumed": PEAK_VPU_OPS,
        "peak_mxu_macs_assumed": PEAK_MXU_MACS,
        "compute_model": (
            "per-stage structural VPU-op/MXU-MAC counts (see "
            "bench/roofline.py comments; ±30% fused/stats, ±2x CCL); "
            "compute_floor_ms = max(vpu, mxu) time, or the measured "
            "bare-scan floor for tracker_finish"
        ),
        "fused_grid": {"TH": TH, "TW": TW, "SH": SH, "SW": SW,
                       "raw_window": [RL, CL], "halo": P,
                       "fullwidth_ring": fullwidth},
        "ccl_grid": [Hc, Wc],
        "stages": stages,
        "full_staged_ms": round(t * 1e3, 3),
        "full_staged_fps": round(fps, 1),
    }
    out = os.path.join(os.path.dirname(__file__), "..",
                       "PERF_ROOFLINE.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(f"wrote {os.path.abspath(out)}")


if __name__ == "__main__":
    main()
