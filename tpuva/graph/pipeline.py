"""Batched pipeline compiler + scan driver (T2-T4, SURVEY.md §1.2).

The reference's universal execution model is a per-frame Python loop over
cv2 calls (SURVEY.md §3.1-3.3). Here the whole segmentation+tracking pass
over an N-frame batch is ONE jitted XLA program:

- blur/median run batch-parallel over all N frames,
- the background model — the only sequential dependency in segmentation —
  is a cheap elementwise `lax.scan` over the frame axis (or an
  O(log N)-depth `associative_scan` in `parallel_bg` mode, exploiting the
  linearity of B_t = (1-a) B_{t-1} + a F_t),
- diff/threshold/morphology/CCL/stats run batch-parallel again,
- only the tiny tracker-table update scans per frame.

Carry (background, tracker table, frame counter) stays on device across
batches — the rolling state of BASELINE.json:10.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tpuva.graph.config import PipelineConfig
from tpuva.ops import (
    background_update,
    connected_components_with_stats,
    gaussian_blur_u8,
    median_blur,
    morph_close,
    morph_open,
    structuring_element,
    threshold,
)
from tpuva.ops.label import extract_detections
from tpuva.track import TrackState, init_track_state, track_update


class PipelineCarry(NamedTuple):
    bg: jnp.ndarray  # (H, W) float32 background model
    bg_valid: jnp.ndarray  # () bool — False until seeded from first frame
    track: TrackState
    frame_idx: jnp.ndarray  # () int32 — global index of next frame


def init_carry(
    cfg: PipelineConfig, H: int, W: int, background0: Optional[np.ndarray] = None
) -> PipelineCarry:
    if background0 is not None:
        bg = jnp.asarray(background0, jnp.float32)
        valid = jnp.bool_(True)
    else:
        bg = jnp.zeros((H, W), jnp.float32)
        valid = jnp.bool_(False)
    return PipelineCarry(
        bg=bg,
        bg_valid=valid,
        track=init_track_state(cfg.track.max_tracks),
        frame_idx=jnp.int32(0),
    )


def filter_batch(cfg: PipelineConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """The stateless filter prefix (blur, median) on a float32 batch.

    Blur runs as gaussian_blur_u8: the reference feeds cv2 uint8 frames,
    so the blur output re-quantizes to u8 (bit-exact fixed-point
    emulation) before the background model / diff / threshold see it —
    this is what makes blur-enabled configs mask-bit-equal to refimpl.
    Median of integer-valued floats then selects the same values cv2's
    u8 median does, so no further quantization is needed."""
    f = frames
    if cfg.blur is not None:
        f = gaussian_blur_u8(f, cfg.blur.ksize, cfg.blur.sigma)
    if cfg.median is not None:
        f = median_blur(f, cfg.median.ksize)
    return f


def background_trajectory(
    bg0: jnp.ndarray, frames: jnp.ndarray, alpha: float, parallel: bool = False
) -> jnp.ndarray:
    """All post-update backgrounds B_1..B_N for a batch.

    sequential: exact refimpl float ordering. parallel: associative scan
    over affine maps (s, o) with B_t = s_t * B_0 + o_t — O(log N) depth.
    """
    if not parallel:
        def step(b, f):
            b = background_update(b, f, alpha)
            return b, b

        _, bgs = lax.scan(step, bg0, frames)
        return bgs
    a = jnp.float32(alpha)
    s = jnp.full((frames.shape[0], 1, 1), 1 - a, jnp.float32)
    o = a * frames

    def combine(p, q):
        s1, o1 = p
        s2, o2 = q
        return s1 * s2, s2 * o1 + o2

    S, O = lax.associative_scan(combine, (s, o), axis=0)
    return S * bg0[None] + O


def _can_fuse(cfg: PipelineConfig) -> bool:
    """The Pallas fused front-end covers blur+median(k=3)+bg+threshold+
    morph in one kernel. Otsu thresholding needs a whole-frame histogram
    — a global statistic the tile-local single-pass kernel cannot see —
    so it takes the STAGED Otsu route instead (_otsu_mask_stage: fused
    diff emit → MXU histogram + per-frame threshold → jnp morphology);
    see _can_stage."""
    return (
        cfg.median is None or cfg.median.ksize in (1, 3)
    ) and cfg.segment.threshold != "otsu"


def _can_stage(cfg: PipelineConfig) -> bool:
    """Configs the staged TPU path (Pallas front-end + raw CCL tail)
    covers: everything _can_fuse does, plus Otsu via the diff-emit
    front-end."""
    return cfg.median is None or cfg.median.ksize in (1, 3)


@partial(jax.jit, static_argnames=("cfg",))
def _otsu_mask_stage(cfg: PipelineConfig, carry: "PipelineCarry", frames):
    """Staged Otsu front-end: the fused Pallas kernel emits rounded
    |F - B| uint8 magnitudes (VMEM-resident blur/median/background — the
    expensive float work), a tiny MXU-histogram dispatch finds each
    frame's Otsu threshold, and the jnp morphology ops finish the mask.
    Bit-identical to process_batch's jnp Otsu path (same rint quantize,
    same strict compare, same cv2 morphology)."""
    from tpuva.ops.filters import otsu_threshold
    from tpuva.ops.pallas import fused_segment

    bg0 = jnp.where(
        carry.bg_valid,
        carry.bg,
        filter_batch(cfg, frames[:1].astype(jnp.float32))[0],
    )
    du8, bg_last = fused_segment(
        frames,
        bg0,
        alpha=cfg.background.alpha,
        threshold=0.0,
        blur_ksize=cfg.blur.ksize if cfg.blur else 0,
        blur_sigma=cfg.blur.sigma if cfg.blur else 0.0,
        median_ksize=(
            cfg.median.ksize if cfg.median and cfg.median.ksize > 1 else 0
        ),
        emit="diff",
    )
    thr = otsu_threshold(du8)  # (N,) float32
    mask = jnp.where(
        du8.astype(jnp.int32) > thr.astype(jnp.int32)[:, None, None],
        jnp.uint8(255),
        jnp.uint8(0),
    )
    if cfg.morph_open is not None:
        se = structuring_element(cfg.morph_open.shape, cfg.morph_open.ksize)
        mask = morph_open(mask, se, cfg.morph_open.iterations)
    if cfg.morph_close is not None:
        se = structuring_element(
            cfg.morph_close.shape, cfg.morph_close.ksize
        )
        mask = morph_close(mask, se, cfg.morph_close.iterations)
    return mask, bg_last


@partial(jax.jit, static_argnames=("cfg", "padded_occ"))
def _fused_mask_stage(
    cfg: PipelineConfig, carry: "PipelineCarry", frames,
    padded_occ: bool = False,
):
    from tpuva.ops.pallas import fused_segment

    bg0 = jnp.where(
        carry.bg_valid,
        carry.bg,
        filter_batch(cfg, frames[:1].astype(jnp.float32))[0],
    )
    return fused_segment(
        frames,
        bg0,
        padded_occ=padded_occ,
        alpha=cfg.background.alpha,
        threshold=cfg.segment.threshold,
        blur_ksize=cfg.blur.ksize if cfg.blur else 0,
        blur_sigma=cfg.blur.sigma if cfg.blur else 0.0,
        median_ksize=(
            cfg.median.ksize if cfg.median and cfg.median.ksize > 1 else 0
        ),
        open_shape=cfg.morph_open.shape if cfg.morph_open else "rect",
        open_ksize=cfg.morph_open.ksize if cfg.morph_open else 0,
        open_iters=cfg.morph_open.iterations if cfg.morph_open else 1,
        close_shape=cfg.morph_close.shape if cfg.morph_close else "rect",
        close_ksize=cfg.morph_close.ksize if cfg.morph_close else 0,
        close_iters=cfg.morph_close.iterations if cfg.morph_close else 1,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "return_masks", "max_components", "sparse_strips", "H", "W",
        "compact", "compact_slots", "return_labels", "ccl_single_pass",
    ),
)
def _post_mask_stage(
    cfg: PipelineConfig,
    carry: "PipelineCarry",
    mask: jnp.ndarray,
    bg_last: jnp.ndarray,
    return_masks: bool = False,
    max_components: int = 64,
    sparse_strips: int = 256,
    occ128: jnp.ndarray | None = None,
    H: int | None = None,
    W: int | None = None,
    compact: bool = True,
    compact_slots: int = 48,
    return_labels: bool = False,
    ccl_single_pass: bool = False,
):
    """Tiled CCL + stats + detection extraction + tracker scan (staged TPU
    path — see process_batch_staged).

    ccl_single_pass=True (compact path only) runs the gen-8 single-pass
    kernel + record-level reconcile (_stats_from_compact(reconcile=True))
    — bit-identical stats at a scene-shape-independent kernel cost (the
    multi-pass frontier re-sweeps cost ~7.7 ms/batch-256 on the 1080p
    bench scene and ~28 ms on corner-straddle scenes). Reconcile capacity
    events are folded into out["stats_overflow"] so the existing strict
    checks surface them; return_labels forces the multi-pass kernel (the
    raw buffer must be converged for labels_from_raw).

    Gen-5 tail (compact=True, default): the RAW-buffer CCL kernel also
    DMAs each occupied tile's converged block into a dense per-frame
    compact buffer, and _stats_from_compact reads label data from it with
    ZERO gathers (the raw path's strip gather + selection chains were
    ~17 ms of the 81 ms staged batch at 1080p/256). Capacity is
    tile-granular: ceil(sparse_strips / 32) tiles ≈ the same foreground
    budget as the sparse-strip path.

    Gen-4 tail (compact=False): the RAW-buffer CCL kernel (no label-map
    fill, no epilogue pass) feeds _stats_from_raw, whose only label reads
    are row gathers of occupied strips.

    Two entry shapes:
    - occ128 given (fast path): `mask` is the fused kernel's UNCROPPED
      (N, Hp, Wp) padded mask (zero outside the true (H, W) image) and
      occ128 its in-kernel (2-row x 128-col) occupancy — no full-image op
      of any kind runs here; the (2x256) strip occupancy is a pairwise max
      over the tiny occ128 array.
    - occ128 None: `mask` is the cropped (N, H, W) mask; it is zero-padded
      to the CCL grid and occupancy is reduced from it (one full-image
      pass). Used when the fused grid doesn't align to the CCL tiling and
      by non-fused callers.

    Stats use the sparse-strip contraction (capacity `sparse_strips` x 512
    foreground pixels per frame); frames exceeding it are reported in
    out["stats_overflow"] (their stats silently drop the excess strips —
    raise the capacity if the workload is that dense)."""
    from tpuva.ops.label import _stats_from_compact, _stats_from_raw
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    if occ128 is not None:
        N = mask.shape[0]
        mp = mask
        mfin = mask[:, :H, :W]  # DCE'd unless return_masks
        Nn, Hb, Qc2 = occ128.shape
        strip_occ = occ128.reshape(Nn, Hb, Qc2 // 2, 2).max(axis=3)
    else:
        N, H, W = mask.shape
        mfin = mask
        Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256
        mp = (
            mask
            if (Hp, Wp) == (H, W)
            else jnp.pad(mask, ((0, 0), (0, Hp - H), (0, Wp - W)))
        )
        # per-(2-row x 256-col) scan-key-strip occupancy: the shared
        # source of truth for CCL tile skipping, halo masking, AND the
        # stats gather
        o1 = lax.reduce_window(
            mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
        )
        strip_occ = lax.reduce_window(
            o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
        )
    if compact:
        # 16-row slots: capacity = foreground scattered across up to
        # `compact_slots` distinct 16-row bands. The stats contraction
        # cost scales with slots (8 strips each), so this is a knob, not
        # a free ceiling: 48 covers 6-8 blob-sized objects straddling
        # band boundaries with margin (bench scene max 27, soak scene
        # ~36 worst case); strict mode raises with the knob's name when
        # a denser scene needs more.
        sp = ccl_single_pass and not return_labels
        labraw, cbuf, ccl_converged = label_components_tiled_raw(
            mp, strip_occ, H, W, compact_slots=compact_slots,
            single_pass=sp,
        )
        stats = _stats_from_compact(
            cbuf, strip_occ, H, W, max_components=max_components,
            reconcile=sp,
        )
    else:
        labraw, ccl_converged = label_components_tiled_raw(
            mp, strip_occ, H, W
        )
        stats = _stats_from_raw(
            labraw, strip_occ, H, W,
            max_components=max_components, sparse_strips=sparse_strips,
        )
    carry2, out = _finish_batch(
        cfg, carry, stats, mfin, bg_last, return_masks
    )
    out["stats_overflow"] = stats["overflow"] + stats.get(
        "reconcile_overflow", jnp.zeros_like(stats["overflow"])
    )
    out["ccl_converged"] = ccl_converged
    if return_labels:
        # opt-in dense cv2-id label maps (full-image op; annotation /
        # measurement consumers only — the tracking path never pays it)
        from tpuva.ops.label import labels_from_raw

        out["labels"] = labels_from_raw(
            labraw, strip_occ, stats["root_table"], H, W
        )
    return carry2, out


def _finish_batch(cfg, carry, stats, mask, bg_last, return_masks):
    dets, n_det, det_valid, det_sums = extract_detections(
        stats, cfg.segment.min_area, cfg.segment.max_blobs
    )

    def step(ts: TrackState, inp):
        d, dv, fi = inp
        ts, rows, rv = track_update(
            ts,
            d,
            dv,
            fi,
            max_dist=cfg.track.max_dist,
            death_patience=cfg.track.death_patience,
            assigner=cfg.track.assigner,
        )
        return ts, (rows, rv)

    N = mask.shape[0]
    fidx = carry.frame_idx + jnp.arange(N, dtype=jnp.int32)
    # unroll: the scan loop itself costs ~14 us/step at batch 256 on v5e
    # (measured, bench/track_probe.py) — ~2.5x the tracker body. Unrolling
    # 8 steps per iteration amortizes that sequencing to ~2 us/frame with
    # an identical trace per step (no semantic change).
    tstate, (rows, row_valid) = lax.scan(
        step, carry.track, (dets, det_valid, fidx),
        unroll=8 if N % 8 == 0 else 1,
    )
    new_carry = PipelineCarry(
        bg=bg_last,
        bg_valid=jnp.bool_(True),
        track=tstate,
        frame_idx=carry.frame_idx + N,
    )
    out = {
        "rows": rows,
        "row_valid": row_valid,
        "n_det": n_det,
        "row_sums": det_sums,
        # end-of-batch active-track count (SURVEY §5.5 observability) —
        # computed on device, rides the same drain transfer as the rows
        "active_tracks": jnp.sum(tstate.active, dtype=jnp.int32),
    }
    if return_masks:
        out["masks"] = mask
    return new_carry, out


def process_batch_staged(
    cfg: PipelineConfig,
    carry: "PipelineCarry",
    frames: jnp.ndarray,
    return_masks: bool = False,
    max_components: int = 64,
    sparse_strips: int = 256,
    compact_slots: int = 48,
    return_labels: bool = False,
    ccl_single_pass: bool = False,
):
    """TPU fast path: the pipeline as two jitted dispatches (Pallas fused
    mask kernel; then tiled CCL + stats + tracker).

    Dispatches chain asynchronously on device — the host never blocks
    between them — while keeping per-stage XLA programs small: compiling
    the fused mask kernel together with the CCL while-loop sends compile
    time superlinear (~200s vs ~20s total for the stages).

    When the fused kernel's padded grid aligns to the CCL tiling (64-row /
    256-col; true at 1080p), the stages hand off the UNCROPPED padded mask
    plus in-kernel strip occupancy — no crop, re-pad, or full-image
    occupancy reduction between them."""
    from tpuva.ops.pallas.fused_segment import fused_tile

    if ccl_single_pass and return_labels:
        import warnings

        warnings.warn(
            "return_labels=True forces the multi-pass CCL kernel: dense "
            "label maps need a converged raw buffer, which the "
            "single-pass kernel deliberately does not produce "
            "(ops/pallas/ccl.py). ccl_single_pass is ignored for this "
            "call; stats/tracking outputs are identical either way.",
            stacklevel=2,
        )
    N, H, W = frames.shape
    if cfg.segment.threshold == "otsu":
        mask, bg_last = _otsu_mask_stage(cfg, carry, frames)
        return _post_mask_stage(
            cfg, carry, mask, bg_last,
            return_masks=return_masks, max_components=max_components,
            sparse_strips=sparse_strips, compact_slots=compact_slots,
            return_labels=return_labels, ccl_single_pass=ccl_single_pass,
        )
    _th, _tw, Hp, Wp = fused_tile(H, W)
    if Hp % 64 == 0 and Wp % 256 == 0:
        mask, bg_last, occ128 = _fused_mask_stage(
            cfg, carry, frames, padded_occ=True
        )
        return _post_mask_stage(
            cfg, carry, mask, bg_last,
            return_masks=return_masks, max_components=max_components,
            sparse_strips=sparse_strips, occ128=occ128, H=H, W=W,
            compact_slots=compact_slots, return_labels=return_labels,
            ccl_single_pass=ccl_single_pass,
        )
    mask, bg_last = _fused_mask_stage(cfg, carry, frames)
    return _post_mask_stage(
        cfg, carry, mask, bg_last,
        return_masks=return_masks, max_components=max_components,
        sparse_strips=sparse_strips, compact_slots=compact_slots,
        return_labels=return_labels, ccl_single_pass=ccl_single_pass,
    )


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "parallel_bg", "return_masks", "max_components",
        "use_pallas", "ccl_single_pass", "compact_slots",
    ),
)
def process_batch(
    cfg: PipelineConfig,
    carry: PipelineCarry,
    frames: jnp.ndarray,  # (N, H, W) uint8 grayscale
    parallel_bg: bool = False,
    return_masks: bool = False,
    max_components: int = 64,
    use_pallas: bool = False,
    ccl_single_pass: bool = False,
    compact_slots: int = 48,
):
    """One fused device program over an N-frame batch.

    use_pallas=True runs the segmentation front-end as the VMEM-resident
    Pallas kernel (tpuva.ops.pallas.fused_segment — bit-identical to the
    jnp path, ~free vs dispatch overhead); requires cfg.median is None.

    ccl_single_pass=True swaps the dense CCL for the gen-8 tiled
    single-pass kernel + record-level reconcile (same path as the staged
    pipeline's flag — see _post_mask_stage): bit-identical rows at a
    scene-shape-independent kernel cost, with out gaining the
    "stats_overflow" / "ccl_converged" strictness fields. This makes the
    single-pass mode available everywhere process_batch runs — incl.
    per-stream under the ('stream',) shard_map and vmap multistream
    processors (tests/test_single_pass_modes.py).

    Returns (new_carry, out) with out:
      rows      (N, max_blobs, 5) float32 — (track_id, frame, x, y, area)
      row_valid (N, max_blobs) bool
      n_det     (N,) int32
      masks     (N, H, W) uint8, only if return_masks
    """
    if use_pallas and _can_fuse(cfg):
        mask, bg_last = _fused_mask_stage(cfg, carry, frames)
    else:
        f = filter_batch(cfg, frames.astype(jnp.float32))
        bg0 = jnp.where(carry.bg_valid, carry.bg, f[0])
        bgs = background_trajectory(bg0, f, cfg.background.alpha, parallel_bg)
        bg_last = bgs[-1]
        diff = jnp.abs(f - bgs)
        if cfg.segment.threshold == "otsu":
            from tpuva.ops.filters import otsu_threshold

            du8 = jnp.clip(jnp.rint(diff), 0, 255).astype(jnp.uint8)
            thr = otsu_threshold(du8)  # (N,) per-frame
            mask = jnp.where(
                du8.astype(jnp.int32) > thr.astype(jnp.int32)[:, None, None],
                jnp.uint8(255),
                jnp.uint8(0),
            )
        else:
            mask = threshold(diff, cfg.segment.threshold)
        if cfg.morph_open is not None:
            se = structuring_element(cfg.morph_open.shape, cfg.morph_open.ksize)
            mask = morph_open(mask, se, cfg.morph_open.iterations)
        if cfg.morph_close is not None:
            se = structuring_element(
                cfg.morph_close.shape, cfg.morph_close.ksize
            )
            mask = morph_close(mask, se, cfg.morph_close.iterations)
    if ccl_single_pass:
        return _post_mask_stage(
            cfg, carry, mask, bg_last, return_masks=return_masks,
            max_components=max_components, compact_slots=compact_slots,
            ccl_single_pass=True,
        )
    stats = connected_components_with_stats(
        mask,
        max_components=max_components,
        compute_bbox=False,
        compute_labels=False,
    )
    return _finish_batch(cfg, carry, stats, mask, bg_last, return_masks)


def collect_rows_array(rows: np.ndarray, row_valid: np.ndarray,
                       max_frame=None,
                       row_sums: np.ndarray | None = None) -> np.ndarray:
    """Host-side: flatten (N, D, 5) device rows into a (k, 5) float64
    array of (track_id, frame, x, y, area), in (frame, slot) order —
    vectorized numpy (the per-row Python loop cost ~35% of streamed
    driver time at 100k-frame scale).

    When row_sums (N, D, 2 int32 of sx, sy) is given, centroids are
    recomputed as float64 sx/area — bit-identical to
    cv2.connectedComponentsWithStats (float32→float64 widening of the
    stored columns is exact, so this matches the scalar path bit for
    bit)."""
    rows = np.asarray(rows)
    row_valid = np.asarray(row_valid)
    D = rows.shape[-1]
    r2 = rows.reshape(-1, D)
    sel = row_valid.reshape(-1)
    if max_frame is not None:
        sel = sel & (r2[:, 1] < max_frame)
    out = r2[sel].astype(np.float64)
    if row_sums is not None:
        s2 = np.asarray(row_sums).reshape(-1, 2)[sel].astype(np.float64)
        area = out[:, 4]
        out[:, 2] = s2[:, 0] / area
        out[:, 3] = s2[:, 1] / area
    return out


def collect_rows(rows: np.ndarray, row_valid: np.ndarray, max_frame=None,
                 row_sums: np.ndarray | None = None):
    """collect_rows_array, as the legacy list of python tuples
    ((int, int, float, float, float) per row)."""
    arr = collect_rows_array(rows, row_valid, max_frame, row_sums)
    return [
        (int(r[0]), int(r[1]), float(r[2]), float(r[3]), float(r[4]))
        for r in arr
    ]


def process_clip(
    clip: np.ndarray,
    cfg: PipelineConfig,
    background0: Optional[np.ndarray] = None,
    parallel_bg: bool = False,
    return_masks: bool = False,
    max_components: int = 64,
    use_pallas: bool = False,
    ccl_single_pass: bool = False,
):
    """Host convenience driver: run a whole (T, H, W) uint8 clip through
    batched device processing. Returns (rows, final_carry, masks-or-None).

    The final partial batch is padded by repeating the last frame; padded
    frames' rows are dropped (tracker/background perturbation past the clip
    end is discarded with the final carry).

    The staged TPU path's capacity diagnostics (sparse-strip stats
    overflow, CCL round cap) raise a RuntimeError — silent accuracy loss
    is never returned.
    """
    T, H, W = clip.shape
    N = cfg.batch
    carry = init_carry(cfg, H, W, background0)
    all_rows = []
    masks = [] if return_masks else None
    for start in range(0, T, N):
        chunk = clip[start : start + N]
        n = chunk.shape[0]
        if n < N:
            pad = np.repeat(chunk[-1:], N - n, axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        if use_pallas and _can_stage(cfg) and jax.default_backend() == "tpu":
            carry, out = process_batch_staged(
                cfg,
                carry,
                jnp.asarray(chunk),
                return_masks=return_masks,
                max_components=max_components,
                ccl_single_pass=ccl_single_pass,
            )
        else:
            carry, out = process_batch(
                cfg,
                carry,
                jnp.asarray(chunk),
                parallel_bg=parallel_bg,
                return_masks=return_masks,
                max_components=max_components,
                use_pallas=use_pallas,
                ccl_single_pass=ccl_single_pass,
            )
        if "stats_overflow" in out:
            ov = np.asarray(out["stats_overflow"][:n])
            if (ov > 0).any():
                raise RuntimeError(
                    f"sparse-strip stats overflow on {int((ov > 0).sum())} "
                    "frame(s) — raise compact_slots/sparse_strips for this "
                    "workload"
                )
        if "ccl_converged" in out and not bool(np.asarray(out["ccl_converged"])):
            raise RuntimeError(
                "tiled CCL hit its round cap without converging"
            )
        all_rows.extend(
            collect_rows(
                out["rows"], out["row_valid"], max_frame=T,
                row_sums=out["row_sums"],
            )
        )
        if return_masks:
            masks.append(np.asarray(out["masks"])[:n])
    if return_masks:
        masks = np.concatenate(masks, axis=0)
    return all_rows, carry, masks
