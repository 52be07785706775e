"""Fused segmentation front-end as a Pallas TPU kernel (SURVEY.md §7.1
step 8: "fuse background-update + blur + threshold + morphology into one
VMEM-resident kernel per tile").

One kernel instance owns a spatial tile and loops over the N frames of the
batch, carrying the background-model tile in VMEM the whole time:

    HBM traffic per pixel per frame = 1 uint8 read (frame) + 1 uint8 write
    (mask) — the speed-of-light for this stage. The XLA path re-reads and
    re-writes float32 intermediates between every op (~20-40 bytes/px).

Correctness contract (same as the jnp ops, golden-tested):
- Gaussian blur: cv2's UINT8 fixed-point path, bit-exact (the jnp twin is
  tpuva.ops.gaussian_blur_u8): binomial kernels as the exact cascade,
  others as the u8_gaussian_taps integer correlation — both re-quantized
  to integer u8 values (floor(y + 0.5) == cv2's (acc + 2^15) >> 16)
  before the background update sees them, exactly as the reference's
  cv2-on-uint8 loop does. REFLECT_101 borders — realized by computing on
  reflected halo pixels. On production shapes the kernel builds that
  halo itself (raw-window mode: aligned over-read of the raw frames +
  two VMEM rolls + edge-tile reflect selects — zero pad traffic);
  small/unaligned inputs fall back to a one-time XLA pre-pad of the
  batch. Both paths are bit-identical.
- median (k=3 only): cv2.medianBlur BORDER_REPLICATE semantics — shifted
  reads are clamped to the image rectangle via global-coordinate selects
  (replicate = read at clamped coordinate), then the exact 19-op
  median-of-9 network (order statistic: any correct network is bit-equal).
- background: B <- (1-alpha) B + alpha F, float32, sequential over frames.
- threshold: strict |F - B| > thr.
- morphology open/close: cv2 constant-border semantics (erode treats
  outside-image as foreground, dilate as background), enforced in-kernel
  with global-coordinate masks. Structuring elements are applied as
  per-row contiguous runs (true for cv2 RECT and ELLIPSE rasterizations):
  one shared row-reduction per distinct run extent + one roll per SE row —
  ~2k ops instead of k² for rects.

VPU-op economy (this stage is compute-bound, not HBM-bound): frames with
no pixel above threshold in the tile skip morphology entirely and write a
zero mask — exact, because open/close of an all-zero tile is zero under
cv2 border rules.

Halo math: a tile is computed with P = blur_radius + median_radius +
morph_reach extra pixels on every side; per-frame circular rolls
contaminate at most (blur_radius + median_radius) edge pixels, and each
morphology step consumes one more halo ring, so the owned region is exact.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuva.ops.filters import (
    _median9,
    is_binomial_blur,
    structuring_element,
    u8_gaussian_taps,
)


def _se_rows(shape: str, ksize: int):
    """SE as per-row contiguous runs: ((dy, dx_lo, dx_hi), ...)."""
    se = structuring_element(shape, ksize)
    r = ksize // 2
    rows = []
    for dy in range(ksize):
        xs = np.where(se[dy])[0]
        if len(xs) == 0:
            continue
        assert (np.diff(xs) == 1).all(), "SE row is not a contiguous run"
        rows.append((dy - r, int(xs[0]) - r, int(xs[-1]) - r))
    return tuple(rows)


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() != "tpu"


def _roll2(x, dy: int, dx: int):
    """Circular shift so out[y, x] = in[y+dy, x+dx]."""
    if dy:
        x = pltpu.roll(x, -dy % x.shape[0], axis=0)
    if dx:
        x = pltpu.roll(x, -dx % x.shape[1], axis=1)
    return x


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


def fused_tile(H: int, W: int) -> tuple:
    """Default tile choice: (TH, TW, Hp, Wp). Exposed so callers (e.g. the
    staged pipeline) can predict the padded grid and pick the
    padded-output fast path when it aligns with the CCL tiling."""
    TH = 96 if H > 128 else _ceil_to(H, 32)
    TW = 1024 if W > 1024 else _ceil_to(W, 128)
    return TH, TW, -(-H // TH) * TH, -(-W // TW) * TW


def _auto_tile(H: int, W: int, P: int) -> tuple:
    """Tile choice for tile=None given the total halo radius P.

    Owned-block dims: 32-row aligned (uint8 DMA sublane tiling for the
    per-frame mask write-back) x 128-col aligned. The mask output lives
    in ANY memory space and is written frame-by-frame with
    double-buffered DMA, so tile size is independent of N.

    Full-width upgrade (round 4): at wide resolutions a single tile
    column covering the whole image in a circular ring layout (see
    `fullwidth` in fused_segment) beats the multi-column grid — it
    removes the per-frame dynamic column roll, the column halo
    over-read, and the duplicated inter-column halo compute. The
    upgrade only engages when it PRESERVES fused_tile's padded grid
    (TWfw == Wp0): callers (graph/pipeline.py:400) predict (Hp, Wp)
    via fused_tile to plan the padded-occ -> CCL handoff, and a wider
    ring would both break that prediction and feed dead columns to the
    CCL. At 1080p (P <= 64) and 4K this is a strict win; at W = 1024
    the ring would need Wp = 1280 > 1024, so it stays on the old grid.
    """
    TH, TW, _, Wp0 = fused_tile(H, W)
    if P >= 1 and W >= 1024 and W % 128 == 0 and H % 8 == 0:
        TWfw = _ceil_to(W + 2 * P, 256)
        if TWfw == Wp0 and H >= _ceil_to(TH + 2 * P, 8) + _ceil_to(P, 32):
            TW = TWfw
    return TH, TW


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "threshold", "blur_ksize", "blur_sigma", "median_ksize",
        "open_shape", "open_ksize", "open_iters",
        "close_shape", "close_ksize", "close_iters", "tile", "padded_occ",
        "emit",
    ),
)
def fused_segment(
    frames: jnp.ndarray,  # (N, H, W) uint8
    bg0: jnp.ndarray,  # (H, W) float32
    *,
    alpha: float,
    threshold: float,
    blur_ksize: int = 0,  # 0 = no blur
    blur_sigma: float = 0.0,
    median_ksize: int = 0,  # 0 = no median; only 3 supported
    open_shape: str = "rect",
    open_ksize: int = 0,  # 0 = no open
    open_iters: int = 1,
    close_shape: str = "rect",
    close_ksize: int = 0,
    close_iters: int = 1,
    tile: tuple | None = None,
    padded_occ: bool = False,
    emit: str = "mask",
):
    """Returns (masks (N, H, W) uint8 0/255, bg_out (H, W) float32).

    emit="diff" (staged-Otsu front-end, SURVEY §2.2 threshold row):
    instead of thresholded masks, the kernel writes the rounded |F - B|
    as uint8 (bit-equal to the jnp path's clip(rint(|f - bg|))) and does
    no morphology — the caller computes per-frame Otsu thresholds from a
    histogram of this output, then thresholds + morphs. Requires
    open_ksize == close_ksize == 0 and padded_occ=False (occupancy is
    threshold-dependent).

    With padded_occ=True, returns (masks_padded, bg_out, occ128) instead:
    masks_padded is the UNCROPPED (N, Hp, Wp) grid-cover mask with
    out-of-image pixels forced to 0 (so it can feed the tiled CCL with no
    crop/re-pad roundtrip), and occ128 is (N, Hp//2, Wp//128) uint8 —
    any-foreground per (2-row x 128-col) block, computed in-VMEM from the
    just-written mask tile via two tiny MXU matmuls (for a 0/1 mask,
    sum > 0 <=> max > 0). The caller derives the CCL's (2x256)
    scan-key-strip occupancy by pairing adjacent 128-col flags."""
    N, H, W = frames.shape
    if emit not in ("mask", "diff"):
        raise ValueError(emit)
    if N == 0:
        # the kernel epilogue waits on the last frame's mask DMA, which an
        # empty batch never starts — on hardware that wait would deadlock
        # the core, so answer empty batches without entering the kernel
        if padded_occ:
            TH0, TW0 = tile if tile is not None else fused_tile(H, W)[:2]
            gh0, gw0 = -(-H // TH0), -(-W // TW0)
            Hp0, Wp0 = gh0 * TH0, gw0 * TW0
            return (
                jnp.zeros((0, Hp0, Wp0), jnp.uint8),
                bg0.astype(jnp.float32),
                jnp.zeros((0, Hp0 // 2, Wp0 // 128), jnp.uint8),
            )
        return jnp.zeros((0, H, W), jnp.uint8), bg0.astype(jnp.float32)
    if emit == "diff":
        assert not (open_ksize or close_ksize or padded_occ), (
            "diff mode emits pre-threshold magnitudes: no morphology or "
            "occupancy"
        )
    rb = blur_ksize // 2
    assert median_ksize in (0, 3), "fused median supports k=3 only"
    rm = median_ksize // 2
    open_rows = _se_rows(open_shape, open_ksize) if open_ksize else ()
    close_rows = _se_rows(close_shape, close_ksize) if close_ksize else ()
    reach_open = (open_ksize // 2) * open_iters * 2 if open_ksize else 0
    reach_close = (close_ksize // 2) * close_iters * 2 if close_ksize else 0
    P = rb + rm + reach_open + reach_close
    if tile is None:
        TH, TW = _auto_tile(H, W, P)
    else:
        TH, TW = tile
    if padded_occ:
        assert TH % 2 == 0 and TW % 128 == 0
    gh, gw = -(-H // TH), -(-W // TW)
    Hp, Wp = gh * TH, gw * TW
    # DMA slice shapes must be (8, 128)-aligned: keep the logical halo P on
    # the top/left and absorb the alignment slack on the bottom/right
    SH = _ceil_to(TH + 2 * P, 8)
    PRh = SH - TH - P  # bottom slack (>= P)
    # Full-width circular-column mode (round 4): when one tile column
    # covers the whole width with ring slack for both halos, columns are
    # stored CIRCULARLY — owned col c at position c, the right
    # reflect/edge halo in place at [W, SW - P), and the left reflect
    # halo wrapped to positions [SW - P, SW). Every compute op already
    # uses circular rolls, so the math is unchanged; output position p
    # depends on input positions [p - P, p + P] (mod SW), which for the
    # in-image cols [0, W) lie entirely inside the correctly-initialized
    # set [0, W + P) u [SW - P, SW) — the module-docstring halo bound,
    # with the ring seam playing the role of the tile edge. Wins: no
    # per-frame column reposition roll, no column halo over-read (the
    # DMA is full raw rows), and SW = TW instead of TW + 2P + slack.
    fullwidth = (
        P >= 1 and gw == 1 and TW >= W + 2 * P
        and H % 8 == 0 and W % 128 == 0
        and H >= SH + _ceil_to(P, 32)
    )
    if fullwidth:
        SW = TW
        PRw = 0  # no column slack: the ring IS the tile
    else:
        SW = _ceil_to(TW + 2 * P, 128)
        PRw = SW - TW - P

    # Input staging. XLA lowers the u8 batch pre-pad to an elementwise
    # copy at only ~84 GB/s (9.95 ms/batch-128 @1080p — more than the
    # entire VMEM-resident kernel it feeds, measured round 4), and
    # HBM->HBM DMA can't land the interior at the unaligned (P, P) offset
    # the padded layout needs. So on production shapes the kernel skips
    # the pre-pad entirely (raw-window mode): each tile DMAs an ALIGNED
    # over-sized window straight from the raw frame batch, repositions it
    # in VMEM with two dynamic rolls, and edge tiles rebuild the
    # REFLECT_101/edge halo with a handful of masked row/column selects —
    # bit-identical to the padded path (tests/test_pallas_fused.py) with
    # zero pad traffic.
    #
    # Window geometry: read rows [r0, r0 + RL) with r0 32-aligned (u8
    # sublane packing) and RL static; RL is stretched from SH + PRE so
    # that H - RL is 32-aligned, making the bottom clip land the window
    # exactly at the image edge. Columns likewise with 128 alignment.
    PRE, CPRE = _ceil_to(P, 32), _ceil_to(P, 128)
    raw_window = fullwidth or (
        P >= 1
        and H % 8 == 0 and W % 128 == 0
        and H >= SH + PRE and W >= SW + CPRE
    )
    if fullwidth:
        RMAX = (H - SH - PRE) // 32 * 32   # max row window start
        RL = H - RMAX                      # static row window length
        CMAX, CL = 0, W                    # full raw rows, no column halo
        fp = frames
        # The reposition roll amount ar = (P - y0 + r0) % RL is a pure
        # function of the grid row i, taking only a handful of distinct
        # values (3 at 1080p: top tile, interior, bottom-clipped). A
        # dynamic-amount sublane roll costs ~2.5x a static one
        # (bench/repos_probe.py: 1.67 vs 0.66 us per roll+add on the
        # window shape), so when the value set is small the kernel
        # dispatches STATIC rolls under a pl.when chain instead.
        ar_tab = []
        for _i in range(gh):
            _y0 = _i * TH
            _r0 = 32 * min(max((_y0 - PRE) // 32, 0), RMAX // 32)
            ar_tab.append((P - _y0 + _r0) % RL)
        ar_groups = sorted(set(ar_tab))
        static_ar = len(ar_groups) <= 6
    elif raw_window:
        RMAX = (H - SH - PRE) // 32 * 32   # max row window start
        RL = H - RMAX                      # static row window length
        CMAX = (W - SW - CPRE) // 128 * 128
        CL = W - CMAX
        fp = frames
    else:
        RL = CL = RMAX = CMAX = 0
        # one-time XLA pre-pad fallback (small/unaligned inputs):
        # REFLECT_101 halo P, then edge-pad to the tile grid cover +
        # slack (the cover/slack region is never emitted)
        if P:
            fp = jnp.pad(frames, ((0, 0), (P, P), (P, P)), mode="reflect")
        else:
            fp = frames
        fp = jnp.pad(
            fp,
            ((0, 0), (0, Hp + PRh - H - P), (0, Wp + PRw - W - P)),
            mode="edge",
        )
    # the background tile is (H, W) f32 padded ONCE per call — not worth
    # a raw-window path (<4% of the batch's pad traffic was bg)
    bp = jnp.pad(bg0, P, mode="reflect") if P else bg0
    if fullwidth:
        # linear (halo-left) layout, width exactly SW; the kernel rotates
        # the loaded tile into ring layout once per batch
        bp = jnp.pad(
            bp, ((0, Hp + PRh - H - P), (0, Wp - W - 2 * P)), mode="edge"
        )
    else:
        bp = jnp.pad(
            bp, ((0, Hp + PRh - H - P), (0, Wp + PRw - W - P)), mode="edge"
        )

    # non-binomial kernels: cv2's u8 fixed-point taps (integers summing to
    # 256, held as exact f32 values) — every partial sum of the two-pass
    # correlation stays an exact integer < 2^24, so the kernel's roll-based
    # evaluation is bit-identical to the jnp twin's slice-based one
    kblur = (
        tuple(float(v) for v in u8_gaussian_taps(blur_ksize, blur_sigma))
        if blur_ksize
        else ()
    )
    # binomial kernels run as an exact box cascade — same algorithm (and
    # therefore, because every partial sum is an exact integer in f32,
    # bit-identical results) as the jnp twin's _box_cascade_axis
    blur_binom = bool(blur_ksize) and is_binomial_blur(blur_ksize, blur_sigma)
    if blur_binom:
        # COLUMN pass as one banded MXU matmul (round 4): the inputs are
        # uint8 values (bf16-exact <= 255) and the integer binomial taps
        # are bf16-exact too, so with f32 accumulation every product and
        # partial sum is the same exact integer the VPU cascade produces;
        # separable convolution commutes over exact integers, so running
        # column-first then the row cascade is BIT-IDENTICAL to the
        # row-first double cascade — while replacing 2k-2 full-window
        # sublane roll+adds with one MXU op. Window-edge rows differ
        # (zero taps beyond the window vs the cascade's circular wrap)
        # strictly inside the don't-care halo contamination band the
        # tile geometry already accounts for (halo math, module
        # docstring); any_fg can only flip spuriously TRUE there, which
        # is a perf non-event, never an accuracy one.
        btaps = [1]
        for _ in range(blur_ksize - 1):
            btaps = np.convolve(btaps, [1, 1]).tolist()
        wc = np.zeros((SH, SH), np.float32)
        for di, tap in enumerate(btaps):
            off = di - rb
            idx = np.arange(max(0, -off), min(SH, SH - off))
            wc[idx, idx + off] = tap
        Wc = jnp.asarray(wc, dtype=jnp.bfloat16)  # passed as a kernel input
    a = float(alpha)
    thr = float(threshold)

    def kernel(fp_ref, bp_ref, *refs):
        refs = list(refs)
        if blur_binom:
            wc_ref = refs.pop(0)
        if padded_occ:
            mask_ref, bgout_ref, occ_ref = refs[:3]
            refs = refs[3:]
        else:
            mask_ref, bgout_ref = refs[:2]
            refs = refs[2:]
        if raw_window:
            (ftile, fbuf, bgt, mbuf, sem, bsem, wsem) = refs
        else:
            (ftile, bgt, mbuf, sem, bsem, wsem) = refs
        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = i * TH
        x0 = j * TW
        # column offset of owned pixel 0 inside the compute buffer:
        # P in the linear layouts, 0 in the full-width ring layout
        COFF = 0 if fullwidth else P
        if raw_window:
            # aligned raw-frame window start + VMEM reposition amounts
            r0 = 32 * jnp.clip((y0 - PRE) // 32, 0, RMAX // 32)
            ar = (P - y0 + r0) % RL
            if fullwidth:
                c0 = 0  # full raw rows; ring layout needs no column roll
            else:
                c0 = 128 * jnp.clip((x0 - CPRE) // 128, 0, CMAX // 128)
                ac = (P - x0 + c0) % CL

        # in-image predicate over the OWNED block: out-of-image mask
        # pixels are forced to 0 so the uncropped padded mask is exactly
        # the zero-padded image mask (what the CCL front expects)
        oy = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 0) + y0
        ox = jax.lax.broadcasted_iota(jnp.int32, (TH, TW), 1) + x0
        inown = (oy < H) & (ox < W)
        if padded_occ:
            # row-pair / col-block selector matrices for the occupancy
            # contraction (0/255 mask: sum > 0 <=> any set). bf16 inputs,
            # f32 accumulation — exact for 0/255 entries. cp is widened to
            # 128 lanes (TPU block minor-dim alignment); lanes >= TW//128
            # come out zero and are sliced off after the kernel.
            rp = (
                jax.lax.broadcasted_iota(jnp.int32, (TH // 2, TH), 0)
                == (jax.lax.broadcasted_iota(
                    jnp.int32, (TH // 2, TH), 1) >> 1)
            ).astype(jnp.bfloat16)
            cp = (
                (jax.lax.broadcasted_iota(jnp.int32, (TW, 128), 0) >> 7)
                == jax.lax.broadcasted_iota(jnp.int32, (TW, 128), 1)
            ).astype(jnp.bfloat16)

        def mask_wr(slot, t):
            return pltpu.make_async_copy(
                mbuf.at[slot],
                mask_ref.at[t, pl.ds(y0, TH), pl.ds(x0, TW)],
                wsem.at[slot],
            )

        # global image coordinates of every tile pixel (rows: offset by
        # -P; cols: ring positions >= SW - P hold the wrapped left halo)
        gy = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 0) + y0 - P
        iotc = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 1)
        if fullwidth:
            gx = jnp.where(iotc >= SW - P, iotc - SW, iotc)
        else:
            gx = iotc + x0 - P
        in_img = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)

        # load the background tile (with halo) once
        bdma = pltpu.make_async_copy(
            bp_ref.at[pl.ds(y0, SH), pl.ds(x0, SW)], bgt, bsem
        )
        bdma.start()
        bdma.wait()
        if fullwidth:
            # rotate the linear (halo-left) bg tile into ring layout:
            # position p <- source p + P, wrapping the left halo to the
            # ring's end (once per batch)
            bgt[:] = pltpu.roll(bgt[:], (-P) % SW, axis=1)

        def frame_dma(slot, t):
            if raw_window:
                return pltpu.make_async_copy(
                    fp_ref.at[t, pl.ds(r0, RL), pl.ds(c0, CL)],
                    ftile.at[slot],
                    sem.at[slot],
                )
            return pltpu.make_async_copy(
                fp_ref.at[t, pl.ds(y0, SH), pl.ds(x0, SW)],
                ftile.at[slot],
                sem.at[slot],
            )

        frame_dma(0, 0).start()

        def fix_borders():
            """Rebuild the REFLECT_101/edge halo in-place on fbuf for
            tiles touching an image border (column fixes first, then row
            fixes, so corner pixels read already-fixed columns — same
            separable order as jnp.pad). Sources are interior positions,
            targets are halo positions, so sequential selects never read
            a target. Rows/cols beyond reach P of any in-image owned
            pixel are don't-care for the owned outputs (halo math, module
            docstring) but are still set by the trailing edge select, so
            the spurious-any_fg rate matches the padded path."""
            iot1 = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 1)
            iot0 = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 0)

            def col_of(g, s):
                return jnp.broadcast_to(g[:, s:s + 1], (SH, SW))

            def row_of(g, s):
                return jnp.broadcast_to(g[s:s + 1, :], (SH, SW))

            if fullwidth:
                # the single tile column touches BOTH image edges; ring
                # positions [W, SW) are rebuilt every frame (they start
                # as stale/garbage lanes beyond the raw-row store):
                # [W, W+P) right reflect halo, [W+P, SW-P) seam fill
                # (don't-care, set for NaN-safety + edge-pad parity),
                # [SW-P, SW) wrapped left reflect halo. Sources are all
                # interior columns, never targets — so the whole rebuild
                # operates on ONLY the (SH, SW - W) target block (a
                # lane-aligned slice: W % 128 == 0, SW % 256 == 0),
                # 1/16th the full-buffer selects the first cut used
                # (this was the largest VPU block of the base kernel).
                TGT = SW - W

                def colb(s):
                    return jnp.broadcast_to(fbuf[:, s:s + 1], (SH, TGT))

                iotb = jax.lax.broadcasted_iota(jnp.int32, (SH, TGT), 1)
                blk = colb(W - 1 - P)  # seam fill (edge-pad parity)
                for k in range(P):  # wrapped left halo <- source P - k
                    blk = jnp.where(iotb == TGT - P + k, colb(P - k), blk)
                for gxv in range(W, W + P):  # reflect 2W - 2 - gxv
                    blk = jnp.where(
                        iotb == gxv - W, colb(2 * W - 2 - gxv), blk
                    )
                fbuf[:, W:SW] = blk
            else:
                @pl.when(j == 0)
                def _():
                    g = fbuf[:]
                    for s in range(P):  # gx = s - P < 0 -> source P - s
                        g = jnp.where(iot1 == s, col_of(g, 2 * P - s), g)
                    fbuf[:] = g

                @pl.when(j == gw - 1)
                def _():
                    g = fbuf[:]
                    xs = (gw - 1) * TW
                    for gxv in range(W, min(W + P, xs + SW - P)):
                        s = gxv - xs + P  # reflect: source 2W - 2 - gxv
                        g = jnp.where(
                            iot1 == s,
                            col_of(g, 2 * W - 2 - gxv - xs + P), g,
                        )
                    s0 = W + P - xs + P  # edge run: source W - 1 - P
                    if s0 < SW:
                        g = jnp.where(iot1 >= s0, col_of(g, W - 1 - xs), g)
                    fbuf[:] = g

            @pl.when(i == 0)
            def _():
                g = fbuf[:]
                for s in range(P):  # gy = s - P < 0 -> source P - s
                    g = jnp.where(iot0 == s, row_of(g, 2 * P - s), g)
                fbuf[:] = g

            @pl.when(i == gh - 1)
            def _():
                g = fbuf[:]
                ys = (gh - 1) * TH
                for gyv in range(H, min(H + P, ys + SH - P)):
                    s = gyv - ys + P
                    g = jnp.where(
                        iot0 == s, row_of(g, 2 * H - 2 - gyv - ys + P), g
                    )
                s0 = H + P - ys + P
                if s0 < SH:
                    g = jnp.where(iot0 >= s0, row_of(g, H - 1 - ys), g)
                fbuf[:] = g

        def morph(m, rows, is_erode: bool, iters: int):
            fill = 1.0 if is_erode else 0.0
            op = jnp.minimum if is_erode else jnp.maximum
            for _ in range(iters):
                mm = jnp.where(in_img, m, fill)
                cache = {}

                def rowreduce(lo, hi):
                    if (lo, hi) not in cache:
                        acc = None
                        for dx in range(lo, hi + 1):
                            v = _roll2(mm, 0, dx)
                            acc = v if acc is None else op(acc, v)
                        cache[(lo, hi)] = acc
                    return cache[(lo, hi)]

                out = None
                for dy, lo, hi in rows:
                    v = _roll2(rowreduce(lo, hi), dy, 0)
                    out = v if out is None else op(out, v)
                m = out
            return m

        def body(t, carry):
            slot = t % 2
            nxt = (t + 1) % 2

            @pl.when(t + 1 < N)
            def _():
                frame_dma(nxt, t + 1).start()

            frame_dma(slot, t).wait()
            if raw_window:
                # reposition the aligned raw window so position (s, c)
                # holds global pixel (y0 - P + s, x0 - P + c) — rows
                # only in full-width mode (ring columns sit at their
                # global positions already) — then rebuild the
                # reflect/edge halo in-place. Mosaic has no direct
                # u8 <-> f32 cast (hop through int32); dynamic rotates
                # need 32-bit data.
                b = ftile[slot].astype(jnp.int32)
                if fullwidth and static_ar:
                    # static-amount rolls dispatched on the grid row
                    # (same ar values as the dynamic roll — see the
                    # ar_tab note above; bit-identical by construction)
                    for av in ar_groups:
                        sel = None
                        for ii in range(gh):
                            if ar_tab[ii] != av:
                                continue
                            e = i == ii
                            sel = e if sel is None else (sel | e)

                        @pl.when(sel)
                        def _(av=av):
                            bb = (
                                pltpu.roll(b, av, axis=0) if av else b
                            )
                            fbuf[:, 0:CL] = bb[0:SH, :].astype(
                                jnp.float32
                            )
                elif fullwidth:
                    b = pltpu.roll(b, ar, axis=0)
                    fbuf[:, 0:CL] = b[0:SH, :].astype(jnp.float32)
                else:
                    b = pltpu.roll(b, ar, axis=0)
                    b = pltpu.roll(b, ac, axis=1)
                    fbuf[:] = b[0:SH, 0:SW].astype(jnp.float32)
                fix_borders()
                f = fbuf[:]
            else:
                # Mosaic has no direct u8 <-> f32 cast; hop through int32
                f = ftile[slot].astype(jnp.int32).astype(jnp.float32)

            if blur_binom:
                # column pass on the MXU (one banded matmul, exact — see
                # the Wc note above), then the exact row box cascade:
                # r passes of y[i] += y[i-1] then r of y[i] += y[i+1]
                # keep the window centered; one power-of-two scale at
                # the end. Every partial sum is an exact integer in f32,
                # so the result is bit-identical to the jnp twin's
                # row-then-column double cascade (exact integer
                # convolutions commute).
                f = jnp.dot(
                    wc_ref[:], f.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                r = rb
                for d in range(r):
                    f = f + _roll2(f, 0, -1)
                for d in range(r):
                    f = f + _roll2(f, 0, 1)
                f = f * (2.0 ** (-2 * (blur_ksize - 1)))
                # cv2 u8 re-quantization: the cascade value is the exact
                # rational blur, so floor(f + 0.5) IS cv2's fixed-point
                # rounding (see ops.gaussian_blur_u8, the jnp twin)
                f = jnp.floor(f + 0.5)
            elif kblur:
                r = rb
                # row (W) pass first, then column (H) — cv2 sepFilter2D
                # order; symmetric-pair summation like the jnp op. Taps
                # are cv2's u8 fixed-point integers (sum 256): all
                # partial sums exact in f32, one exact power-of-two
                # scale + floor at the end == cv2's (acc + 2^15) >> 16
                acc = f * kblur[r]
                for d in range(1, r + 1):
                    acc = acc + kblur[r - d] * (
                        _roll2(f, 0, -d) + _roll2(f, 0, d)
                    )
                f = acc
                acc = f * kblur[r]
                for d in range(1, r + 1):
                    acc = acc + kblur[r - d] * (
                        _roll2(f, -d, 0) + _roll2(f, d, 0)
                    )
                f = jnp.floor(acc * (2.0**-16) + 0.5)

            if rm:
                # BORDER_REPLICATE: clamp each shifted read to the image
                # rectangle (horizontal clamp first, then vertical — the
                # composition reads f at the per-axis-clamped coordinate)
                def hshift(dx):
                    if dx == 0:
                        return f
                    ok = (gx + dx >= 0) & (gx + dx < W)
                    return jnp.where(ok, _roll2(f, 0, dx), f)

                win = []
                for dx in (-1, 0, 1):
                    hx = hshift(dx)
                    for dy in (-1, 0, 1):
                        if dy == 0:
                            win.append(hx)
                        else:
                            ok = (gy + dy >= 0) & (gy + dy < H)
                            win.append(
                                jnp.where(ok, _roll2(hx, dy, 0), hx)
                            )
                f = _median9(win)

            bg = (1.0 - a) * bgt[:] + a * f
            bgt[:] = bg
            if emit == "diff":
                d = jnp.abs(f - bg)
                @pl.when(t >= 2)
                def _():
                    mask_wr(slot, t - 2).wait()
                mbuf[slot] = jnp.where(
                    inown,
                    jnp.clip(
                        jnp.rint(d[P:P + TH, COFF:COFF + TW]), 0.0, 255.0
                    ).astype(jnp.int32),
                    0,
                ).astype(jnp.uint8)
                mask_wr(slot, t).start()
                return carry
            m = (jnp.abs(f - bg) > thr).astype(jnp.float32)
            # foreground-free tiles skip morphology: open/close of an
            # all-zero tile is zero under cv2 border semantics
            any_fg = jnp.max(m) > 0.0

            # double-buffered mask write-back: wait for the slot's
            # previous in-flight copy before overwriting the buffer
            @pl.when(t >= 2)
            def _():
                mask_wr(slot, t - 2).wait()

            @pl.when(any_fg)
            def _(m=m):
                if open_rows:
                    m = morph(m, open_rows, True, open_iters)
                    m = morph(m, open_rows, False, open_iters)
                if close_rows:
                    m = morph(m, close_rows, False, close_iters)
                    m = morph(m, close_rows, True, close_iters)
                mbuf[slot] = jnp.where(
                    inown,
                    (m[P:P + TH, COFF:COFF + TW] * 255.0).astype(jnp.int32),
                    0,
                ).astype(jnp.uint8)

            @pl.when(jnp.logical_not(any_fg))
            def _():
                mbuf[slot] = jnp.zeros((TH, TW), jnp.uint8)

            mask_wr(slot, t).start()
            if padded_occ:
                mz = (
                    mbuf[slot].astype(jnp.int32).astype(jnp.bfloat16)
                )
                s1 = jnp.dot(rp, mz, preferred_element_type=jnp.float32)
                s2 = jnp.dot(
                    s1.astype(jnp.bfloat16), cp,
                    preferred_element_type=jnp.float32,
                )
                occ_ref[t] = (
                    (s2 > 0.0).astype(jnp.int32).astype(jnp.uint8)
                )
            return carry

        lax.fori_loop(0, N, body, 0)
        # drain the last two in-flight mask copies (N is static)
        if N >= 2:
            mask_wr(N % 2, N - 2).wait()
        mask_wr((N - 1) % 2, N - 1).wait()
        bgout_ref[:, :] = bgt[P:P + TH, COFF:COFF + TW]

    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((N, Hp, Wp), jnp.uint8),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
    ]
    if padded_occ:
        out_specs.append(
            pl.BlockSpec(
                (N, TH // 2, 128),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((N, Hp // 2, 128 * gw), jnp.uint8)
        )
    outs = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + (
            # banded column-blur taps, VMEM-resident ((SH, SH) bf16)
            [pl.BlockSpec(memory_space=pltpu.VMEM)] if blur_binom else []
        ),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((2, RL, CL), jnp.uint8),
             pltpu.VMEM((SH, SW), jnp.float32)]
            if raw_window
            else [pltpu.VMEM((2, SH, SW), jnp.uint8)]
        ) + [
            pltpu.VMEM((SH, SW), jnp.float32),
            pltpu.VMEM((2, TH, TW), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(*((fp, bp, Wc) if blur_binom else (fp, bp)))
    if padded_occ:
        masks, bg_out, occ_pad = outs
        # drop the lane padding: keep the first TW//128 flags of each
        # tile-column's 128-lane block
        occ = occ_pad.reshape(N, Hp // 2, gw, 128)[..., : TW // 128]
        occ = occ.reshape(N, Hp // 2, Wp // 128)
        return masks, bg_out[:H, :W], occ
    masks, bg_out = outs
    return masks[:, :H, :W], bg_out[:H, :W]
