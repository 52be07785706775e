"""Fused segmentation front-end as a Pallas TPU kernel (SURVEY.md §7.1
step 8: "fuse background-update + blur + threshold + morphology into one
VMEM-resident kernel per tile").

One kernel instance owns a spatial tile and loops over the N frames of the
batch, carrying the background-model tile in VMEM the whole time:

    HBM traffic per pixel per frame = 1 uint8 read (frame) + 1 uint8 write
    (mask) — the speed-of-light for this stage. The XLA path re-reads and
    re-writes float32 intermediates between every op (~20-40 bytes/px).

Correctness contract (same as the jnp ops, golden-tested):
- Gaussian blur: cv2 kernels (tpuva.ops.gaussian_kernel_1d), REFLECT_101
  borders — realized by pre-padding the batch once in XLA and computing on
  reflected halo pixels.
- background: B <- (1-alpha) B + alpha F, float32, sequential over frames.
- threshold: strict |F - B| > thr.
- morphology open/close: cv2 constant-border semantics (erode treats
  outside-image as foreground, dilate as background), enforced in-kernel
  with global-coordinate masks.

Halo math: a tile is computed with P = blur_radius + morph_reach extra
pixels on every side; per-frame circular rolls contaminate at most
blur_radius edge pixels, and each morphology step consumes one more halo
ring, so the owned region is exact (see `_halo`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuva.ops.filters import gaussian_kernel_1d, structuring_element


def _se_offsets(shape: str, ksize: int):
    se = structuring_element(shape, ksize)
    r = ksize // 2
    return tuple(
        (dy - r, dx - r)
        for dy in range(ksize)
        for dx in range(ksize)
        if se[dy, dx]
    )


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


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha", "threshold", "blur_ksize", "blur_sigma",
        "open_shape", "open_ksize", "open_iters",
        "close_shape", "close_ksize", "close_iters", "tile",
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
    open_shape: str = "rect",
    open_ksize: int = 0,  # 0 = no open
    open_iters: int = 1,
    close_shape: str = "rect",
    close_ksize: int = 0,
    close_iters: int = 1,
    tile: tuple | None = None,
):
    """Returns (masks (N, H, W) uint8 0/255, bg_out (H, W) float32)."""
    N, H, W = frames.shape
    rb = blur_ksize // 2
    open_offs = _se_offsets(open_shape, open_ksize) if open_ksize else ()
    close_offs = _se_offsets(close_shape, close_ksize) if close_ksize else ()
    reach_open = (open_ksize // 2) * open_iters * 2 if open_ksize else 0
    reach_close = (close_ksize // 2) * close_iters * 2 if close_ksize else 0
    P = rb + reach_open + reach_close
    if tile is None:
        # owned-block dims must be 8/128-aligned for the Mosaic lowering;
        # the haloed scratch tile (TH+2P, TW+2P) has no such constraint
        TH = 120 if H > 128 else _ceil_to(H, 8)
        TW = 512 if W > 512 else _ceil_to(W, 128)
        # the (N, TH, TW) uint8 mask block lives in VMEM: shrink TH for
        # large batches so block + scratch stay under the ~16MB VMEM budget
        while N * TH * TW > 4 * 1024 * 1024 and TH > 16:
            TH = _ceil_to(TH // 2, 8)
    else:
        TH, TW = tile
    gh, gw = -(-H // TH), -(-W // TW)
    Hp, Wp = gh * TH, gw * TW
    # DMA slice shapes must be (8, 128)-aligned: keep the logical halo P on
    # the top/left and absorb the alignment slack on the bottom/right
    SH = _ceil_to(TH + 2 * P, 8)
    SW = _ceil_to(TW + 2 * P, 128)
    PRh = SH - TH - P  # bottom slack (>= P)
    PRw = SW - TW - P

    # one-time XLA pre-pad: REFLECT_101 halo P, then edge-pad to the tile
    # grid cover + slack (the cover/slack region is never emitted)
    if P:
        fp = jnp.pad(frames, ((0, 0), (P, P), (P, P)), mode="reflect")
        bp = jnp.pad(bg0, P, mode="reflect")
    else:
        fp, bp = frames, bg0
    fp = jnp.pad(
        fp,
        ((0, 0), (0, Hp + PRh - H - P), (0, Wp + PRw - W - P)),
        mode="edge",
    )
    bp = jnp.pad(
        bp, ((0, Hp + PRh - H - P), (0, Wp + PRw - W - P)), mode="edge"
    )

    kblur = (
        tuple(float(v) for v in gaussian_kernel_1d(blur_ksize, blur_sigma))
        if blur_ksize
        else ()
    )
    a = float(alpha)
    thr = float(threshold)

    def kernel(fp_ref, bp_ref, mask_ref, bgout_ref, ftile, bgt, sem, bsem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = i * TH
        x0 = j * TW

        # global image coordinates of every tile pixel (offset by -P)
        gy = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 0) + y0 - P
        gx = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 1) + x0 - P
        in_img = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)

        # load the background tile (with halo) once
        bdma = pltpu.make_async_copy(
            bp_ref.at[pl.ds(y0, SH), pl.ds(x0, SW)], bgt, bsem
        )
        bdma.start()
        bdma.wait()

        def frame_dma(slot, t):
            return pltpu.make_async_copy(
                fp_ref.at[t, pl.ds(y0, SH), pl.ds(x0, SW)],
                ftile.at[slot],
                sem.at[slot],
            )

        frame_dma(0, 0).start()

        def body(t, carry):
            slot = t % 2
            nxt = (t + 1) % 2

            @pl.when(t + 1 < N)
            def _():
                frame_dma(nxt, t + 1).start()

            frame_dma(slot, t).wait()
            # Mosaic has no direct u8 <-> f32 cast; hop through int32
            f = ftile[slot].astype(jnp.int32).astype(jnp.float32)

            if kblur:
                r = rb
                # row (W) pass first, then column (H) — cv2 sepFilter2D
                # order; symmetric-pair summation like the jnp op
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
                f = acc

            bg = (1.0 - a) * bgt[:] + a * f
            bgt[:] = bg
            m = (jnp.abs(f - bg) > thr).astype(jnp.float32)

            def erode(mm, offs):
                mm = jnp.where(in_img, mm, 1.0)
                out = None
                for dy, dx in offs:
                    v = _roll2(mm, dy, dx)
                    out = v if out is None else jnp.minimum(out, v)
                return out

            def dilate(mm, offs):
                mm = jnp.where(in_img, mm, 0.0)
                out = None
                for dy, dx in offs:
                    # cv2 dilate reflects the SE; ours are symmetric
                    v = _roll2(mm, dy, dx)
                    out = v if out is None else jnp.maximum(out, v)
                return out

            if open_offs:
                for _ in range(open_iters):
                    m = erode(m, open_offs)
                for _ in range(open_iters):
                    m = dilate(m, open_offs)
            if close_offs:
                for _ in range(close_iters):
                    m = dilate(m, close_offs)
                for _ in range(close_iters):
                    m = erode(m, close_offs)

            mask_ref[t] = (
                (m[P : P + TH, P : P + TW] * 255.0)
                .astype(jnp.int32)
                .astype(jnp.uint8)
            )
            return carry

        lax.fori_loop(0, N, body, 0)
        bgout_ref[:, :] = bgt[P : P + TH, P : P + TW]

    masks, bg_out = pl.pallas_call(
        kernel,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (N, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, Hp, Wp), jnp.uint8),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SH, SW), jnp.uint8),
            pltpu.VMEM((SH, SW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=_interpret(),
    )(fp, bp)
    return masks[:, :H, :W], bg_out[:H, :W]
