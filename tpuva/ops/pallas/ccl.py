"""Tiled-sequential connected-component label propagation in Pallas
(SURVEY.md §7.3 "hardest kernel", second generation).

The XLA sweep loop (tpuva.ops.label.label_components) re-reads the whole
frame ~50 times (4 directional prefix-doubling scans x log2(W) steps x
iterations). This kernel exploits the fact that a Pallas TPU grid executes
sequentially on the core: tiles are visited in raster order and each tile
reads a halo that includes the tiles already UPDATED this pass, so labels
propagate across the entire image in ONE forward + ONE backward pass —
total HBM traffic ~2 read/write of the label map instead of ~50.

Within a tile, propagation runs to (near) fixed point in VMEM via
neighbor-min + segmented prefix-doubling scans — pure VPU work, no HBM
traffic. A global XLA while_loop re-runs fwd+bwd until no pixel changes
(pathological multi-tile spirals need extra rounds; blobs converge in one).

Label convention inside the pass: int32 scan-key K for mask pixels,
SENT (> any K) for background — identical to tpuva.ops.label, so results
are bit-identical with label_components (golden-tested).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuva.ops.label import _scan_key


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift_fill(x, d: int, axis: int, fill):
    """out[i] = in[i+d] (d may be negative), `fill` outside — implemented
    as roll + iota edge mask (Mosaic-friendly; no pad/concat)."""
    if d == 0:
        return x
    size = x.shape[axis]
    y = pltpu.roll(x, (-d) % size, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if d > 0:
        bad = idx >= size - d
    else:
        bad = idx < -d
    return jnp.where(bad, fill, y)


def _seg_min_scan_tile(v, m32, axis: int, sent, reverse: bool,
                       max_run: int = 0):
    """Within-tile segmented running min via prefix doubling (cf.
    tpuva.ops.label._segmented_min_scan, but on VMEM values). m32 is the
    mask as int32 0/1 — Mosaic's dynamic_rotate only handles 32-bit
    lanes, so the connectivity flags stay int32 throughout.

    max_run > 0 truncates the doubling at that distance: labels still
    converge (the surrounding fixed-point loops run more iterations for
    runs longer than max_run) but typical blob-sized tiles sweep ~30%
    fewer steps."""
    size = v.shape[axis]
    if max_run:
        size = min(size, max_run)
    sgn = 1 if reverse else -1  # forward pulls from smaller index
    c = m32 & _shift_fill(m32, sgn, axis, 0)
    d = 1
    while d < size:
        v = jnp.where(
            c != 0, jnp.minimum(v, _shift_fill(v, sgn * d, axis, sent)), v
        )
        c = c & _shift_fill(c, sgn * d, axis, 0)
        d *= 2
    return v


def _tile_sweep(v, m32, sent, connectivity: int, max_run: int = 0):
    if connectivity == 8:
        # separable 3x3 min: colmin(rowmin(v)) — 4 shifts instead of ~12
        r = jnp.minimum(
            v,
            jnp.minimum(
                _shift_fill(v, -1, 1, sent), _shift_fill(v, 1, 1, sent)
            ),
        )
        nb = jnp.minimum(
            r,
            jnp.minimum(
                _shift_fill(r, -1, 0, sent), _shift_fill(r, 1, 0, sent)
            ),
        )
    else:
        nb = v
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            s = _shift_fill(v, dy, 0, sent) if dx == 0 else _shift_fill(v, dx, 1, sent)
            nb = jnp.minimum(nb, s)
    v = jnp.where(m32 != 0, jnp.minimum(v, nb), sent)
    v = _seg_min_scan_tile(v, m32, 1, sent, False, max_run)
    v = _seg_min_scan_tile(v, m32, 1, sent, True, max_run)
    v = _seg_min_scan_tile(v, m32, 0, sent, False, max_run)
    v = _seg_min_scan_tile(v, m32, 0, sent, True, max_run)
    return v


@functools.partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_rounds", "frames_per_step", "max_run"
    ),
)
def label_components_tiled(
    mask: jnp.ndarray,
    connectivity: int = 8,
    tile: tuple = (128, 256),
    max_rounds: int = 64,
    frames_per_step: int = 4,
    max_run: int = 128,
):
    """Drop-in replacement for tpuva.ops.label.label_components on TPU.

    mask: (N, H, W) (or (H, W)); returns int32 root-key labels (min scan
    key + 1 per component, 0 background) — bit-identical to
    label_components.
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    m = mask > 0
    N, H, W = m.shape
    kmap, _inv, sent_base = _scan_key(H, W, connectivity)
    SENT = sent_base + 1  # python int: becomes a kernel-embedded constant
    TH, TW = tile
    F = max(1, min(frames_per_step, N))
    Nf = -(-N // F)
    gh, gw = -(-H // TH), -(-W // TW)
    Hp, Wp = gh * TH, gw * TW
    # 8-row / 128-col aligned borders on every side (halo reads and owned
    # writes all stay (8,128)-aligned), plus cover padding to the tile grid
    PT, PL = 8, 128
    lab = jnp.where(m, jnp.asarray(kmap)[None], jnp.int32(SENT))
    lab = jnp.pad(
        lab,
        ((0, Nf * F - N), (PT, Hp - H + PT), (PL, Wp - W + PL)),
        constant_values=sent_base + 1,
    )
    SH, SW = TH + 2 * PT, TW + 2 * PL

    # per-(frame-group, tile) occupancy, computed once in XLA and
    # scalar-prefetched into the kernel: empty tiles skip their DMA and
    # sweep entirely (tiles with no mask pixels can never change)
    mp = jnp.pad(m, ((0, Nf * F - N), (0, Hp - H), (0, Wp - W)))
    # two small-window max-pools (a single (F, TH, TW) window blows the
    # VMEM stack)
    o1 = lax.reduce_window(
        mp.astype(jnp.int32), jnp.int32(0), lax.max,
        (1, 1, TW), (1, 1, TW), "VALID",
    )  # (Nf*F, Hp, gw)
    occ = lax.reduce_window(
        o1, jnp.int32(0), lax.max, (F, TH, 1), (F, TH, 1), "VALID"
    ).reshape(-1)  # (Nf * gh * gw,) in forward raster order

    def make_pass(forward: bool):
        def kernel(occ_ref, lab_in, lab_out, flag_ref, tilebuf, sem_r, sem_w):
            nf = pl.program_id(0)
            i = pl.program_id(1)
            j = pl.program_id(2)
            if not forward:
                i = pl.num_programs(1) - 1 - i
                j = pl.num_programs(2) - 1 - j
            y0 = i * TH
            x0 = j * TW
            # frames are independent: F of them share one halo'd tile DMA,
            # amortizing the per-step transfer latency
            rd = pltpu.make_async_copy(
                lab_out.at[
                    pl.ds(nf * F, F), pl.ds(y0, SH), pl.ds(x0, SW)
                ],
                tilebuf,
                sem_r,
            )
            flag_ref[0, 0, 0] = 0

            def per_frame():
              for f in range(F):
                v0 = tilebuf[f]
                has_mask = jnp.any(v0 <= jnp.int32(sent_base))

                @pl.when(has_mask)
                def _(f=f, v0=v0):
                    mm = (v0 <= jnp.int32(sent_base)).astype(jnp.int32)

                    # iterate to a true LOCAL fixed point (the global
                    # convergence argument requires it) — all VMEM VPU
                    # work; a converged tile pays exactly one sweep
                    def inner(s):
                        v, _ = s
                        nv = _tile_sweep(v, mm, SENT, connectivity, max_run)
                        return nv, jnp.any(nv != v)

                    v, _ = lax.while_loop(
                        lambda s: s[1], inner, (v0, jnp.bool_(True))
                    )
                    # change flag over the OWNED region only (halo changes
                    # are the neighbor tile's responsibility) — the
                    # aliased-buffer trick makes an XLA-level change
                    # comparison unsound, so the kernel reports it;
                    # unchanged tiles skip the write-back entirely
                    owned_changed = jnp.any(
                        v[PT : PT + TH, PL : PL + TW]
                        != v0[PT : PT + TH, PL : PL + TW]
                    )

                    @pl.when(owned_changed)
                    def _():
                        flag_ref[0, 0, 0] = 1
                        tilebuf[f] = v
                        wr = pltpu.make_async_copy(
                            tilebuf.at[f, pl.ds(PT, TH), pl.ds(PL, TW)],
                            lab_out.at[
                                nf * F + f,
                                pl.ds(y0 + PT, TH),
                                pl.ds(x0 + PL, TW),
                            ],
                            sem_w,
                        )
                        wr.start()
                        wr.wait()

            # occupancy early-out: empty tiles (precomputed in XLA, scalar
            # prefetched) skip the DMA and all sweeps — they can never
            # change
            occupied = occ_ref[(nf * gh + i) * gw + j] != 0

            @pl.when(occupied)
            def _():
                rd.start()
                rd.wait()
                per_frame()

        return kernel

    def run_pass(lab, forward: bool):
        def flag_index(n, i, j, occ_ref):
            # one scalar row per grid step ((1, 1) trailing dims satisfy
            # the Mosaic block-alignment rule); index maps receive the
            # scalar-prefetch ref as a trailing argument
            return ((n * gh + i) * gw + j, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Nf, gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, 1, 1), flag_index, memory_space=pltpu.SMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((F, SH, SW), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            make_pass(forward),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(lab.shape, jnp.int32),
                jax.ShapeDtypeStruct((Nf * gh * gw, 1, 1), jnp.int32),
            ],
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=_interpret(),
        )(occ, lab)

    def body(state):
        lab, _, rounds = state
        lab, _flags_f = run_pass(lab, True)
        lab, flags_b = run_pass(lab, False)
        # a change-free backward pass means every tile is locally converged
        # against its final halos — a global fixed point
        changed = jnp.max(flags_b) > 0
        return lab, changed, rounds + 1

    def cond(state):
        _, changed, rounds = state
        return changed & (rounds < max_rounds)

    lab, _, _ = lax.while_loop(cond, body, (lab, jnp.bool_(True), 0))
    out = lab[:N, PT : PT + H, PL : PL + W]
    out = jnp.where(m, out + 1, 0)
    return out[0] if squeeze else out
