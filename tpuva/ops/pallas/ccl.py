"""Tiled-sequential connected-component label propagation in Pallas
(SURVEY.md §7.3 "hardest kernel", third generation).

The XLA sweep loop (tpuva.ops.label.label_components) re-reads the whole
frame ~50 times (4 directional prefix-doubling scans x log2(W) steps x
iterations). This kernel exploits the fact that a Pallas TPU grid executes
sequentially on the core: tiles are visited in raster order and each tile
reads a halo that includes the tiles already UPDATED this pass, so labels
propagate across the entire image in ONE forward + ONE backward pass —
total HBM traffic ~2 read/write of the label map instead of ~50.

Third-generation changes (round 2):
- The first forward pass reads the raw uint8 MASK tile and initializes
  labels (scan keys from in-kernel iota) directly in VMEM — the XLA
  where/pad prologue that materialized the padded int32 label map twice
  (~2 extra full-image passes, the single biggest cost of gen 2) is gone;
  the label buffer starts as a constant SENT fill.
- Tile occupancy is computed on uint8 (no int32 mask materialization).
- Sweeps consume only a 1-pixel halo (deeper halo pixels are treated as
  background). Sound: labels only decrease monotonically toward the
  component min and propagation respects mask runs, so a stale or absent
  halo can never produce a wrong label — only a slower one; 1 px is the
  full adjacency requirement.
- A tile's change flag is raised only when its 1-pixel border RING
  changed — interior-only changes cannot affect any neighbor. Later
  passes process only the FRONTIER: occupied tiles with a ring-changed
  8-neighbor. For the common scene (blobs interior to tiles) the frontier
  after pass 1 is empty and labeling costs exactly ONE pass.
- The loop exposes a convergence flag (`return_converged`) so callers can
  surface pathological non-convergence instead of silently truncating.

Sixth-generation change (round 3, both kernels): ring flags are EXACT
improvability tests instead of conservative change detectors.
- Pass 1 (gen 6): visits every occupied tile in raster order, so
  later-visited neighbors always consume this tile's final ring within
  the same pass; only already-visited neighbors (top halo row incl.
  diagonals, left halo column) can need re-scheduling, and whether this
  tile's final owned labels can lower any of their adjacent pixels is
  computable exactly against the halo snapshot. Blobs that merely TOUCH
  a tile edge no longer schedule a pass-2 neighborhood.
- Later passes (gen 6b): flag iff the final owned labels can lower some
  mask pixel anywhere in the 1-px halo. Monotonicity makes the snapshot
  test sound for any visit order (a later-visited neighbor's labels only
  decrease, so non-improvability is stable), and improvability from a
  tile can only arise when that tile's own labels decrease — which
  re-runs the test. The pass that fixes the last stale tile therefore
  raises no flag, and the do-nothing confirm pass disappears.
Convergence: an empty frontier now means NO tile can lower any neighbor
pixel; every tile is at a local fixed point and cross-tile edges admit
no decrease — a global fixed point. Measured by bench/ccl_pass_probe.py;
see the in-kernel soundness comments in per_frame_first/per_frame_later.

Seventh-generation change (round 4, raw kernel): pass-1 halo reads never
touch HBM. The raster visit order means the left neighbor's final labels
are still in VMEM from the immediately-preceding visit and the row
above's bottom rows can ride a buffer-width VMEM carry from the previous
grid step — so pass 1's only HBM traffic is the mask read and the owned/
compact write-back (the halo-read strips were 393 KB per group-visit).
Every staleness case is already covered by the per-frame occupancy
masking: occupied-in-frame implies visited-and-captured-this-pass.

Within a tile, propagation runs to a true local fixed point in VMEM via
neighbor-min + segmented prefix-doubling scans — pure VPU work, no HBM
traffic. Passes alternate forward/backward until the frontier empties;
an empty frontier means no tile can lower any neighbor pixel (gen-6b
exact flags), hence every tile is locally converged and cross-tile edges
admit no decrease — a global fixed point.

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


def _nb_min(v, m32, sent, connectivity: int):
    """One restricted neighbor-min step: mask pixels take the min over
    their (self + connectivity) neighborhood; background holds sent."""
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
    return jnp.where(m32 != 0, jnp.minimum(v, nb), sent)


def _tile_sweep(v, m32, sent, connectivity: int, max_run: int = 0):
    v = _nb_min(v, m32, sent, connectivity)
    v = _seg_min_scan_tile(v, m32, 1, sent, False, max_run)
    v = _seg_min_scan_tile(v, m32, 1, sent, True, max_run)
    v = _seg_min_scan_tile(v, m32, 0, sent, False, max_run)
    v = _seg_min_scan_tile(v, m32, 0, sent, True, max_run)
    return v


def _frontier(flags, occ3):
    """Tiles to process next pass: occupied tiles with a ring-changed
    8-neighbor. The changed tile itself is locally converged (its sweep
    ran to a fixed point) so the CENTER is excluded; frames don't
    interact. Shared by the dense (gen-3) kernel; the raw kernel uses the
    row-granular variant below — the ring-flag/frontier logic is
    soundness-critical (see make_flag_index) and any further variant
    must re-prove the superset argument. flags: flat (Nf*gh*gw);
    occ3: (Nf, gh, gw)."""
    Nf, gh, gw = occ3.shape
    f3 = flags.reshape(Nf, gh, gw)
    fp = jnp.pad(f3, ((0, 0), (1, 1), (1, 1)))
    nb = jnp.zeros_like(f3)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = jnp.maximum(
                nb, fp[:, 1 + dy:1 + dy + gh, 1 + dx:1 + dx + gw]
            )
    return (jnp.minimum(nb, 1) * occ3).reshape(-1)


def _frontier_rows(row_flags, occ3):
    """Row-granular frontier for the raw kernel (gen 5): the kernel emits
    ONE ring-change flag per (frame-group, tile-row) — 1 SMEM store per
    grid step instead of gw (the gw scalar stores were ~2/3 of the
    empty-scene pass cost). Soundness: the tile-granular frontier is
    {occupied tiles 8-adjacent to a ring-changed tile}; every such tile
    lies in the changed tile's row or the rows directly above/below, so
    {occupied tiles in rows within +-1 of a changed row} is a SUPERSET —
    extra visits only re-run already-converged sweeps (cheap precheck),
    never skip a tile that needs propagation. Convergence detection is
    unchanged: no row flagged <=> no tile changed.

    row_flags: flat (Nf*gh,); occ3: (Nf, gh, gw); returns per-tile
    frontier, flat (Nf*gh*gw)."""
    Nf, gh, gw = occ3.shape
    f2 = row_flags.reshape(Nf, gh)
    fp = jnp.pad(f2, ((0, 0), (1, 1)))
    nb = jnp.maximum(
        fp[:, :gh], jnp.maximum(fp[:, 1:gh + 1], fp[:, 2:gh + 2])
    )
    return (jnp.minimum(nb, 1)[:, :, None] * occ3).reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "connectivity", "tile", "max_rounds", "frames_per_step", "max_run",
        "return_converged",
    ),
)
def label_components_tiled(
    mask: jnp.ndarray,
    connectivity: int = 8,
    tile: tuple = (64, 256),
    max_rounds: int = 64,
    frames_per_step: int = 4,
    max_run: int = 128,
    return_converged: bool = False,
):
    """Drop-in replacement for tpuva.ops.label.label_components on TPU.

    mask: (N, H, W) (or (H, W)) uint8/bool; returns int32 root-key labels
    (min scan key + 1 per component, 0 background) — bit-identical to
    label_components. With return_converged=True returns (labels,
    converged ()-bool); converged=False means max_rounds was exhausted
    with changes still flowing (pathological multi-tile spirals) and
    labels may be split.
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    mu8 = mask if mask.dtype == jnp.uint8 else (mask != 0).astype(jnp.uint8)
    N, H, W = mu8.shape
    _kmap, _inv, sent_base = _scan_key(H, W, connectivity)
    SENT = sent_base + 1  # python int: becomes a kernel-embedded constant
    Wb = (W + 1) // 2  # block columns of the 8-conn scan-key bijection
    TH, TW = tile
    F = max(1, min(frames_per_step, N))
    Nf = -(-N // F)
    gh, gw = -(-H // TH), -(-W // TW)
    Hp, Wp = gh * TH, gw * TW
    # 8-row / 128-col aligned borders on every side (halo reads and owned
    # writes all stay (8,128)-aligned), plus cover padding to the tile grid
    PT, PL = 8, 128
    SH, SW = TH + 2 * PT, TW + 2 * PL

    mp = jnp.pad(mu8, ((0, Nf * F - N), (0, Hp - H), (0, Wp - W)))

    # per-(frame-group, tile) occupancy, computed once in XLA on uint8 and
    # scalar-prefetched into the kernel: empty tiles skip their DMA and
    # sweep entirely (tiles with no mask pixels can never change). Two
    # small-window max-pools (a single (F, TH, TW) window blows the VMEM
    # stack).
    o1 = lax.reduce_window(
        mp, jnp.uint8(0), lax.max, (1, 1, TW), (1, 1, TW), "VALID"
    )  # (Nf*F, Hp, gw)
    occ = lax.reduce_window(
        o1, jnp.uint8(0), lax.max, (F, TH, 1), (F, TH, 1), "VALID"
    ).reshape(-1).astype(jnp.int32)  # (Nf * gh * gw,) forward raster order

    # label buffer starts as a pure SENT fill; the first pass writes real
    # labels into occupied tiles (mask-init in VMEM), empty tiles stay SENT
    lab0 = jnp.full(
        (Nf * F, Hp + 2 * PT, Wp + 2 * PL), jnp.int32(SENT), jnp.int32
    )

    def make_pass(forward: bool, first: bool):
        def kernel(occ_ref, *refs):
            if first:
                (msk_in, lab_in, lab_out, flag_ref,
                 tilebuf, mskbuf, sem_r, sem_m, sem_w) = refs
            else:
                lab_in, lab_out, flag_ref, tilebuf, sem_r, sem_w = refs
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

            # sweep window: owned region + 1-pixel halo (DMA alignment
            # forces the (PT, PL) margins, but only 1 px of them is USED —
            # this is what makes the 1-px ring flag sufficient)
            hy = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 0)
            hx = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 1)
            valid = (
                (hy >= PT - 1) & (hy < PT + TH + 1)
                & (hx >= PL - 1) & (hx < PL + TW + 1)
            )
            # 1-px border ring of the owned region (halo-visible pixels)
            on_ring = (
                (hy == PT) | (hy == PT + TH - 1)
                | (hx == PL) | (hx == PL + TW - 1)
            ) & (
                (hy >= PT) & (hy < PT + TH) & (hx >= PL) & (hx < PL + TW)
            )

            def sweep_to_fixed_point(v0, mm, precheck: bool):
                # iterate to a true LOCAL fixed point (the global
                # convergence argument requires it) — all VMEM VPU work.
                # Fixed-point test: v is final iff the restricted
                # neighbor-min changes nothing (then v is constant on each
                # connected region, so the run scans can't lower it either)
                # — ~8 ops instead of a full ~100-op confirm sweep, and
                # with precheck an already-converged tile pays only that.
                def check(v):
                    return jnp.any(_nb_min(v, mm, SENT, connectivity) != v)

                def inner(s):
                    v, _ = s
                    nv = _tile_sweep(v, mm, SENT, connectivity, max_run)
                    return nv, check(nv)

                ch0 = check(v0) if precheck else jnp.bool_(True)
                v, _ = lax.while_loop(lambda s: s[1], inner, (v0, ch0))
                return v

            def write_owned(f):
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

            def per_frame_first():
                for f in range(F):
                    # int32 reduction: Mosaic can't relayout a reduced
                    # (TH, TW) i1 vector
                    mi = mskbuf[f].astype(jnp.int32)
                    has_mask = jnp.max(mi) > 0

                    @pl.when(has_mask)
                    def _(f=f, mi=mi):
                        # scan-key init from in-kernel iota (image coords)
                        rr = jax.lax.broadcasted_iota(
                            jnp.int32, (TH, TW), 0
                        ) + y0
                        cc = jax.lax.broadcasted_iota(
                            jnp.int32, (TH, TW), 1
                        ) + x0
                        if connectivity == 8:
                            key = (
                                ((rr >> 1) * Wb + (cc >> 1)) * 4
                                + (rr & 1) * 2 + (cc & 1)
                            )
                        else:
                            key = rr * W + cc
                        tilebuf[f, PT:PT + TH, PL:PL + TW] = jnp.where(
                            mi != 0, key, jnp.int32(SENT)
                        )
                        v0 = jnp.where(valid, tilebuf[f], jnp.int32(SENT))
                        mm = (v0 <= jnp.int32(sent_base)).astype(jnp.int32)
                        v = sweep_to_fixed_point(v0, mm, precheck=False)
                        # EXACT pass-1 flag (gen 6, same argument as the
                        # raw kernel): later-visited neighbors consume
                        # this tile's final ring within this very pass
                        # (pass 1 visits every occupied tile in raster
                        # order; in pass 1 their halo pixels are still
                        # the SENT fill => never improvable), so flag
                        # iff the final owned labels can LOWER an
                        # already-visited neighbor's pixel in the 1-px
                        # early halo (top row incl. diagonal corners,
                        # left column). Exact for 8-conn; for 4-conn the
                        # 3x3 neighbor-min is a superset (diagonal-only
                        # adjacency may over-flag — extra pass, never a
                        # wrong label).
                        owned_reg = (
                            (hy >= PT) & (hy < PT + TH)
                            & (hx >= PL) & (hx < PL + TW)
                        )
                        src = jnp.where(owned_reg, v, jnp.int32(SENT))
                        r1 = jnp.minimum(
                            src,
                            jnp.minimum(
                                _shift_fill(src, -1, 1, SENT),
                                _shift_fill(src, 1, 1, SENT),
                            ),
                        )
                        nbo = jnp.minimum(
                            r1,
                            jnp.minimum(
                                _shift_fill(r1, -1, 0, SENT),
                                _shift_fill(r1, 1, 0, SENT),
                            ),
                        )
                        early = (
                            (hy == PT - 1)
                            & (hx >= PL - 1) & (hx <= PL + TW)
                        ) | (
                            (hx == PL - 1)
                            & (hy >= PT) & (hy < PT + TH)
                        )
                        improvable = (
                            early
                            & (v0 <= jnp.int32(sent_base))
                            & (nbo < v0)
                        )

                        @pl.when(jnp.any(improvable))
                        def _():
                            flag_ref[0, 0, 0] = 1
                        tilebuf[f] = v
                        write_owned(f)

            def per_frame_later():
                for f in range(F):
                    raw = tilebuf[f]
                    v0 = jnp.where(valid, raw, jnp.int32(SENT))
                    has_mask = jnp.any(v0 <= jnp.int32(sent_base))

                    @pl.when(has_mask)
                    def _(f=f, raw=raw, v0=v0):
                        mm = (v0 <= jnp.int32(sent_base)).astype(jnp.int32)
                        v = sweep_to_fixed_point(v0, mm, precheck=True)
                        # the aliased-buffer trick makes an XLA-level change
                        # comparison unsound, so the kernel reports changes;
                        # unchanged tiles skip the write-back entirely, and
                        # the FLAG uses the exact gen-6b improvability test
                        # (see the raw kernel's per_frame_later): flag iff
                        # the final owned labels can LOWER some mask pixel
                        # in the full 1-px halo — a do-nothing confirm
                        # pass is no longer scheduled.
                        diff = (v != v0) & valid
                        owned_changed = jnp.any(
                            diff[PT:PT + TH, PL:PL + TW]
                        )
                        owned_reg = (
                            (hy >= PT) & (hy < PT + TH)
                            & (hx >= PL) & (hx < PL + TW)
                        )
                        src = jnp.where(owned_reg, v, jnp.int32(SENT))
                        r1 = jnp.minimum(
                            src,
                            jnp.minimum(
                                _shift_fill(src, -1, 1, SENT),
                                _shift_fill(src, 1, 1, SENT),
                            ),
                        )
                        nbo = jnp.minimum(
                            r1,
                            jnp.minimum(
                                _shift_fill(r1, -1, 0, SENT),
                                _shift_fill(r1, 1, 0, SENT),
                            ),
                        )
                        halo1 = (
                            ((hy == PT - 1) | (hy == PT + TH))
                            & (hx >= PL - 1) & (hx <= PL + TW)
                        ) | (
                            ((hx == PL - 1) | (hx == PL + TW))
                            & (hy >= PT) & (hy < PT + TH)
                        )
                        improvable = (
                            halo1
                            & (v0 <= jnp.int32(sent_base))
                            & (nbo < v0)
                        )

                        @pl.when(owned_changed)
                        def _():
                            @pl.when(jnp.any(improvable))
                            def _():
                                flag_ref[0, 0, 0] = 1
                            # halo cols of `v` hold masked-out SENT; write
                            # back the owned region only (write_owned reads
                            # tilebuf interior, which `v` fully covers)
                            tilebuf[f] = v
                            write_owned(f)

            # occupancy/frontier early-out (precomputed in XLA, scalar
            # prefetched): skipped tiles pay no DMA and no sweep
            occupied = occ_ref[(nf * gh + i) * gw + j] != 0

            @pl.when(occupied)
            def _():
                rd.start()
                if first:
                    md = pltpu.make_async_copy(
                        msk_in.at[
                            pl.ds(nf * F, F), pl.ds(y0, TH), pl.ds(x0, TW)
                        ],
                        mskbuf,
                        sem_m,
                    )
                    md.start()
                    rd.wait()
                    md.wait()
                    per_frame_first()
                else:
                    rd.wait()
                    per_frame_later()

        return kernel

    def make_flag_index(forward: bool):
        # one scalar row per grid step ((1, 1) trailing dims satisfy the
        # Mosaic block-alignment rule); index maps receive the
        # scalar-prefetch ref as a trailing argument. Backward passes
        # reflect (i, j) INSIDE the kernel, so the flag must be mapped to
        # the reflected tile too — the tile actually processed — or the
        # frontier computes neighbors of the wrong tiles and the loop can
        # exit "converged" with stale labels.
        def flag_index(n, i, j, occ_ref):
            if not forward:
                i = gh - 1 - i
                j = gw - 1 - j
            return ((n * gh + i) * gw + j, 0, 0)

        return flag_index

    def run_pass(lab, forward: bool, first: bool, occ_eff):
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        inputs = [occ_eff]
        if first:
            in_specs = [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            inputs = [occ_eff, mp]
        scratch = [pltpu.VMEM((F, SH, SW), jnp.int32)]
        if first:
            scratch.append(pltpu.VMEM((F, TH, TW), jnp.uint8))
            scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Nf, gh, gw),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (1, 1, 1), make_flag_index(forward),
                    memory_space=pltpu.SMEM,
                ),
            ],
            scratch_shapes=scratch,
        )
        alias_from = 2 if first else 1  # args shift by the prefetch operand
        return pl.pallas_call(
            make_pass(forward, first),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(lab.shape, jnp.int32),
                jax.ShapeDtypeStruct((Nf * gh * gw, 1, 1), jnp.int32),
            ],
            input_output_aliases={alias_from: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=_interpret(),
        )(*inputs, lab)

    occ3 = occ.reshape(Nf, gh, gw)

    def frontier(flags):
        return _frontier(flags, occ3)

    # pass 1: forward, labels initialized from the mask in VMEM
    lab, flags = run_pass(lab0, True, True, occ)
    fr = frontier(flags.reshape(-1))

    def cond(state):
        _lab, fr, _fwd, passes = state
        return (jnp.max(fr) > 0) & (passes < 2 * max_rounds)

    def body(state):
        lab, fr, fwd, passes = state
        lab, flags = lax.cond(
            fwd,
            lambda l, f: run_pass(l, True, False, f),
            lambda l, f: run_pass(l, False, False, f),
            lab, fr,
        )
        return lab, frontier(flags.reshape(-1)), ~fwd, passes + 1

    lab, fr, _, _ = lax.while_loop(
        cond, body, (lab, fr, jnp.bool_(False), jnp.int32(1))
    )
    converged = jnp.max(fr) == 0

    m = mu8 != 0
    out = lab[:N, PT:PT + H, PL:PL + W]
    out = jnp.where(m, out + 1, 0)
    out = out[0] if squeeze else out
    if return_converged:
        return out, converged
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "H", "W", "tile", "max_rounds", "frames_per_step", "max_run",
        "compact_slots", "compact_rows", "debug_poison", "single_pass",
    ),
)
def label_components_tiled_raw(
    mask_padded: jnp.ndarray,
    strip_occ: jnp.ndarray,
    H: int,
    W: int,
    tile: tuple = (64, 256),
    max_rounds: int = 64,
    frames_per_step: int = 8,
    max_run: int = 32,
    compact_slots: int = 0,
    compact_rows: int = 16,
    debug_poison: bool = False,
    single_pass: bool = False,
):
    """Fourth-generation tail: CCL without ANY full-image HBM pass.

    Grid layout (gen 5): (Nf, gh) with the tile-column axis as an
    in-kernel fori_loop plus a per-row visit-skip prefetch — see the
    grid-collapse and row-skip comments in make_pass. Visit order (and
    therefore every halo-read/write ordering argument below) is
    byte-identical to the dense (Nf, gh, gw) raster grid.

    Same propagation algorithm as label_components_tiled, but the label
    buffer is never initialized and never post-processed:

    - No SENT fill: pass 1 allocates the int32 buffer uninitialized and
      writes only occupied tiles. Halo reads are masked in-kernel by the
      PER-FRAME occupancy of the owning neighbor tile (scalar-prefetched):
      an unoccupied neighbor's halo is replaced by SENT — exactly the
      value the old full-buffer fill would have provided — so the monotone
      min-propagation semantics are bit-identical while the ~1.3 GB/batch
      fill disappears. In pass 1 (forward raster) halos from tiles not yet
      visited this pass are additionally masked to SENT (again identical
      to reading the old fill).
    - No epilogue: the return value is the RAW padded key buffer
      (scan key K for mask pixels, SENT for background, UNDEFINED outside
      written tiles) for _stats_from_raw (tpuva.ops.label) to consume via
      strip gathers that only ever touch occupied (written) strips.

    8-connectivity only (the pipeline contract, tpuva/graph/config.py).

    max_run=32 (vs the dense kernel's 128): truncating the prefix-doubling
    scans cut the measured batch cost ~5% at 64 px (round 3) and a
    further ~6-7% at 32 px (round 4; bench 21.3 -> 19.8, interior/corner
    -5/-6%, a 300-px-diameter blob within noise at 10.7 vs 10.5, while
    16 px regressed it to 13.5) with zero effect on results — the
    within-tile while_loop still runs to a true local fixed point
    (truncation only adds iterations for fragments whose runs exceed
    max_run, which then converge in 2+ sweeps instead of 1).

    Args:
      mask_padded: (N, Hp, Wp) uint8, zero outside the true (H, W) image;
        Hp % tile[0] == 0, Wp % tile[1] == 0.
      strip_occ: (N, Hp//2, Wp//256) uint8/int32/bool — any-mask flag per
        (2-row x 256-col) block (= one scan-key strip).
      H, W: true image size (static; defines the scan-key bijection).

    compact_slots = T > 0 additionally emits a COMPACT copy of the
    occupied (compact_rows x TW) sub-blocks of every occupied tile: a
    (Nf*F, T, compact_rows, TW) int32 buffer where frame t's k-th
    occupied sub-block (raster order over (row-band, tile-col), k < T)
    holds that band's labels at slot [t, k]. The converged tile is
    already in VMEM when its final sweep ends, so this costs one extra
    (compact_rows x TW) DMA per occupied sub-block of each changed tile
    — and stats assembly can then read label data from contiguous
    compact memory with ZERO gathers (row-gathering strips out of the
    sparse raw buffer was the dominant stats cost at 1080p). The slot
    height trades capacity robustness against stats-contraction cost:
    16 rows (default) gives the same strip count per slot budget as the
    gen-4 sparse-strip capacity while tolerating foreground scattered
    across 4x more distinct regions than whole-tile slots. Slots beyond
    the frame's occupied-sub-block count (and blocks ranked >= T) are
    UNINITIALIZED — consumers must mask by the strip_occ-derived rank,
    exactly as they must for the raw buffer itself.

    Returns (labraw, converged) — or (labraw, compact, converged) when
    compact_slots > 0:
      labraw: (Nf*F, Hp + 16, Wp + 512) int32 — image pixel (y, x) lives
        at buffer (y + 8, x + 256). Strips of 256 columns are aligned to
        the buffer minor axis, so (..., 256)-reshapes need no copy.
      converged: ()-bool, False if the round cap was hit.

    single_pass=True (gen 8, round 4) runs pass 1 ONLY and skips the
    exact-improvability flag computation entirely: the result is NOT a
    converged label field — each tile is at a LOCAL fixed point given
    the halos of already-visited (forward-raster) neighbors, so every
    in-tile fragment is uniformly labeled with its fragment-min key,
    but a component straddling tiles may keep several distinct fragment
    keys when its global min failed to back-propagate. The compact
    buffer then feeds _stats_from_compact(reconcile=True), which
    restores CONVERGED-equivalent stats exactly by unioning fragment
    roots at the record level (tile-boundary rows of the compact buffer
    carry exact root-key pairs — see _reconcile soundness notes in
    tpuva.ops.label). labraw is NOT valid for labels_from_raw in this
    mode; callers needing dense labels must use single_pass=False.
    Motivation (bench/ccl_pass_probe.py): passes 2+ cost ~7.7 ms on the
    1080p bench scene and ~28 ms on the corner-straddle scene purely to
    fix a handful of records; record-level reconciliation makes the
    kernel cost scene-shape-independent (one pass, always).

    debug_poison=True donates 0x5A5A5A5A-filled buffers into pass 1's
    label (and compact) outputs, so UNWRITTEN regions hold a hostile
    sentinel instead of whatever the allocator left there (zeros in
    interpret mode — benign!). CI uses this to prove the occupancy
    masking: any read of a never-written region leaks the poison into
    stats and fails the bit-equality tests. Never set in production (it
    pays the full-buffer fill the raw path exists to avoid).
    """
    TH, TW = tile
    assert TW % 256 == 0, "raw CCL tile width must cover whole 256-px strips"
    N, Hp, Wp = mask_padded.shape
    assert Hp % TH == 0 and Wp % TW == 0
    _kmap, _inv, sent_base = _scan_key(H, W, 8)
    SENT = sent_base + 1
    Wb = (W + 1) // 2
    F = max(1, min(frames_per_step, N))
    Nf = -(-N // F)
    Nfp = Nf * F
    gh, gw = Hp // TH, Wp // TW
    # buffer margins: 8 rows / 256 cols on every side (256 keeps strips
    # chunk-aligned in the buffer reshape); the DMA window stays the same
    # (TH+16, TW+256) as the dense kernel, offset 128 cols into the margin
    PT, PLW = 8, 128  # in-WINDOW halo origin (same geometry as gen 3)
    MR, MC = 8, 256  # buffer margins
    SH, SW = TH + 2 * PT, TW + 2 * PLW
    Hbuf, Wbuf = Hp + 2 * MR, Wp + 2 * MC

    if Nfp != N:
        mask_padded = jnp.pad(mask_padded, ((0, Nfp - N), (0, 0), (0, 0)))
        strip_occ = jnp.pad(strip_occ, ((0, Nfp - N), (0, 0), (0, 0)))

    # per-(frame, tile) occupancy from the strip flags (tiny reduction)
    occf3 = lax.reduce_window(
        strip_occ.astype(jnp.int32),
        jnp.int32(0), lax.max,
        (1, TH // 2, TW // 256), (1, TH // 2, TW // 256), "VALID",
    )  # (Nfp, gh, gw)
    occf = occf3.reshape(-1)  # [(t * gh + i) * gw + j]
    occ3 = occf3.reshape(Nf, F, gh, gw).max(axis=1)  # per GROUP tile
    occ_g = occ3.reshape(-1)

    use_compact = compact_slots > 0
    T = compact_slots
    CR = compact_rows
    if use_compact:
        assert TW == 256, "compact slots assume one 256-col chunk per tile"
        assert CR % 8 == 0 and TH % CR == 0
        QT = TH // CR  # sub-blocks per tile
        Hq = gh * QT  # sub-block rows in the grid
        # ONE scalar-prefetch array: each sub-block's compact slot (its
        # exclusive raster rank among the frame's occupied blocks), with
        # unoccupied (or beyond-capacity) blocks clamped to T so the
        # kernel's single `slot < T` test covers both occupancy and
        # capacity. SMEM budget is ~1 MB per core — a separate occupancy
        # array at this granularity would not fit at batch 256.
        occq3 = lax.reduce_window(
            strip_occ.astype(jnp.int32), jnp.int32(0), lax.max,
            (1, CR // 2, 1), (1, CR // 2, 1), "VALID",
        )  # (Nfp, Hq, gw)
        occq = (occq3 != 0).astype(jnp.int32).reshape(Nfp, Hq * gw)
        rank = jnp.cumsum(occq, axis=1) - occq
        slotarr = jnp.where(
            occq > 0, jnp.minimum(rank, T), T
        ).reshape(-1).astype(jnp.int32)
        # ALL scalar-prefetch operands share SMEM (~1 MB/core on v5e):
        # the frontier flags (Nf*gh*gw), the per-frame occupancy
        # (Nfp*gh*gw) AND the slot array — past the budget Mosaic fails
        # with an opaque "Allocation would exceed memory (space=smem)"
        # at compile time (measured: batch 512 @1080p -> 1.13 MB slot
        # operand alone); fail here with an actionable message instead,
        # summing the whole prefetch set so near-limit batches (e.g.
        # ~384-448 @1080p, where slots alone pass but slots+occupancy
        # don't) are caught too.
        # + Nf*gh for the per-row visit-skip operand
        smem_bytes = (
            occ_g.size + occf.size + slotarr.size + Nf * gh
        ) * 4
        if smem_bytes > 1_000_000:
            raise ValueError(
                f"scalar-prefetch operands total {smem_bytes} bytes "
                f"(slots {slotarr.size * 4}, occupancy {occf.size * 4}, "
                f"frontier {occ_g.size * 4}) for batch {Nfp} at {H}x{W} "
                "— exceeds the ~1 MB SMEM budget. Use batch <= 256 at "
                "1080p (split larger batches into multiple dispatches) "
                "or disable compact slots (compact_slots=0) for this "
                "shape."
            )

    def make_pass(forward: bool, first: bool, exact_flags: bool = True):
        def kernel(*args):
            if use_compact:
                fr_ref, occf_ref, slot_ref, row_ref = args[:4]
                refs = args[4:]
            else:
                fr_ref, occf_ref, row_ref = args[:3]
                refs = args[3:]
            cmp_out = ccnt = sem_c = None
            edgebuf = rowbuf = None
            if first:
                if debug_poison:
                    # skip the donated poison-fill inputs (aliased to the
                    # outputs; never read by the kernel)
                    refs = refs[:1] + refs[1 + (2 if use_compact else 1):]
                if use_compact:
                    (msk_in, lab_out, cmp_out, flag_ref,
                     tilebuf, mskbuf, edgebuf, rowbuf, wcnt, ccnt,
                     sem_r, sem_m, sem_w, sem_c) = refs
                else:
                    (msk_in, lab_out, flag_ref,
                     tilebuf, mskbuf, edgebuf, rowbuf, wcnt,
                     sem_r, sem_m, sem_w) = refs
            else:
                if use_compact:
                    (lab_in, cmp_in, lab_out, cmp_out, flag_ref,
                     tilebuf, wcnt, ccnt, sem_r, sem_w, sem_c) = refs
                else:
                    (lab_in, lab_out, flag_ref,
                     tilebuf, wcnt, sem_r, sem_w) = refs
            nf = pl.program_id(0)
            i = pl.program_id(1)
            if not forward:
                i = pl.num_programs(1) - 1 - i
            y0 = i * TH  # buffer window rows [y0, y0+SH)

            hy = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 0)
            hx = jax.lax.broadcasted_iota(jnp.int32, (SH, SW), 1)
            owned = (
                (hy >= PT) & (hy < PT + TH) & (hx >= PLW) & (hx < PLW + TW)
            )
            top = hy == PT - 1
            bot = hy == PT + TH
            lef = hx == PLW - 1
            rig = hx == PLW + TW
            mid_y = (hy >= PT) & (hy < PT + TH)
            mid_x = (hx >= PLW) & (hx < PLW + TW)
            on_ring = (
                (hy == PT) | (hy == PT + TH - 1)
                | (hx == PLW) | (hx == PLW + TW - 1)
            ) & owned

            # grid-collapse: the tile-column axis runs INSIDE the kernel
            # (lax.fori_loop over gw) instead of as a third grid axis.
            # Each grid step of the dense (Nf, gh, gw) layout cost ~1.4 us
            # of Mosaic sequencing even when skipped (measured: 5.9 ms
            # pure-overhead floor per pass at 1080p batch 256); folding gw
            # cuts the step count 8x with byte-identical visit order —
            # iterations run sequentially in raster order (reversed for
            # backward passes), all tile offsets were already dynamic
            # (pl.ds on program_id-derived scalars), and the per-visit
            # DMA start/drain discipline is unchanged.
            # ONE row-granular ring-change flag per grid step (frontier
            # soundness needs 0 for every unvisited row — see
            # _frontier_rows for why row granularity is a sound superset
            # of the tile-granular frontier). A per-tile flag would cost
            # gw scalar SMEM stores per step (~2/3 of the empty-scene
            # pass cost, measured).
            flag_ref[0, 0, 0] = 0

            def visit(kstep, carry):
                j = kstep if forward else gw - 1 - kstep
                xb = j * TW + (MC - PLW)  # buffer window cols [xb, xb+SW)
                if first:
                    # pass 1 (forward raster) only consumes the TOP ring
                    # row (window row PT-1, any col <= PLW+TW) and the
                    # LEFT ring col (window col PLW-1, mid rows) —
                    # bottom/right halos are masked to SENT. Gen 7: those
                    # halos never touch HBM at all. Pass 1 visits every
                    # occupied tile in raster order, so the LEFT
                    # neighbor's final labels are still in VMEM from the
                    # immediately-preceding visit (edgebuf: its rightmost
                    # PLW owned cols, captured by a static vector copy)
                    # and the row above's bottom PT owned rows went
                    # through rowbuf (a full-buffer-width VMEM carry,
                    # moved by local async copies — lane offsets are
                    # dynamic) during the previous grid step. The values
                    # are exactly what the old lab_out strip reads
                    # returned AFTER the producer's write-back drained,
                    # and every staleness case (unoccupied / unvisited /
                    # other-frame / other-group producer) was ALREADY
                    # SENT-masked per frame by nb_occ — occupied-in-frame
                    # implies visited-and-captured. Saves the 393 KB/
                    # group-visit of pass-1 halo HBM reads.
                    rd_strips = []
                else:
                    rd_strips = [
                        pltpu.make_async_copy(
                            lab_out.at[
                                pl.ds(nf * F, F), pl.ds(y0, SH),
                                pl.ds(xb, SW)
                            ],
                            tilebuf,
                            sem_r,
                        )
                    ]

                def nb_occ(t, di, dj):
                    ii, jj = i + di, j + dj
                    ok = (ii >= 0) & (ii < gh) & (jj >= 0) & (jj < gw)
                    idx = (
                        t * gh + jnp.clip(ii, 0, gh - 1)
                    ) * gw + jnp.clip(jj, 0, gw - 1)
                    return jnp.where(ok, occf_ref[idx], 0) != 0

                # pass 1 is a forward raster: tiles below/right (and the
                # bottom-left diagonal) have not been written yet this
                # pass — their halo is masked to SENT, exactly what the
                # old SENT fill provided
                dirs = (
                    ((-1, -1), top & lef), ((-1, 0), top & mid_x),
                    ((-1, 1), top & rig), ((0, -1), lef & mid_y),
                    ((0, 1), rig & mid_y), ((1, -1), bot & lef),
                    ((1, 0), bot & mid_x), ((1, 1), bot & rig),
                )
                if first:
                    dirs = dirs[:4]  # visited neighbors only (fwd raster)

                def allowed_mask(t):
                    a = owned
                    for (di, dj), region in dirs:
                        a = a | (region & nb_occ(t, di, dj))
                    return a

                def sweep_to_fixed_point(v0, mm, precheck: bool):
                    def check(v):
                        return jnp.any(_nb_min(v, mm, SENT, 8) != v)

                    def inner(s):
                        v, _ = s
                        nv = _tile_sweep(v, mm, SENT, 8, max_run)
                        return nv, check(nv)

                    ch0 = check(v0) if precheck else jnp.bool_(True)
                    v, _ = lax.while_loop(lambda s: s[1], inner, (v0, ch0))
                    return v

                def wr_copy(f):
                    return pltpu.make_async_copy(
                        tilebuf.at[f, pl.ds(PT, TH), pl.ds(PLW, TW)],
                        lab_out.at[
                            nf * F + f,
                            pl.ds(y0 + PT, TH),
                            pl.ds(xb + PLW, TW),
                        ],
                        sem_w,
                    )

                def write_owned(f):
                    # start only — frame f's write-back overlaps frame
                    # f+1's sweep; drain_writes() at the end of the visit
                    # keeps the next visit's halo reads ordered (all
                    # copies are the same size, so wait k drains the k-th
                    # started copy regardless of which frames started
                    # them)
                    wr_copy(f).start()
                    wcnt[0] = wcnt[0] + 1

                def write_compact(f, t):
                    # extra (CR, TW) DMAs of the tile's occupied
                    # sub-blocks into their dense per-frame slots (own
                    # semaphore/count: sizes differ from the owned
                    # write-back)
                    if not use_compact:
                        return
                    for k in range(QT):
                        qidx = (t * Hq + (i * QT + k)) * gw + j
                        slot = slot_ref[qidx]

                        @pl.when(slot < T)
                        def _(f=f, k=k, slot=slot):
                            pltpu.make_async_copy(
                                tilebuf.at[
                                    f, pl.ds(PT + k * CR, CR),
                                    pl.ds(PLW, TW)
                                ],
                                cmp_out.at[nf * F + f, slot],
                                sem_c,
                            ).start()
                            ccnt[0] = ccnt[0] + 1

                def drain_writes():
                    for k in range(F):
                        @pl.when(k < wcnt[0])
                        def _(k=k):
                            wr_copy(0).wait()
                    if use_compact:
                        cq = pltpu.make_async_copy(
                            tilebuf.at[0, pl.ds(PT, CR), pl.ds(PLW, TW)],
                            cmp_out.at[0, 0],
                            sem_c,
                        )
                        for k in range(F * QT):
                            @pl.when(k < ccnt[0])
                            def _(k=k):
                                cq.wait()

                def per_frame_first():
                    for f in range(F):
                        t = nf * F + f
                        self_occ = occf_ref[(t * gh + i) * gw + j] != 0

                        @pl.when(self_occ)
                        def _(f=f, t=t):
                            mi = mskbuf[f].astype(jnp.int32)
                            rr = jax.lax.broadcasted_iota(
                                jnp.int32, (TH, TW), 0
                            ) + i * TH
                            cc = jax.lax.broadcasted_iota(
                                jnp.int32, (TH, TW), 1
                            ) + j * TW
                            key = (
                                ((rr >> 1) * Wb + (cc >> 1)) * 4
                                + (rr & 1) * 2 + (cc & 1)
                            )
                            tilebuf[f, PT:PT + TH, PLW:PLW + TW] = (
                                jnp.where(mi != 0, key, jnp.int32(SENT))
                            )
                            v0 = jnp.where(
                                allowed_mask(t), tilebuf[f],
                                jnp.int32(SENT)
                            )
                            mm = (
                                v0 <= jnp.int32(sent_base)
                            ).astype(jnp.int32)
                            v = sweep_to_fixed_point(
                                v0, mm, precheck=False
                            )
                            # EXACT pass-1 ring flag (gen 6) — replaces
                            # the conservative "ring carries mask" flag
                            # that scheduled a pass-2 neighborhood for
                            # every edge-touching blob (~10 ms/batch on
                            # the 1080p bench scene, measured by
                            # bench/ccl_pass_probe.py). Soundness:
                            # - LATER-visited neighbors (bottom row,
                            #   right; pass 1 visits EVERY occupied
                            #   tile) read this tile's final ring within
                            #   this very pass (write_owned drains
                            #   before the next visit's halo reads), so
                            #   they can never need scheduling on this
                            #   tile's account.
                            # - EARLIER-visited neighbors (top halo row
                            #   incl. both diagonal corners, left halo
                            #   col) are final-for-this-pass and their
                            #   1-px edges sit in v0's halo, so "can my
                            #   owned labels lower any of their
                            #   adjacent pixels" is computed EXACTLY:
                            #   flag iff some halo mask pixel q in those
                            #   regions has min(owned 3x3-neighbors of
                            #   q in v) < v0(q). Unoccupied/unvisited
                            #   halos are SENT-masked in v0 => mm(q)=0
                            #   => never improvable.
                            # - Monotonicity closes the induction:
                            #   labels only decrease, so a neighbor not
                            #   improvable now can never become
                            #   improvable by this tile's unchanged
                            #   ring later. Later passes use the same
                            #   improvability test over the FULL halo
                            #   (gen 6b, see per_frame_later) — flag
                            #   semantics stay "some neighbor may need
                            #   re-sweeping" (_frontier_rows argument
                            #   unchanged).
                            # single_pass mode (exact_flags=False) skips
                            # the test statically: no later pass will
                            # consume the flags, and the record-level
                            # reconcile recovers exactly the merges the
                            # flag would have scheduled.
                            if exact_flags:
                                src = jnp.where(
                                    owned, v, jnp.int32(SENT)
                                )
                                r1 = jnp.minimum(
                                    src,
                                    jnp.minimum(
                                        _shift_fill(src, -1, 1, SENT),
                                        _shift_fill(src, 1, 1, SENT),
                                    ),
                                )
                                nbo = jnp.minimum(
                                    r1,
                                    jnp.minimum(
                                        _shift_fill(r1, -1, 0, SENT),
                                        _shift_fill(r1, 1, 0, SENT),
                                    ),
                                )
                                early = (
                                    top
                                    & (hx >= PLW - 1) & (hx <= PLW + TW)
                                ) | (lef & mid_y)
                                improvable = (
                                    early
                                    & (v0 <= jnp.int32(sent_base))
                                    & (nbo < v0)
                                )

                                @pl.when(jnp.any(improvable))
                                def _():
                                    flag_ref[0, 0, 0] = 1
                            tilebuf[f] = v
                            write_owned(f)
                            write_compact(f, t)

                def per_frame_later():
                    for f in range(F):
                        t = nf * F + f
                        self_occ = occf_ref[(t * gh + i) * gw + j] != 0

                        @pl.when(self_occ)
                        def _(f=f, t=t):
                            allow = allowed_mask(t)
                            v0 = jnp.where(
                                allow, tilebuf[f], jnp.int32(SENT)
                            )
                            mm = (
                                v0 <= jnp.int32(sent_base)
                            ).astype(jnp.int32)
                            v = sweep_to_fixed_point(
                                v0, mm, precheck=True
                            )
                            diff = (v != v0) & allow
                            owned_changed = jnp.any(
                                diff[PT:PT + TH, PLW:PLW + TW]
                            )
                            # EXACT later-pass flag (gen 6b) — replaces
                            # the conservative ring-CHANGED flag, which
                            # scheduled a do-nothing confirm pass after
                            # every productive pass. Flag iff the final
                            # owned labels can LOWER some mask pixel in
                            # the full 1-px halo (all 4 sides + 4
                            # corners). Sound for any visit order:
                            # - An earlier-visited (or not-in-frontier)
                            #   neighbor's halo snapshot is its current
                            #   value — the test is exact.
                            # - A later-visited-this-pass neighbor's
                            #   labels only DECREASE after the snapshot,
                            #   so "min(owned nbrs) >= v0(q)" can only
                            #   get stronger; and improvability from
                            #   this tile can only ARISE when this
                            #   tile's own labels decrease, which
                            #   re-runs this test (owned_changed).
                            # - Convergence: an empty frontier now means
                            #   no tile can lower any neighbor pixel —
                            #   every tile is at a local fixed point
                            #   and cross-tile edges admit no decrease:
                            #   a global fixed point.
                            src = jnp.where(owned, v, jnp.int32(SENT))
                            r1 = jnp.minimum(
                                src,
                                jnp.minimum(
                                    _shift_fill(src, -1, 1, SENT),
                                    _shift_fill(src, 1, 1, SENT),
                                ),
                            )
                            nbo = jnp.minimum(
                                r1,
                                jnp.minimum(
                                    _shift_fill(r1, -1, 0, SENT),
                                    _shift_fill(r1, 1, 0, SENT),
                                ),
                            )
                            halo1 = (
                                (top | bot)
                                & (hx >= PLW - 1) & (hx <= PLW + TW)
                            ) | ((lef | rig) & mid_y)
                            improvable = (
                                halo1
                                & (v0 <= jnp.int32(sent_base))
                                & (nbo < v0)
                            )

                            @pl.when(owned_changed)
                            def _(f=f, t=t):
                                @pl.when(jnp.any(improvable))
                                def _():
                                    flag_ref[0, 0, 0] = 1
                                tilebuf[f] = v
                                write_owned(f)
                                write_compact(f, t)

                occupied = fr_ref[(nf * gh + i) * gw + j] != 0

                @pl.when(occupied)
                def _():
                    wcnt[0] = 0
                    if use_compact:
                        ccnt[0] = 0
                    for rd in rd_strips:
                        rd.start()
                    if first:
                        # top-halo rows from the previous tile-row's
                        # VMEM carry (local async copy: the lane offset
                        # xb is dynamic, 128-aligned), left-halo cols
                        # from the previous visit's capture (static
                        # vector copy — disjoint rows from the rowbuf
                        # placement, so the copies can't race)
                        place = pltpu.make_async_copy(
                            rowbuf.at[:, :, pl.ds(xb, SW)],
                            tilebuf.at[:, pl.ds(0, PT), :],
                            sem_r,
                        )
                        place.start()
                        md = pltpu.make_async_copy(
                            msk_in.at[
                                pl.ds(nf * F, F),
                                pl.ds(i * TH, TH),
                                pl.ds(j * TW, TW),
                            ],
                            mskbuf,
                            sem_m,
                        )
                        md.start()
                        tilebuf[:, PT:PT + TH, 0:PLW] = edgebuf[:, :, :]
                        place.wait()
                        md.wait()
                        per_frame_first()
                        # capture this tile's final edges for the NEXT
                        # visits, before they overwrite tilebuf: right
                        # PLW owned cols -> edgebuf (consumed by (i,
                        # j+1)), bottom PT owned rows -> rowbuf at this
                        # tile's buffer columns (consumed by row i+1).
                        # Frames this tile doesn't own this group leave
                        # junk here — SENT-masked by nb_occ at every
                        # consumer (see the gen-7 note above).
                        edgebuf[:, :, :] = tilebuf[
                            :, PT:PT + TH, TW:TW + PLW
                        ]
                        cap = pltpu.make_async_copy(
                            tilebuf.at[:, pl.ds(TH, PT), pl.ds(PLW, TW)],
                            rowbuf.at[:, :, pl.ds(xb + PLW, TW)],
                            sem_r,
                        )
                        cap.start()
                        cap.wait()
                    else:
                        for rd in rd_strips:
                            rd.wait()
                        per_frame_later()
                    drain_writes()
                return carry

            # row-skip: a grid step whose whole tile-row has no occupied
            # (group, tile) pays only the gw flag-zero stores above —
            # measured ~3.3 us/iteration for the full (predicated-off)
            # visit body vs ~1.4 us for a skipped dense grid step, so
            # without this an empty scene REGRESSED vs the 3-axis grid
            def row_body():
                lax.fori_loop(0, gw, visit, jnp.int32(0))

            @pl.when(row_ref[nf * gh + i] != 0)
            def _():
                row_body()

        return kernel

    def make_flag_index(forward: bool):
        # backward passes reflect i in-kernel (and iterate j in reverse
        # inside the fori_loop); map the ROW flag to the tile row actually
        # processed — same reflection-soundness argument as the dense
        # kernel's make_flag_index, at row granularity (one flag per
        # grid step, _frontier_rows).
        def flag_index(n, i, *prefetch_refs):
            if not forward:
                i = gh - 1 - i
            return (n * gh + i, 0, 0)

        return flag_index

    lab_shape = jax.ShapeDtypeStruct((Nfp, Hbuf, Wbuf), jnp.int32)
    cmp_shape = jax.ShapeDtypeStruct(
        (Nfp, T, CR, TW) if use_compact else (0,), jnp.int32
    )
    n_prefetch = 4 if use_compact else 3

    def run_pass(lab, cmp, forward: bool, first: bool, fr_eff,
                 exact_flags: bool = True):
        inputs = [fr_eff, occf]
        if use_compact:
            inputs.append(slotarr)
        # per-(group, tile-row) occupancy/frontier: lets a grid step skip
        # the whole in-kernel gw visit loop for rows with nothing to do
        inputs.append(fr_eff.reshape(Nf, gh, gw).max(axis=2).reshape(-1))
        if first:
            inputs.append(mask_padded)
            n_arr = 1
            if debug_poison:
                POISON = jnp.int32(0x5A5A5A5A)
                inputs.append(jnp.full(lab_shape.shape, POISON, jnp.int32))
                n_arr += 1
                if use_compact:
                    inputs.append(
                        jnp.full(cmp_shape.shape, POISON, jnp.int32)
                    )
                    n_arr += 1
        else:
            inputs.append(lab)
            n_arr = 1
            if use_compact:
                inputs.append(cmp)
                n_arr = 2
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_arr
        scratch = [pltpu.VMEM((F, SH, SW), jnp.int32)]
        if first:
            scratch.append(pltpu.VMEM((F, TH, TW), jnp.uint8))
            # gen-7 pass-1 halo carries (see make_pass): the left
            # neighbor's right edge and the previous tile-row's bottom
            # rows live in VMEM instead of being re-read from lab_out
            scratch.append(pltpu.VMEM((F, TH, PLW), jnp.int32))  # edgebuf
            scratch.append(pltpu.VMEM((F, PT, Wbuf), jnp.int32))  # rowbuf
        scratch.append(pltpu.SMEM((1,), jnp.int32))  # in-flight writes
        if use_compact:
            scratch.append(pltpu.SMEM((1,), jnp.int32))  # compact copies
        if first:
            scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        scratch.append(pltpu.SemaphoreType.DMA(()))
        if use_compact:
            scratch.append(pltpu.SemaphoreType.DMA(()))
        out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape = [lab_shape]
        if use_compact:
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            out_shape.append(cmp_shape)
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 1), make_flag_index(forward),
                memory_space=pltpu.SMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((Nf * gh, 1, 1), jnp.int32)
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_prefetch,
            grid=(Nf, gh),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        )
        if first:
            aliases = {}
            if debug_poison:
                base = n_prefetch + 1  # poison-lab operand index
                aliases = {base: 0}
                if use_compact:
                    aliases[base + 1] = 1
        elif use_compact:
            aliases = {n_prefetch: 0, n_prefetch + 1: 1}
        else:
            aliases = {n_prefetch: 0}
        return pl.pallas_call(
            make_pass(forward, first, exact_flags),
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=_interpret(),
        )(*inputs)

    def frontier(flags):
        return _frontier_rows(flags, occ3)

    if single_pass:
        # gen 8: pass 1 only; the record-level reconcile in
        # _stats_from_compact(reconcile=True) replaces passes 2+.
        # converged is trivially True for THIS mode's contract (every
        # tile at a local fixed point); cross-tile closure convergence
        # is checked (and surfaced) by the reconcile itself.
        if use_compact:
            lab, cmp, _flags = run_pass(
                None, None, True, True, occ_g, exact_flags=False
            )
            return lab, cmp, jnp.bool_(True)
        lab, _flags = run_pass(
            None, None, True, True, occ_g, exact_flags=False
        )
        return lab, jnp.bool_(True)

    # ONE pass-alternation driver for both variants: cmp is a dummy
    # scalar when compact slots are off (use_compact is static, so the
    # branches below are resolved at trace time and the while_loop carry
    # stays a fixed pytree either way)
    if use_compact:
        lab, cmp, flags = run_pass(None, None, True, True, occ_g)
    else:
        lab, flags = run_pass(None, None, True, True, occ_g)
        cmp = jnp.int32(0)
    fr = frontier(flags.reshape(-1))

    def cond(state):
        _lab, _cmp, fr, _fwd, passes = state
        return (jnp.max(fr) > 0) & (passes < 2 * max_rounds)

    def body(state):
        lab, cmp, fr, fwd, passes = state
        if use_compact:
            lab, cmp, flags = lax.cond(
                fwd,
                lambda l, c, f: run_pass(l, c, True, False, f),
                lambda l, c, f: run_pass(l, c, False, False, f),
                lab, cmp, fr,
            )
        else:
            lab, flags = lax.cond(
                fwd,
                lambda l, f: run_pass(l, None, True, False, f),
                lambda l, f: run_pass(l, None, False, False, f),
                lab, fr,
            )
        return lab, cmp, frontier(flags.reshape(-1)), ~fwd, passes + 1

    lab, cmp, fr, _, _ = lax.while_loop(
        cond, body, (lab, cmp, fr, jnp.bool_(False), jnp.int32(1))
    )
    converged = jnp.max(fr) == 0
    if use_compact:
        return lab, cmp, converged
    return lab, converged
