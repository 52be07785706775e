"""Spatial tensor parallelism: one video stream tiled across chips
(SURVEY.md §2.4 "TP": mesh ('space',), filters run on row bands with halo
exchange of kernel-radius rows via ppermute — the image analog of tensor
parallelism; also the honest analog of context parallelism for this
workload, §5.7).

Layout per chip: a horizontal band of every frame plus the band of the
background-model carry. Per batch:

1. band halos (blur radius + morphology reach rows) are exchanged with
   mesh neighbors via `lax.ppermute` over ICI; true image borders
   reconstruct their REFLECT_101 halo locally;
2. the full filter -> background -> threshold -> morphology front-end runs
   on the extended band (halo rows recomputed redundantly, exactly like
   the fused Pallas kernel's overlap scheme), with cv2 border semantics
   enforced at true image borders only;
3. the sparse masks are `all_gather`ed and the tiny segmentation+tracking
   tail runs replicated on every chip (deterministic, so replicas agree).

Bit-identical to the single-chip pipeline (tested on the simulated CPU
mesh). The multi-STREAM data-parallel mode (tpuva.dist.multistream) is the
production path (BASELINE.json:11); this mode exists for the
single-stream-multi-chip case.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from tpuva.dist.multistream import shard_map  # version-compat import
from tpuva.graph.config import PipelineConfig
from tpuva.graph.pipeline import (
    PipelineCarry,
    _finish_batch,
    background_trajectory,
    filter_batch,
    init_carry,
)
from tpuva.ops import connected_components_with_stats, structuring_element, threshold
from tpuva.ops.filters import _morph


def make_space_mesh(n_chips: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_chips:
        raise ValueError(f"need {n_chips} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_chips]), ("space",))


def _halo_rows(cfg: PipelineConfig) -> int:
    rb = cfg.blur.ksize // 2 if cfg.blur else 0
    rm = cfg.median.ksize // 2 if cfg.median else 0
    ro = (
        (cfg.morph_open.ksize // 2) * cfg.morph_open.iterations * 2
        if cfg.morph_open
        else 0
    )
    rc = (
        (cfg.morph_close.ksize // 2) * cfg.morph_close.iterations * 2
        if cfg.morph_close
        else 0
    )
    return max(1, rb + rm + ro + rc)


def make_spatial_processor(
    cfg: PipelineConfig,
    H: int,
    W: int,
    n_chips: int,
    mesh: Optional[Mesh] = None,
    max_components: int = 64,
):
    """Returns fn(carry, frames (N, H, W) uint8) -> (carry, out) with the
    same semantics as process_batch, executed band-parallel over the
    ('space',) mesh. carry.bg is sharded by rows; tracker state is
    replicated. H must divide evenly by n_chips."""
    if H % n_chips:
        raise ValueError(f"H={H} not divisible by n_chips={n_chips}")
    mesh = mesh or make_space_mesh(n_chips)
    halo = _halo_rows(cfg)
    Hb = H // n_chips
    if halo > Hb:
        raise ValueError("halo larger than band; use fewer chips")

    fwd = [(i, i + 1) for i in range(n_chips - 1)]  # send down
    bwd = [(i + 1, i) for i in range(n_chips - 1)]  # send up

    def exchange(x, axis_rows):
        """Extend a per-shard (N, Hb, W) array by `halo` rows on each side:
        interior halos via ppermute; true borders via local REFLECT_101."""
        idx = lax.axis_index("space")
        top_own = x[:, :halo]
        bot_own = x[:, -halo:]
        from_above = lax.ppermute(bot_own, "space", fwd)  # my top halo
        from_below = lax.ppermute(top_own, "space", bwd)  # my bottom halo
        # REFLECT_101 at the true image borders (row 0 reflects to row 1..)
        reflect_top = x[:, 1 : halo + 1][:, ::-1]
        reflect_bot = x[:, -halo - 1 : -1][:, ::-1]
        top = jnp.where(idx == 0, reflect_top, from_above)
        bot = jnp.where(idx == n_chips - 1, reflect_bot, from_below)
        return jnp.concatenate([top, x, bot], axis=1)

    def band_morph(mask, in_img, mcfg, is_open):
        se = structuring_element(mcfg.shape, mcfg.ksize)
        first, second = (True, False) if is_open else (False, True)
        m = mask
        for erode_phase in (first, second):
            for _ in range(mcfg.iterations):
                ident = jnp.uint8(255) if erode_phase else jnp.uint8(0)
                m = jnp.where(in_img, m, ident)
                m = _morph(m, se, is_erode=erode_phase)
        return m

    def shard_fn(carry, frames):
        # per-shard shapes: carry.bg (Hb, W); frames (N, Hb, W)
        idx = lax.axis_index("space")
        f = exchange(frames.astype(jnp.float32), halo)
        f = filter_batch(cfg, f)
        bg_prev = exchange(carry.bg[None], halo)[0]
        bg0 = jnp.where(carry.bg_valid, bg_prev, f[0])
        bgs = background_trajectory(bg0, f, cfg.background.alpha, False)
        mask = threshold(jnp.abs(f - bgs), cfg.segment.threshold)
        # morphology with cv2 constant-border semantics at TRUE borders
        rows = jnp.arange(-halo, Hb + halo)[None, :, None]
        gr = rows + idx * Hb
        in_img = (gr >= 0) & (gr < H)
        if cfg.morph_open is not None:
            mask = band_morph(mask, in_img, cfg.morph_open, True)
        if cfg.morph_close is not None:
            mask = band_morph(mask, in_img, cfg.morph_close, False)
        mask_band = mask[:, halo : halo + Hb]
        bg_band = bgs[-1][halo : halo + Hb]

        # gather the (sparse) masks; the segmentation+tracking tail is tiny
        # and runs replicated — every chip computes identical results
        full = lax.all_gather(mask_band, "space", axis=0)  # (S, N, Hb, W)
        full = jnp.moveaxis(full, 0, 1).reshape(frames.shape[0], H, W)
        stats = connected_components_with_stats(
            full,
            max_components=max_components,
            compute_bbox=False,
            compute_labels=False,
        )
        rep_carry = PipelineCarry(
            bg=jnp.zeros((1, 1), jnp.float32),  # placeholder, not used
            bg_valid=carry.bg_valid,
            track=carry.track,
            frame_idx=carry.frame_idx,
        )
        new_rep, out = _finish_batch(
            cfg, rep_carry, stats, full, jnp.zeros((1, 1), jnp.float32), False
        )
        new_carry = PipelineCarry(
            bg=bg_band,
            bg_valid=jnp.bool_(True),
            track=new_rep.track,
            frame_idx=new_rep.frame_idx,
        )
        return new_carry, out

    carry_specs = PipelineCarry(
        bg=P("space", None), bg_valid=P(), track=jax.tree.map(
            lambda _: P(), init_carry(cfg, H, W).track
        ), frame_idx=P(),
    )
    out_specs = {
        "rows": P(), "row_valid": P(), "n_det": P(), "row_sums": P(),
    }
    specs = dict(
        mesh=mesh,
        in_specs=(carry_specs, P(None, "space", None)),
        out_specs=(carry_specs, out_specs),
    )
    try:
        fn = shard_map(shard_fn, check_vma=False, **specs)
    except TypeError:  # pragma: no cover
        fn = shard_map(shard_fn, check_rep=False, **specs)
    return jax.jit(fn)
