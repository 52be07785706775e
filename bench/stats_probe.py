#!/usr/bin/env python
"""Sub-stage decomposition of _stats_from_compact at the bench scene
(dev tool; PERF_ROOFLINE shows the stage at ~2% of the HBM roofline, so
the cost is compute/latency — this probe says WHERE).

The stage body is replicated here, split at its seams:
  prologue  — occupancy ranks, slot->tile map, overflow
  rootflags — row-granular root-flag compare + per-strip root counts
  roottable — strip sort, chunk_of_c selection chain, root-key table
  limbs     — tiered _limb_contract payload contraction
  assemble  — limb recombination + centroid division
Each sub-stage is timed as its own jit (inputs materialized), so the
numbers include per-dispatch overhead (~2.5 ms on this box's tunnel)
and lose cross-stage fusion — treat them as an upper bound on each
piece, and trust the deltas, not the absolute split. The replica's
final output is asserted bit-equal to the real _stats_from_compact so
drift from label.py fails loudly.

Tunnel discipline per CLAUDE.md: tiny-transfer sync, iters between
syncs.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax


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
    print("devices:", jax.devices(), flush=True)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_main",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench_main)
    build_config, make_clip = bench_main.build_config, bench_main.make_clip

    from tpuva.graph.pipeline import _fused_mask_stage, init_carry
    from tpuva.ops import label as L
    from tpuva.ops.label import (
        _limb_contract,
        _assemble_stats,
        _scan_key,
        _stats_from_compact,
        _strip_keys,
        _strip_view_meta,
    )
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    cfg = build_config()
    H, W = 1080, 1920
    N = cfg.batch
    clip, plate = make_clip(H, W, N * 2)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[N : 2 * N])
    mask, _bg, occ128 = _fused_mask_stage(cfg, carry, frames, padded_occ=True)

    @jax.jit
    def strip_occ_of(o):
        return lax.reduce_window(
            o, jnp.uint8(0), lax.max, (1, 1, 2), (1, 1, 2), "VALID"
        )

    so = strip_occ_of(occ128)
    _raw, cbuf, _conv = label_components_tiled_raw(
        mask, so, H, W, compact_slots=48
    )
    # free everything stats doesn't need — the raw label buffer alone is
    # ~3 GB at batch 256 and the probe otherwise OOMs the 16 GB chip
    del _raw, _conv, mask, occ128, frames, clip
    sync(cbuf)
    C = 32

    # ---- full stage (production shape: the zeros "labels" placeholder
    # is dead inside _post_mask_stage; timing the bare jit would add a
    # (N, H, W) int32 zero write (~2.6 ms) the pipeline never pays) ----
    @jax.jit
    def stats_prod(cb, s):
        st = _stats_from_compact(cb, s, H, W, max_components=C)
        return {k: v for k, v in st.items() if k != "labels"}

    t_full, ref = timeit(stats_prod, (cbuf, so))
    print(f"full _stats_from_compact : {t_full*1e3:8.2f} ms", flush=True)

    # ---- replica, split at the seams (mirrors label.py:1152-1310,
    # no-bbox path; assert-checked against `ref` below) ----
    strip_occ = so
    compact = cbuf
    Nn, Hbp, Qcp = strip_occ.shape
    Nfp, T, CR, TW = compact.shape
    SB = CR // 2
    gh, gw = Hbp // SB, Qcp
    G = gh * gw
    S = T * SB
    _kmap2, _inv2, sent = _scan_key(H, W, 8)
    Wb = (W + 1) // 2
    _keys, _base_g, kofs = _strip_keys(H, W, 8, Qcp, Hbp * Qcp)

    @jax.jit
    def prologue(strip_occ):
        occ_strip3 = strip_occ != 0
        occf3 = lax.reduce_window(
            occ_strip3.astype(jnp.int32), jnp.int32(0), lax.max,
            (1, SB, 1), (1, SB, 1), "VALID",
        )
        occ_t = occf3.reshape(Nn, G) > 0
        cum_t = jnp.cumsum(occ_t.astype(jnp.int32), axis=1)
        tiles_occ = cum_t[:, -1]
        ts = jnp.arange(T, dtype=jnp.int32)
        tile_id = jnp.minimum(
            jnp.sum(
                (cum_t[:, :, None] <= ts[None, None, :]).astype(jnp.int32),
                axis=1,
            ),
            G - 1,
        )
        slot_valid = ts[None, :] < jnp.minimum(tiles_occ, T)[:, None]
        rank_t = (cum_t - occ_t.astype(jnp.int32)).reshape(Nn, gh, gw)
        strip_rank = jnp.broadcast_to(
            rank_t[:, :, None, :], (Nn, gh, SB, gw)
        ).reshape(Nn, Hbp, gw)
        overflow = jnp.sum(
            occ_strip3 & (strip_rank >= T), axis=(1, 2), dtype=jnp.int32
        )
        ti = tile_id // gw
        tj = tile_id % gw
        rr = jnp.arange(SB, dtype=jnp.int32)
        b = (ti[:, :, None] * SB + rr[None, None, :]).reshape(Nn, S)
        c = jnp.broadcast_to(tj[:, :, None], (Nn, T, SB)).reshape(Nn, S)
        base_s = (b * Wb + c * 128) * 4
        sv = jnp.broadcast_to(
            slot_valid[:, :, None], (Nn, T, SB)
        ).reshape(Nn, S)
        return b, c, base_s, sv, overflow

    t_pro, pro = timeit(prologue, (strip_occ,))
    b, c, base_s, sv, overflow = pro
    print(f"prologue                 : {t_pro*1e3:8.2f} ms", flush=True)
    cumulative = [("prologue", t_pro)]

    cols = np.arange(TW, dtype=np.int64)
    kof_par = np.stack(
        [(cols >> 1) * 4 + p * 2 + (cols & 1) for p in (0, 1)]
    ).astype(np.int32)
    kof_rows = jnp.asarray(np.tile(kof_par, (S, 1)))

    @jax.jit
    def rootflags(compact, sv, base_s):
        gotr = compact[:Nn].reshape(Nn, 2 * S, TW)
        svr = jnp.repeat(sv, 2, axis=1)
        gotr = jnp.where(svr[:, :, None], gotr, jnp.int32(-1))
        base_r = jnp.repeat(base_s, 2, axis=1)
        flags_r = (
            gotr == base_r[:, :, None] + kof_rows[None]
        ) & (gotr < jnp.int32(sent))
        cnts = jnp.sum(
            flags_r, axis=2, dtype=jnp.int32
        ).reshape(Nn, S, 2).sum(axis=2)
        return gotr, flags_r, cnts

    t_rf, rf = timeit(rootflags, (compact, sv, base_s))
    gotr, flags_r, cnts = rf
    print(f"rootflags (+cnts)        : {t_rf*1e3:8.2f} ms", flush=True)

    _m1, _m2, _m3, perm = _strip_view_meta(8)

    @jax.jit
    def roottable(cnts, sv, base_s, flags_r):
        key_big = jnp.where(sv, base_s, jnp.int32(2**30))
        iota_s = jnp.broadcast_to(
            jnp.arange(S, dtype=jnp.int32)[None], (Nn, S)
        )
        _ordk, order = lax.sort_key_val(key_big, iota_s, dimension=1)
        cnts_o = jnp.take_along_axis(cnts, order, axis=1)
        cum = jnp.cumsum(cnts_o, axis=1)
        offs = cum - cnts_o
        n_roots = cum[:, -1]
        cs = jnp.arange(C, dtype=jnp.int32)
        chunk_of_c = jnp.minimum(
            jnp.sum(
                (cum[:, None, :] <= cs[None, :, None]).astype(jnp.int32),
                axis=2,
            ),
            S - 1,
        )
        r_in_chunk = cs[None, :] - jnp.take_along_axis(
            offs, chunk_of_c, axis=1
        )
        strip_of_c = jnp.take_along_axis(order, chunk_of_c, axis=1)
        ridx = (strip_of_c[:, :, None] * 2
                + jnp.arange(2, dtype=jnp.int32)[None, None]
                ).reshape(Nn, 2 * C)
        sel_flags = jnp.take_along_axis(
            flags_r, ridx[:, :, None], axis=1
        ).reshape(Nn, C, 512)[:, :, jnp.asarray(perm)]
        cumk = jnp.cumsum(sel_flags.astype(jnp.int32), axis=2)
        pos = jnp.argmax(
            cumk > r_in_chunk[:, :, None], axis=2
        ).astype(jnp.int32)
        kval = jnp.take_along_axis(base_s, strip_of_c, axis=1) + pos
        tvalid = cs[None, :] < n_roots[:, None]
        table = jnp.where(tvalid, kval, jnp.int32(sent + 2))
        return table, n_roots

    t_rt, rt = timeit(roottable, (cnts, sv, base_s, flags_r))
    table, n_roots = rt
    print(f"roottable (sort+select)  : {t_rt*1e3:8.2f} ms", flush=True)

    par = jnp.asarray(np.tile(np.array([0, 1], np.int32), S))

    @jax.jit
    def limbs(gotr, table, b, c):
        b_row = jnp.repeat(2 * b, 2, axis=1) + par[None]
        c_row = jnp.repeat(c, 2, axis=1)
        sums, _ = _limb_contract(
            gotr, table, b_row, c_row, tail_split=128,
            table_invalid=sent + 2,
        )
        return sums

    t_lc, sums = timeit(limbs, (gotr, table, b, c))
    print(f"limb contraction         : {t_lc*1e3:8.2f} ms", flush=True)

    @jax.jit
    def assemble(sums, n_roots):
        return _assemble_stats(sums, n_roots, H, W, C)

    t_as, asm = timeit(assemble, (sums, n_roots))
    print(f"assemble                 : {t_as*1e3:8.2f} ms", flush=True)

    total = t_pro + t_rf + t_rt + t_lc + t_as
    print(
        f"sum of pieces            : {total*1e3:8.2f} ms "
        f"(full {t_full*1e3:.2f}; gap = fusion + fewer dispatches)",
        flush=True,
    )

    # ---- cumulative prefixes: same dispatch/sync structure as the full
    # stage, so successive DELTAS attribute cost far better than the
    # isolated pieces above (which each pay ~2.5 ms dispatch + ~3.5 ms
    # amortized sync) ----
    @jax.jit
    def upto_prologue(compact, strip_occ):
        return prologue(strip_occ)

    @jax.jit
    def upto_rootflags(compact, strip_occ):
        b, c, base_s, sv, overflow = prologue(strip_occ)
        return rootflags(compact, sv, base_s)

    @jax.jit
    def upto_roottable(compact, strip_occ):
        b, c, base_s, sv, overflow = prologue(strip_occ)
        gotr, flags_r, cnts = rootflags(compact, sv, base_s)
        return roottable(cnts, sv, base_s, flags_r)

    @jax.jit
    def upto_limbs(compact, strip_occ):
        b, c, base_s, sv, overflow = prologue(strip_occ)
        gotr, flags_r, cnts = rootflags(compact, sv, base_s)
        table, n_roots = roottable(cnts, sv, base_s, flags_r)
        return limbs(gotr, table, b, c)

    prev = 0.0
    for name, fn in [
        ("prologue", upto_prologue),
        ("+rootflags", upto_rootflags),
        ("+roottable", upto_roottable),
        ("+limbs", upto_limbs),
        ("+assemble(full)", stats_prod),
    ]:
        t_c, _ = timeit(fn, (compact, strip_occ), iters=16, warmup=2)
        print(
            f"cumulative {name:16s}: {t_c*1e3:8.2f} ms  "
            f"(delta {(t_c-prev)*1e3:+7.2f})",
            flush=True,
        )
        prev = t_c

    # drift guard: replica output must equal the real stage bit-exactly
    count, area, centroid, csum, present = asm
    np.testing.assert_array_equal(np.asarray(ref["count"]), np.asarray(count))
    np.testing.assert_array_equal(np.asarray(ref["area"]), np.asarray(area))
    np.testing.assert_array_equal(
        np.asarray(ref["centroid_sum"]), np.asarray(csum)
    )
    np.testing.assert_array_equal(
        np.asarray(ref["root_table"]), np.asarray(table)
    )
    np.testing.assert_array_equal(
        np.asarray(ref["overflow"]), np.asarray(overflow)
    )
    print("replica bit-equal to _stats_from_compact: OK", flush=True)


if __name__ == "__main__":
    main()
