#!/usr/bin/env python
"""Decompose the single-pass CCL reconcile cost on-chip (dev tool).

bench/sp_probe.py measured the staged batch at 93 ms with
ccl_single_pass=True vs 42 ms multi-pass (bench scene, batch 256) —
the record-level reconcile costs far more than the ~7.7 ms of frontier
passes it replaces. This probe times each piece at the production shape:

  kernel_multi / kernel_single  — label_components_tiled_raw alone
  stats_plain / stats_recon     — _stats_from_compact reconcile=False/True
  closure_only                  — jitted _fragment_closure on the real
                                  compact buffer + table inputs
  closure_noloop                — closure variant with the 16-iteration
                                  distinct-pair compaction loop replaced
                                  by a chunked full-stream adjacency
                                  einsum (no cap, no loop) — measures
                                  whether the loop or the surrounding
                                  extraction dominates

Tunnel discipline per CLAUDE.md: warm first, tiny-transfer sync, several
iters, ~2.5 ms dispatch overhead per timed call.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def timeit(fn, args, iters=6, warmup=2):
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

    from tpuva.graph.pipeline import (
        _fused_mask_stage,
        init_carry,
    )
    from tpuva.ops import label as L
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    cfg = bench_main.build_config()
    H, W, N = 1080, 1920, 256
    clip, plate = bench_main.make_clip(H, W, 2 * N)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[N:])

    mask, _bg, occ128 = _fused_mask_stage(cfg, carry, frames, padded_occ=True)
    Nn, Hb, Qc2 = occ128.shape
    so = occ128.reshape(Nn, Hb, Qc2 // 2, 2).max(axis=3)
    sync(so)

    T = 48
    t, out_m = timeit(
        jax.jit(lambda m, s: label_components_tiled_raw(
            m, s, H, W, compact_slots=T)),
        (mask, so),
    )
    print(f"kernel_multi      : {t*1e3:8.2f} ms", flush=True)
    t, out_s = timeit(
        jax.jit(lambda m, s: label_components_tiled_raw(
            m, s, H, W, compact_slots=T, single_pass=True)),
        (mask, so),
    )
    print(f"kernel_single     : {t*1e3:8.2f} ms", flush=True)
    cbuf_m, cbuf_s = out_m[1], out_s[1]

    @jax.jit
    def stats_plain(cb, s):
        st = L._stats_from_compact(cb, s, H, W, max_components=32)
        return {k: v for k, v in st.items() if k != "labels"}

    @jax.jit
    def stats_recon(cb, s):
        st = L._stats_from_compact(
            cb, s, H, W, max_components=32, reconcile=True
        )
        return {k: v for k, v in st.items() if k != "labels"}

    t, _ = timeit(stats_plain, (cbuf_m, so))
    print(f"stats_plain       : {t*1e3:8.2f} ms", flush=True)
    t, st_r = timeit(stats_recon, (cbuf_s, so))
    print(f"stats_recon       : {t*1e3:8.2f} ms", flush=True)

    # ---- closure alone on the real inputs (mirror _stats_from_compact's
    # prologue to build slot metadata + table, then time only the closure)
    C = 32
    Nf, Tc, CR, TW = cbuf_s.shape
    SB = CR // 2
    Hbp, Qcp = so.shape[1], so.shape[2]
    gh, gw = Hbp // SB, Qcp
    G = gh * gw
    _kmap2, _inv2, sent = L._scan_key(H, W, 8)

    @jax.jit
    def prologue(cb, s):
        occ_strip3 = s != 0
        occf3 = lax.reduce_window(
            occ_strip3.astype(jnp.int32), jnp.int32(0), lax.max,
            (1, SB, 1), (1, SB, 1), "VALID",
        )
        occ_t = occf3.reshape(N, G) > 0
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
        rows3 = jnp.where(
            slot_valid[:, :, None, None],
            cb[:N].reshape(N, T, CR, TW),
            jnp.int32(-1),
        )
        st = L._stats_from_compact(cb, s, H, W, max_components=C)
        return rows3, slot_valid, tile_id, cum_t, occ_t, st["root_table"], \
            st["count"]

    ins = prologue(cbuf_s, so)
    sync(ins)
    rows3, slot_valid, tile_id, cum_t, occ_t, table, count = ins
    n_roots = jnp.sum(table < jnp.int32(sent), axis=1, dtype=jnp.int32)

    clo = jax.jit(lambda r, sv, ti, ct, ot, tb, nr: L._fragment_closure(
        r, sv, ti, ct, ot, gh, gw, tb, nr, sent))
    t, _ = timeit(clo, (rows3, slot_valid, tile_id, cum_t, occ_t, table,
                        n_roots))
    print(f"closure_only      : {t*1e3:8.2f} ms", flush=True)

    # ---- no-loop variant: full-stream chunked adjacency einsum
    INF = jnp.int32(2**30)

    @jax.jit
    def closure_noloop(rows3, slot_valid, tile_id, cum_t, occ_t, table,
                       n_roots):
        def valid_key(v):
            return (v >= 0) & (v < jnp.int32(sent))

        gi = tile_id // gw
        gj = tile_id % gw

        def nb_slot(di, dj):
            ii, jj = gi + di, gj + dj
            ok = (ii >= 0) & (ii < gh) & (jj >= 0) & (jj < gw) & slot_valid
            ng = jnp.clip(ii * gw + jj, 0, G - 1)
            occ = jnp.take_along_axis(occ_t, ng, axis=1)
            ns = jnp.take_along_axis(cum_t, ng, axis=1) - 1
            ok = ok & occ & (ns < T)
            return jnp.where(ok, ns, 0), ok

        def slot_rows(x, ns, ok):
            got = jnp.take_along_axis(
                x, jnp.broadcast_to(ns[:, :, None], x.shape), axis=1
            )
            return jnp.where(ok[:, :, None], got, INF)

        bot = rows3[:, :, CR - 1, :]
        top = rows3[:, :, 0, :]
        nsb, okb = nb_slot(1, 0)
        mtop = slot_rows(top, nsb, okb)
        lane = jnp.arange(TW, dtype=jnp.int32)
        streams = []
        for dx in (-1, 0, 1):
            m = jnp.roll(mtop, -dx, axis=2)
            edge_ok = (lane + dx >= 0) & (lane + dx < TW)
            streams.append(jnp.where(edge_ok[None, None, :], m, INF))
        mv = jnp.concatenate(streams, axis=2)
        av = jnp.tile(bot, (1, 1, 3))
        okv = valid_key(av) & valid_key(mv) & (av != mv)
        pa_v = jnp.where(okv, av, INF).reshape(N, -1)
        pb_v = jnp.where(okv, mv, INF).reshape(N, -1)

        rcol = rows3[:, :, :, TW - 1]
        lcol = rows3[:, :, :, 0]
        nsr, okr = nb_slot(0, 1)
        mlc = slot_rows(lcol, nsr, okr)
        rr = jnp.arange(CR, dtype=jnp.int32)
        hstreams = []
        for dy in (-1, 0, 1):
            m = jnp.roll(mlc, -dy, axis=2)
            edge_ok = (rr + dy >= 0) & (rr + dy < CR)
            hstreams.append(jnp.where(edge_ok[None, None, :], m, INF))
        mh = jnp.concatenate(hstreams, axis=2)
        ah = jnp.tile(rcol, (1, 1, 3))
        okh = valid_key(ah) & valid_key(mh) & (ah != mh)
        pa_h = jnp.where(okh, ah, INF).reshape(N, -1)
        pb_h = jnp.where(okh, mh, INF).reshape(N, -1)

        def corner(dj, a_col, b_col):
            nsd, okd = nb_slot(1, dj)
            a = rows3[:, :, CR - 1, a_col]
            bvals = jnp.take_along_axis(rows3[:, :, 0, b_col], nsd, axis=1)
            bvals = jnp.where(okd, bvals, INF)
            okc = valid_key(a) & valid_key(bvals) & (a != bvals)
            return jnp.where(okc, a, INF), jnp.where(okc, bvals, INF)

        pa_br, pb_br = corner(1, TW - 1, 0)
        pa_bl, pb_bl = corner(-1, 0, TW - 1)

        pa = jnp.concatenate([pa_v, pa_h, pa_br, pa_bl], axis=1)
        pb = jnp.concatenate([pb_v, pb_h, pb_br, pb_bl], axis=1)
        P = pa.shape[1]
        CH = 4096
        Pp = -(-P // CH) * CH
        pa = jnp.pad(pa, ((0, 0), (0, Pp - P)), constant_values=2**30)
        pb = jnp.pad(pb, ((0, 0), (0, Pp - P)), constant_values=2**30)
        pa = pa.reshape(N, Pp // CH, CH)
        pb = pb.reshape(N, Pp // CH, CH)

        def chunk(carry, k):
            adj, miss = carry
            ca = lax.dynamic_index_in_dim(pa, k, axis=1, keepdims=False)
            cb_ = lax.dynamic_index_in_dim(pb, k, axis=1, keepdims=False)
            eqa = (ca[:, :, None] == table[:, None, :])
            eqb = (cb_[:, :, None] == table[:, None, :])
            oha = eqa.astype(jnp.bfloat16)
            ohb = eqb.astype(jnp.bfloat16)
            adj = adj + jnp.einsum(
                "npi,npj->nij", oha, ohb,
                preferred_element_type=jnp.float32,
            )
            hp = ca < INF
            found_k = jnp.any(eqa, axis=2) & jnp.any(eqb, axis=2)
            miss = miss + jnp.sum(hp & ~found_k, axis=1, dtype=jnp.int32)
            return (adj, miss), 0

        (adj, missing), _ = lax.scan(
            chunk,
            (jnp.zeros((N, C, C), jnp.float32),
             jnp.zeros((N,), jnp.int32)),
            jnp.arange(Pp // CH),
        )
        eye = jnp.eye(C, dtype=jnp.float32)[None]
        A = ((adj + jnp.swapaxes(adj, 1, 2) + eye) > 0).astype(jnp.bfloat16)
        for _ in range(max(1, int(np.ceil(np.log2(max(C, 2)))))):
            A = (
                jnp.einsum(
                    "nij,njk->nik", A, A,
                    preferred_element_type=jnp.float32,
                )
                > 0
            ).astype(jnp.bfloat16)
        reach = A > 0
        fk = jnp.min(jnp.where(reach, table[:, None, :], INF), axis=2)
        fk = jnp.minimum(fk, table)
        overflow = missing + jnp.maximum(n_roots - C, 0)
        return fk, overflow

    t, out_nl = timeit(
        closure_noloop,
        (rows3, slot_valid, tile_id, cum_t, occ_t, table, n_roots),
    )
    print(f"closure_noloop    : {t*1e3:8.2f} ms", flush=True)

    # correctness: both closures must agree on the bench scene
    fk_a, ov_a = clo(rows3, slot_valid, tile_id, cum_t, occ_t, table,
                     n_roots)
    fk_b, ov_b = out_nl
    same = bool(jnp.array_equal(fk_a, fk_b))
    print(f"fk equal: {same}  overflow loop={int(jnp.max(ov_a))} "
          f"noloop={int(jnp.max(ov_b))}", flush=True)


if __name__ == "__main__":
    main()
