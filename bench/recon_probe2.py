#!/usr/bin/env python
"""Second-stage reconcile decomposition (follows bench/recon_probe.py:
closure_only = 60 ms of the 62 ms reconcile adder; the compaction loop
is only ~8 ms of it). Times the closure's internal phases on the real
bench-scene inputs:

  extract      — boundary-stream extraction (slices, neighbor gathers,
                 rolls, concats) up to the flat pa/pb pair streams
  adj_scan     — chunked one-hot MXU adjacency build from fixed pa/pb
  adj_scan_vpu — same build but compare+any instead of einsum (chunked
                 small to bound the (N, CH, C, C) bool intermediate)
  square_mxu   — ceil(log2 C) batched (N,32,32) bf16 matmul squarings
  square_vpu   — same closure as broadcast-AND + any over k (8.4 MB
                 bool intermediate; no batched-tiny-matmul overhead)

Whichever phase holds the ~50 ms decides the rewrite.
"""

from __future__ import annotations

import os
import sys
import time

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

    from tpuva.graph.pipeline import _fused_mask_stage, init_carry
    from tpuva.ops import label as L
    from tpuva.ops.pallas.ccl import label_components_tiled_raw

    cfg = bench_main.build_config()
    H, W, N = 1080, 1920, 256
    clip, plate = bench_main.make_clip(H, W, 2 * N)
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[N:])
    mask, _bg, occ128 = _fused_mask_stage(cfg, carry, frames,
                                          padded_occ=True)
    Nn, Hb, Qc2 = occ128.shape
    so = occ128.reshape(Nn, Hb, Qc2 // 2, 2).max(axis=3)
    T = 48
    _lab, cbuf, _c = label_components_tiled_raw(
        mask, so, H, W, compact_slots=T, single_pass=True
    )
    sync(cbuf)

    C = 32
    Nf, Tc, CR, TW = cbuf.shape
    SB = CR // 2
    Hbp, Qcp = so.shape[1], so.shape[2]
    gh, gw = Hbp // SB, Qcp
    G = gh * gw
    _k2, _i2, sent = L._scan_key(H, W, 8)
    INF = jnp.int32(2**30)

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
        return rows3, slot_valid, tile_id, cum_t, occ_t, st["root_table"]

    rows3, slot_valid, tile_id, cum_t, occ_t, table = prologue(cbuf, so)
    sync(table)

    # ------------------------------------------------ extraction only
    @jax.jit
    def extract(rows3, slot_valid, tile_id, cum_t, occ_t):
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
        return pa, pb

    t, (pa, pb) = timeit(extract,
                         (rows3, slot_valid, tile_id, cum_t, occ_t))
    print(f"extract        : {t*1e3:8.2f} ms  P={pa.shape[1]}", flush=True)

    P = pa.shape[1]
    CH = 4096
    Pp = -(-P // CH) * CH
    pa_p = jnp.pad(pa, ((0, 0), (0, Pp - P)), constant_values=2**30)
    pb_p = jnp.pad(pb, ((0, 0), (0, Pp - P)), constant_values=2**30)
    pa_c = pa_p.reshape(N, Pp // CH, CH)
    pb_c = pb_p.reshape(N, Pp // CH, CH)
    sync(pb_c)

    @jax.jit
    def adj_scan(pa_c, pb_c, table):
        def chunk(adj, k):
            ca = lax.dynamic_index_in_dim(pa_c, k, axis=1, keepdims=False)
            cb_ = lax.dynamic_index_in_dim(pb_c, k, axis=1, keepdims=False)
            oha = (ca[:, :, None] == table[:, None, :]).astype(jnp.bfloat16)
            ohb = (cb_[:, :, None] == table[:, None, :]).astype(jnp.bfloat16)
            adj = adj + jnp.einsum(
                "npi,npj->nij", oha, ohb,
                preferred_element_type=jnp.float32,
            )
            return adj, 0

        adj, _ = lax.scan(chunk, jnp.zeros((N, C, C), jnp.float32),
                          jnp.arange(Pp // CH))
        return adj

    t, adj = timeit(adj_scan, (pa_c, pb_c, table))
    print(f"adj_scan       : {t*1e3:8.2f} ms", flush=True)

    # single big einsum, no scan (XLA sees one batched matmul)
    @jax.jit
    def adj_one(pa_p, pb_p, table):
        oha = (pa_p[:, :, None] == table[:, None, :]).astype(jnp.bfloat16)
        ohb = (pb_p[:, :, None] == table[:, None, :]).astype(jnp.bfloat16)
        return jnp.einsum(
            "npi,npj->nij", oha, ohb, preferred_element_type=jnp.float32
        )

    t, adj1 = timeit(adj_one, (pa_p, pb_p, table))
    print(f"adj_one        : {t*1e3:8.2f} ms", flush=True)

    # VPU build: compare + any, small chunks
    @jax.jit
    def adj_vpu(pa_c, pb_c, table):
        CH2 = 512
        pa2 = pa_c.reshape(N, -1, CH2)
        pb2 = pb_c.reshape(N, -1, CH2)
        K = pa2.shape[1]

        def chunk(adj, k):
            ca = lax.dynamic_index_in_dim(pa2, k, axis=1, keepdims=False)
            cb_ = lax.dynamic_index_in_dim(pb2, k, axis=1, keepdims=False)
            eqa = ca[:, :, None] == table[:, None, :]
            eqb = cb_[:, :, None] == table[:, None, :]
            hit = jnp.any(
                eqa[:, :, :, None] & eqb[:, :, None, :], axis=1
            )
            return adj | hit, 0

        adj, _ = lax.scan(chunk, jnp.zeros((N, C, C), bool),
                          jnp.arange(K))
        return adj

    t, adjv = timeit(adj_vpu, (pa_c, pb_c, table))
    print(f"adj_vpu        : {t*1e3:8.2f} ms", flush=True)

    # ------------------------------------------------ closure squarings
    @jax.jit
    def square_mxu(adj):
        eye = jnp.eye(C, dtype=jnp.float32)[None]
        A = ((adj + jnp.swapaxes(adj, 1, 2) + eye) > 0).astype(jnp.bfloat16)
        for _ in range(max(1, int(np.ceil(np.log2(C))))):
            A = (
                jnp.einsum("nij,njk->nik", A, A,
                           preferred_element_type=jnp.float32) > 0
            ).astype(jnp.bfloat16)
        return A > 0

    t, r_m = timeit(square_mxu, (adj,))
    print(f"square_mxu     : {t*1e3:8.2f} ms", flush=True)

    @jax.jit
    def square_vpu(adj):
        eye = jnp.eye(C, dtype=bool)[None]
        A = (adj > 0) | jnp.swapaxes(adj > 0, 1, 2) | eye
        for _ in range(max(1, int(np.ceil(np.log2(C))))):
            A = jnp.any(A[:, :, :, None] & A[:, None, :, :], axis=2)
        return A

    t, r_v = timeit(square_vpu, (adj,))
    print(f"square_vpu     : {t*1e3:8.2f} ms", flush=True)
    print("reach equal:", bool(jnp.array_equal(r_m, r_v)), flush=True)


if __name__ == "__main__":
    main()
