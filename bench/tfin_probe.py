#!/usr/bin/env python
"""Split tracker_finish (dev tool): _finish_batch measured ~9.4 ms in
the roofline but the tracker SCAN alone is ~4.5 ms (track_exp) — this
times the remaining pieces (extract_detections, rows epilogue) at bench
shapes to say where the other ~4 ms lives for the next optimization
round. Tunnel discipline per CLAUDE.md."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax import lax

def sync(x): np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timeit(fn, args, iters=12, warmup=2):
    for _ in range(warmup): out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out

def main():
    from tpuva.utils import enable_compilation_cache
    enable_compilation_cache()
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_main", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bm = importlib.util.module_from_spec(spec); spec.loader.exec_module(bm)
    from tpuva.graph.pipeline import (_finish_batch, _fused_mask_stage,
                                      _post_mask_stage, init_carry)
    from tpuva.ops.label import _stats_from_compact, extract_detections
    from tpuva.ops.pallas.ccl import label_components_tiled_raw
    cfg = bm.build_config()
    H, W, N = 1080, 1920, 256
    z = np.load("/tmp/tpuva_sp_bench_clip.npz"); clip, plate = z["clip"], z["plate"]
    carry = init_carry(cfg, H, W, plate)
    frames = jnp.asarray(clip[:N])
    mask, bg_last, occ128 = _fused_mask_stage(cfg, carry, frames, padded_occ=True)
    Nn, Hb, Qc2 = occ128.shape
    so = occ128.reshape(Nn, Hb, Qc2 // 2, 2).max(axis=3)
    _lab, cbuf, _c = label_components_tiled_raw(mask, so, H, W, compact_slots=48)
    @jax.jit
    def stats_fn(cb, s):
        st = _stats_from_compact(cb, s, H, W, max_components=32)
        return {k: v for k, v in st.items() if k != "labels"}
    stats = stats_fn(cbuf, so); sync(stats)

    @jax.jit
    def ed_only(st):
        return extract_detections(st, cfg.segment.min_area, cfg.segment.max_blobs)
    t, dets_out = timeit(ed_only, (stats,))
    print(f"extract_detections : {t*1e3:7.2f} ms", flush=True)

    fb = jax.jit(lambda c, s, m, b: _finish_batch(cfg, c, s, m, b, False))
    t, _ = timeit(fb, (carry, stats, mask, bg_last))
    print(f"finish_batch full  : {t*1e3:7.2f} ms", flush=True)

    # scan-only: reuse precomputed detections, run just the scan + outputs
    from tpuva.graph.pipeline import PipelineCarry
    from tpuva.track.table import track_update
    dets, n_det, det_valid, det_sums = dets_out
    @jax.jit
    def scan_only(c, dets, det_valid):
        fidx = c.frame_idx + jnp.arange(N, dtype=jnp.int32)
        def step(ts, inp):
            d, dv, fi = inp
            ts, rows, rv = track_update(ts, d, dv, fi, max_dist=cfg.track.max_dist,
                                        death_patience=cfg.track.death_patience,
                                        assigner=cfg.track.assigner)
            return ts, (rows, rv)
        ts, (rows, rv) = lax.scan(step, c.track, (dets, det_valid, fidx), unroll=8)
        return rows, rv
    t, _ = timeit(scan_only, (carry, dets, det_valid))
    print(f"scan only          : {t*1e3:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
