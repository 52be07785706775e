#!/usr/bin/env python
"""Isolate the streamed-loop bottleneck on the tunnel box: run the soak's
device-fed loop (render -> staged step) under different row-collection
strategies and report fps for each.

Modes:
  none       — dispatch only, outputs dropped (upper bound: pure pipeline)
  sync64     — synchronous packed fetch every 64 batches (producer blocks)
  async4     — AsyncRowDrainer, group=4 (the current soak default)
  async16    — AsyncRowDrainer, group=16
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np



def main():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "soak_100k", os.path.join(os.path.dirname(__file__), "soak_100k.py")
    )
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)

    import jax
    import jax.numpy as jnp
    from tpuva.graph.pipeline import init_carry, process_batch_staged, \
        process_batch
    from tpuva.graph.streaming import AsyncRowDrainer
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    H, W, N = 1080, 1920, 128
    BATCHES = int(os.environ.get("PROBE_BATCHES", "80"))
    cfg = soak.build_cfg(N)
    render = soak.make_render_jax(H, W, N)
    staged = jax.default_backend() == "tpu"
    step = process_batch_staged if staged else process_batch

    def sync(x):
        np.asarray(x.ravel()[:1])

    def warm():
        carry = init_carry(cfg, H, W)
        f = render(jnp.int32(0))
        carry, out = step(cfg, carry, f)
        sync(out["rows"])
        return carry

    def run_none():
        carry = warm()
        t0 = time.perf_counter()
        for b in range(BATCHES):
            f = render(jnp.int32(b * N))
            carry, out = step(cfg, carry, f)
        sync(out["rows"])
        return time.perf_counter() - t0

    def run_sync(group):
        carry = warm()
        pend = []
        t0 = time.perf_counter()
        for b in range(BATCHES):
            f = render(jnp.int32(b * N))
            carry, out = step(cfg, carry, f)
            pend.append(out["rows"])
            if len(pend) >= group:
                np.asarray(jnp.stack(pend))
                pend = []
        if pend:
            np.asarray(jnp.stack(pend))
        sync(out["rows"])
        return time.perf_counter() - t0

    def run_async(group, in_flight=1):
        carry = warm()
        rows = []
        dr = AsyncRowDrainer(lambda rec, n: rows.append(n), group=group,
                             max_groups_in_flight=in_flight)
        t0 = time.perf_counter()
        try:
            for b in range(BATCHES):
                f = render(jnp.int32(b * N))
                carry, out = step(cfg, carry, f)
                dr.submit(out)
            dr.close()
        except BaseException:
            dr.kill()
            raise
        sync(out["rows"])
        dt = time.perf_counter() - t0
        return dt, dict(dr.stats)

    res = {}
    dt = run_none()
    res["none"] = round(BATCHES * N / dt, 1)
    dt = run_sync(64)
    res["sync64"] = round(BATCHES * N / dt, 1)
    dt, st4 = run_async(4)
    res["async4"] = round(BATCHES * N / dt, 1)
    dt, st16 = run_async(16)
    res["async16"] = round(BATCHES * N / dt, 1)
    # round-5 fetch-gap probe (VERDICT r4 next #6): deeper in-flight
    # window — does letting the producer run 2 groups ahead of the
    # fetch close the streamed/device gap, or does the tunnel pin it?
    dt, st4b = run_async(4, in_flight=2)
    res["async4x2"] = round(BATCHES * N / dt, 1)
    dt, st8b = run_async(8, in_flight=2)
    res["async8x2"] = round(BATCHES * N / dt, 1)
    dt, _st32 = run_async(32)
    res["async32"] = round(BATCHES * N / dt, 1)
    dt, _st16b = run_async(16)
    res["async16_rep"] = round(BATCHES * N / dt, 1)
    print("fps:", res)
    print("async4 stats:", {k: round(v, 2) for k, v in st4.items()})
    print("async16 stats:", {k: round(v, 2) for k, v in st16.items()})
    print("async4x2 stats:", {k: round(v, 2) for k, v in st4b.items()})
    print("async8x2 stats:", {k: round(v, 2) for k, v in st8b.items()})


if __name__ == "__main__":
    main()
