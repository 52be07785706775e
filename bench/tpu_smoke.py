#!/usr/bin/env python
"""Real-TPU smoke of every pipeline config family (dev tool).

Interpret mode (CPU tests) can accept constructs Mosaic rejects — this
drives each config shape end-to-end ON THE CHIP against the refimpl
oracle at small-but-real sizes:

  1. config-1: 640x480, threshold-only, greedy
  2. config-2: 720p, blur + median(3) + morph open/close (fused median
     kernel's first real-TPU exercise) — hungarian
  3. Otsu threshold (the non-fusable XLA path on TPU)
  4. 1080p padded-handoff shape (same as bench, tiny frame count)

Prints PASS/FAIL per config with max centroid error vs refimpl.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_case(name, h, w, frames, cfg, n_blobs=3):
    from refimpl.pipeline import run_pipeline
    from refimpl.synthetic import multi_blob_clip
    from tpuva.graph.pipeline import process_clip

    clip, _, _, plate = multi_blob_clip(
        h=h, w=w, frames=frames, n_blobs=n_blobs, radius=12,
        births_deaths=False, noise_sigma=2.0,
    )
    ref = run_pipeline(clip, cfg, background0=plate)
    rows, _, _ = process_clip(clip, cfg, background0=plate, use_pallas=True)
    key = lambda r: (int(r[0]), int(r[1]))
    rr = {key(r): r for r in ref.rows}
    gr = {key(r): r for r in rows}
    # cv2's fixed-point uint8 blur differs from float by <= 3 LSB (SURVEY
    # §8), which can flip a blob's area across min_area on knife-edge
    # frames — a row present on exactly one side is within contract iff
    # its area sits at that knife edge.
    knife = 0
    for k in set(rr) ^ set(gr):
        r = rr.get(k) or gr.get(k)
        if abs(float(r[4]) - cfg.segment.min_area) <= 2:
            knife += 1
        else:
            print(f"{name}: FAIL unmatched non-knife-edge row {r}")
            return False
    err = 0.0
    for k in set(rr) & set(gr):
        a, b = rr[k], gr[k]
        err = max(err, abs(a[2] - b[2]), abs(a[3] - b[3]))
    ok = err <= 1.0
    print(f"{name}: {'PASS' if ok else 'FAIL'} rows={len(gr)} "
          f"max_centroid_err={err:.4f}px knife_edge_rows={knife}")
    return ok


def main():
    from tpuva.graph.config import (
        BackgroundConfig, BlurConfig, MedianConfig, MorphConfig,
        PipelineConfig, SegmentConfig, TrackConfig,
    )
    from tpuva.utils import enable_compilation_cache

    enable_compilation_cache()
    track_g = TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8)
    track_h = TrackConfig(
        max_dist=60.0, death_patience=5, max_tracks=8, assigner="hungarian"
    )
    cases = [
        ("config1 640x480 thresh-greedy", 480, 640, 24, PipelineConfig(
            background=BackgroundConfig(alpha=0.05),
            segment=SegmentConfig(threshold=40.0, min_area=30, max_blobs=4),
            track=track_g, batch=8)),
        ("config2 720p blur+median+morph hung", 720, 1280, 16, PipelineConfig(
            background=BackgroundConfig(alpha=0.05),
            blur=BlurConfig(ksize=5, sigma=0.0),
            median=MedianConfig(ksize=3),
            morph_open=MorphConfig(ksize=3, shape="rect"),
            morph_close=MorphConfig(ksize=3, shape="ellipse"),
            segment=SegmentConfig(threshold=35.0, min_area=40, max_blobs=4),
            track=track_h, batch=8)),
        ("otsu 480p (staged diff-emit + MXU histogram)", 480, 640, 16, PipelineConfig(
            background=BackgroundConfig(alpha=0.05),
            blur=BlurConfig(ksize=5, sigma=0.0),
            segment=SegmentConfig(
                threshold="otsu", min_area=30, max_blobs=4),
            track=track_g, batch=8)),
        ("1080p padded handoff", 1080, 1920, 12, PipelineConfig(
            background=BackgroundConfig(alpha=0.02),
            blur=BlurConfig(ksize=5, sigma=0.0),
            morph_open=MorphConfig(ksize=3, shape="rect"),
            segment=SegmentConfig(threshold=35.0, min_area=50, max_blobs=8),
            track=track_h, batch=4)),
    ]
    if "--4k" in sys.argv:
        # big-frame capability: 4K UHD through the staged path (measured
        # 2026-08-17: 231 ms/batch-of-32 = 138 fps/chip, overflow 0,
        # converged; centroids within 0.03 px of refimpl, areas within
        # the blur float-associativity contract). First compile is slow
        # (~5 min cold cache) — opt-in flag.
        cases.append(
            ("4K UHD staged", 2160, 3840, 8, PipelineConfig(
                background=BackgroundConfig(alpha=0.02),
                blur=BlurConfig(ksize=5, sigma=0.0),
                morph_open=MorphConfig(ksize=3, shape="rect"),
                segment=SegmentConfig(
                    threshold=35.0, min_area=50, max_blobs=8),
                track=track_h, batch=4))
        )
    ok = True
    for name, h, w, frames, cfg in cases:
        ok &= run_case(name, h, w, frames, cfg)
    ok &= run_multistream_singlechip()
    print("SMOKE", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def run_multistream_singlechip():
    """Config-5 single-chip mode on the real chip: with use_pallas
    auto-on for TPU backends, make_multistream_processor(mesh=None)
    takes the lax.map-over-streams Pallas branch (vmap over a
    pallas_call fails Mosaic); compare it against the vmap'd jnp path —
    must be bit-identical."""
    import jax.numpy as jnp

    from refimpl.synthetic import moving_disk_clip
    from tpuva.graph.config import (
        BackgroundConfig, PipelineConfig, SegmentConfig, TrackConfig,
    )
    from tpuva.graph.pipeline import collect_rows
    from tpuva.dist import init_multistream_carry, make_multistream_processor

    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.02),
        segment=SegmentConfig(threshold=40.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    S, T, H, W = 4, 8, 128, 256
    clips, plates = [], []
    for s in range(S):
        clip, _, plate = moving_disk_clip(
            h=H, w=W, frames=T, radius=8, seed=s
        )
        clips.append(clip)
        plates.append(plate)
    clips = np.stack(clips)
    plates = np.stack(plates)

    def run(use_pallas):
        fn = make_multistream_processor(
            cfg, S, mesh=None, use_pallas=use_pallas
        )
        carry = init_multistream_carry(cfg, H, W, S, background0=plates)
        carry, out = fn(carry, jnp.asarray(clips))
        return [
            collect_rows(out["rows"][s], out["row_valid"][s],
                         row_sums=out["row_sums"][s])
            for s in range(S)
        ]

    rj = run(False)
    rp = run(True)
    ok = rj == rp
    nrows = sum(len(r) for r in rp)
    print(f"multistream vmap (pallas vs jnp): "
          f"{'PASS' if ok else 'FAIL'} rows={nrows}")
    return ok


if __name__ == "__main__":
    sys.exit(main())
