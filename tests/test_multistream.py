"""Config 5 (BASELINE.json:11): multi-stream data parallelism on the
simulated 8-device CPU mesh (SURVEY.md §4.2), plus vmap/shard_map
equivalence and merge determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from refimpl.synthetic import moving_disk_clip
from tpuva.graph.config import (
    BackgroundConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.pipeline import collect_rows, process_clip
from tpuva.dist import (
    init_multistream_carry,
    make_multistream_processor,
    make_stream_mesh,
    merge_stream_rows,
)

CFG = PipelineConfig(
    background=BackgroundConfig(alpha=0.02),
    segment=SegmentConfig(threshold=40.0, min_area=20, max_blobs=4),
    track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
    batch=8,
)


def make_streams(S=8, T=16, h=64, w=96):
    clips, plates = [], []
    for s in range(S):
        clip, _, plate = moving_disk_clip(h=h, w=w, frames=T, radius=6, seed=s)
        clips.append(clip)
        plates.append(plate)
    return np.stack(clips), np.stack(plates)


def run_multistream(fn, cfg, clips, plates):
    S, T, H, W = clips.shape
    carry = init_multistream_carry(cfg, H, W, S, background0=plates)
    rows_by_stream = [[] for _ in range(S)]
    N = cfg.batch
    for start in range(0, T, N):
        chunk = jnp.asarray(clips[:, start : start + N])
        carry, out = fn(carry, chunk)
        for s in range(S):
            rows_by_stream[s].extend(
                collect_rows(
                    out["rows"][s], out["row_valid"][s],
                    row_sums=out["row_sums"][s],
                )
            )
    return rows_by_stream


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8, jax.devices()


def test_shard_map_matches_vmap_and_single_stream():
    clips, plates = make_streams()
    S, T, H, W = clips.shape
    mesh = make_stream_mesh(S)
    fn_mesh = make_multistream_processor(CFG, S, mesh=mesh)
    fn_vmap = make_multistream_processor(CFG, S, mesh=None)
    rows_mesh = run_multistream(fn_mesh, CFG, clips, plates)
    rows_vmap = run_multistream(fn_vmap, CFG, clips, plates)
    assert rows_mesh == rows_vmap
    # per-stream result equals running that stream through the single-chip
    # pipeline driver
    for s in range(S):
        solo, _, _ = process_clip(clips[s], CFG, background0=plates[s])
        assert rows_mesh[s] == solo, f"stream {s}"


def test_merge_deterministic_and_unique_ids():
    clips, plates = make_streams(S=4)
    mesh = make_stream_mesh(4)
    fn = make_multistream_processor(CFG, 4, mesh=mesh)
    rows_by_stream = run_multistream(fn, CFG, clips, plates)
    merged = merge_stream_rows(rows_by_stream)
    merged2 = merge_stream_rows(rows_by_stream)
    assert merged == merged2
    # ids unique across streams: each (tid) maps to rows of exactly one
    # stream's trajectory
    total = sum(len(r) for r in rows_by_stream)
    assert len(merged) == total
