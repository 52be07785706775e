"""Config-4 semantics on the ('space',) mesh (SURVEY.md §2.4 TP + §5.4):
the streamed spatial-TP driver must reproduce the single-chip
StreamingPipeline exactly — same rows, same checkpoints, same resume
byte-identity — with the work banded across the simulated CPU mesh."""

import numpy as np
import pytest

from refimpl.synthetic import moving_disk_clip
from tpuva.dist.pipeline import SpatialStreamPipeline
from tpuva.graph.config import (
    BackgroundConfig,
    BlurConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.streaming import StreamingPipeline, load_checkpoint
from tpuva.io import VideoMemory

CFG = PipelineConfig(
    background=BackgroundConfig(alpha=0.05),
    blur=BlurConfig(ksize=5, sigma=0.0),
    morph_open=MorphConfig(ksize=3, shape="rect"),
    segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
    track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
    batch=8,
)
N_CHIPS = 4


def clip_and_plate(frames=48):
    clip, _, plate = moving_disk_clip(
        h=96, w=128, frames=frames, radius=8, noise_sigma=3.0, seed=13
    )
    return clip, plate


def test_spatial_stream_matches_single_chip():
    """Full streamed run over the mesh == single-chip streamed run, row
    for row (the device fn is bit-identical; the driver must not perturb
    that)."""
    clip, plate = clip_and_plate()
    ref = StreamingPipeline(CFG, parallel_bg=False).run(
        VideoMemory(clip), background0=plate
    )
    sp = SpatialStreamPipeline(CFG, N_CHIPS)
    rows = sp.run(VideoMemory(clip), background0=plate)
    assert rows == ref


def test_spatial_stream_checkpoint_resume_equivalence(tmp_path):
    """Interrupt mid-stream on the mesh; resume must produce the
    identical trajectory set as one uninterrupted mesh run — and the
    checkpoint itself must hold the full gathered carry (single-chip
    interoperable)."""
    clip, plate = clip_and_plate(frames=48)
    ckpt = str(tmp_path / "state.npz")

    full = SpatialStreamPipeline(CFG, N_CHIPS).run(
        VideoMemory(clip), background0=plate
    )

    # phase 1: first half only (job dies after its final checkpoint)
    sp = SpatialStreamPipeline(
        CFG, N_CHIPS, checkpoint_path=ckpt, checkpoint_every=10**9
    )
    sp.run(VideoMemory(clip[:24]), background0=plate)
    carry, _rows_half = load_checkpoint(ckpt, CFG)
    assert int(carry.frame_idx) == 24
    assert carry.bg.shape == (96, 128)  # gathered, not a band

    # phase 2: resume against the full video on the mesh
    sp2 = SpatialStreamPipeline(
        CFG, N_CHIPS, checkpoint_path=ckpt, checkpoint_every=10**9
    )
    rows = sp2.run(VideoMemory(clip), background0=plate, resume=True)
    assert rows == full


def test_spatial_stream_checkpoint_interoperates_with_single_chip(tmp_path):
    """A checkpoint written by the mesh driver resumes on the single-chip
    driver (and the combined rows match an uninterrupted single-chip
    run) — the snapshot format is the same gathered carry."""
    clip, plate = clip_and_plate(frames=48)
    ckpt = str(tmp_path / "state.npz")
    full = StreamingPipeline(CFG, parallel_bg=False).run(
        VideoMemory(clip), background0=plate
    )
    SpatialStreamPipeline(
        CFG, N_CHIPS, checkpoint_path=ckpt, checkpoint_every=10**9
    ).run(VideoMemory(clip[:24]), background0=plate)
    rows = StreamingPipeline(
        CFG, checkpoint_path=ckpt, checkpoint_every=10**9, parallel_bg=False
    ).run(VideoMemory(clip), background0=plate, resume=True)
    assert rows == full


def test_spatial_stream_row_log_resume(tmp_path):
    """Append-only RowLog mode on the mesh: kill after a mid-run
    checkpoint, resume truncates the log, final row array identical to
    the uninterrupted mesh run."""
    clip, plate = clip_and_plate(frames=48)
    full = SpatialStreamPipeline(CFG, N_CHIPS).run(
        VideoMemory(clip), background0=plate
    )
    ckpt = str(tmp_path / "state.npz")
    rlogp = str(tmp_path / "rows.bin")
    SpatialStreamPipeline(
        CFG, N_CHIPS, checkpoint_path=ckpt, checkpoint_every=2,
        row_log_path=rlogp,
    ).run(VideoMemory(clip[:24]), background0=plate)
    arr = SpatialStreamPipeline(
        CFG, N_CHIPS, checkpoint_path=ckpt, checkpoint_every=2,
        row_log_path=rlogp,
    ).run(VideoMemory(clip), background0=plate, resume=True)
    assert isinstance(arr, np.ndarray) and arr.shape[1] == 5
    assert [
        (int(r[0]), int(r[1]), float(r[2]), float(r[3]), float(r[4]))
        for r in arr
    ] == full


def test_spatial_stream_strict_overflow_raises():
    """The spatial driver's capacity contract: more component PIECES in
    one band than the contraction table holds must raise in strict mode
    (mentioning the max_components knob), not silently drop stats."""
    clip, plate = clip_and_plate(frames=8)
    # salt the clip with many specks so each band holds > max_components
    rng = np.random.default_rng(5)
    clip = clip.copy()
    for t in range(8):
        ys = rng.integers(0, 96, 60)
        xs = rng.integers(0, 128, 60)
        for y, x in zip(ys, xs):
            clip[t, y : y + 2, x : x + 2] = 255
    cfg_noblur = PipelineConfig(
        background=BackgroundConfig(alpha=0.0),
        segment=SegmentConfig(threshold=35.0, min_area=1, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    sp = SpatialStreamPipeline(cfg_noblur, N_CHIPS, max_components=4)
    with pytest.raises(RuntimeError, match="max_components"):
        sp.run(VideoMemory(clip), background0=plate)
    # non-strict mode: warns and counts instead
    sp2 = SpatialStreamPipeline(
        cfg_noblur, N_CHIPS, max_components=4, strict=False
    )
    with pytest.warns(UserWarning, match="piece-table overflow"):
        sp2.run(VideoMemory(clip), background0=plate)
    assert sp2.overflow_frames > 0


def test_spatial_stream_rejects_bad_geometry():
    """H not divisible by the mesh, or a halo bigger than one band, must
    fail loudly at the first step — not silently mis-band."""
    clip, plate = clip_and_plate(frames=8)
    sp = SpatialStreamPipeline(CFG, 5)  # 96 % 5 != 0
    with pytest.raises(ValueError, match="divisible"):
        sp.run(VideoMemory(clip), background0=plate)
