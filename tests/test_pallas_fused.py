"""Pallas fused front-end vs the jnp path (interpret mode on CPU):
bit-identical masks, rows, and carry (SURVEY.md §7.1 step 8 "keep jnp
fallback behind a flag")."""

import numpy as np

from refimpl.synthetic import moving_disk_clip, multi_blob_clip
from tpuva.graph.config import (
    BackgroundConfig,
    BlurConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.pipeline import process_clip


def test_fused_matches_jnp_path_end_to_end():
    clip, _, plate = moving_disk_clip(
        h=100, w=140, frames=24, radius=8, noise_sigma=3.0, seed=3
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        morph_close=MorphConfig(ksize=3, shape="ellipse"),
        segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    r_jnp, c_jnp, m_jnp = process_clip(
        clip, cfg, background0=plate, return_masks=True
    )
    r_pls, c_pls, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp
    np.testing.assert_array_equal(
        np.asarray(c_pls.bg), np.asarray(c_jnp.bg)
    )


def test_fused_first_frame_bg_init():
    clip, _, _ = moving_disk_clip(h=64, w=96, frames=16, radius=6, seed=4)
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.1),
        blur=BlurConfig(ksize=3, sigma=0.0),
        segment=SegmentConfig(threshold=30.0, min_area=10, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=3, max_tracks=8),
        batch=8,
    )
    r_jnp, _, m_jnp = process_clip(clip, cfg, return_masks=True)
    r_pls, _, m_pls = process_clip(
        clip, cfg, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp


def test_fused_no_blur_no_morph():
    clip, _, _, plate = multi_blob_clip(
        h=80, w=120, frames=12, n_blobs=3, radius=7, births_deaths=False
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.0),
        segment=SegmentConfig(threshold=40.0, min_area=15, max_blobs=8),
        track=TrackConfig(max_dist=40.0, death_patience=3, max_tracks=16),
        batch=6,
    )
    r_jnp, _, m_jnp = process_clip(clip, cfg, background0=plate, return_masks=True)
    r_pls, _, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp


def test_staged_path_matches_process_batch():
    """process_batch_staged (the TPU production path: fused kernel + tiled
    CCL + sparse-strip stats) must match the single-jit jnp path — run in
    interpret mode on CPU so CI covers it."""
    import jax.numpy as jnp

    from tpuva.graph.pipeline import (
        collect_rows,
        init_carry,
        process_batch,
        process_batch_staged,
    )

    clip, _, plate = moving_disk_clip(
        h=96, w=144, frames=16, radius=8, noise_sigma=2.0, seed=8
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    c1 = init_carry(cfg, 96, 144, plate)
    c2 = init_carry(cfg, 96, 144, plate)
    rows1, rows2 = [], []
    for s in range(0, 16, 8):
        b = jnp.asarray(clip[s : s + 8])
        c1, o1 = process_batch(cfg, c1, b)
        c2, o2 = process_batch_staged(cfg, c2, b)
        rows1.extend(collect_rows(o1["rows"], o1["row_valid"],
                                  row_sums=o1["row_sums"]))
        rows2.extend(collect_rows(o2["rows"], o2["row_valid"],
                                  row_sums=o2["row_sums"]))
        assert int(np.asarray(o2["stats_overflow"]).max()) == 0
    assert rows1 == rows2
    np.testing.assert_array_equal(np.asarray(c1.bg), np.asarray(c2.bg))


def test_fused_with_median():
    """Fused median (k=3, BORDER_REPLICATE via clamped reads) bit-matches
    the jnp path, including image borders."""
    from tpuva.graph.config import MedianConfig

    clip, _, plate = moving_disk_clip(
        h=72, w=104, frames=16, radius=7, noise_sigma=6.0, seed=11
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=3, sigma=0.0),
        median=MedianConfig(ksize=3),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=30.0, min_area=15, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    r_jnp, c_jnp, m_jnp = process_clip(
        clip, cfg, background0=plate, return_masks=True
    )
    r_pls, c_pls, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp
    np.testing.assert_array_equal(np.asarray(c_pls.bg), np.asarray(c_jnp.bg))
