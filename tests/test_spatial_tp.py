"""Spatial tensor parallelism (SURVEY.md §2.4 TP): a single stream tiled
into row bands across the simulated CPU mesh, halo exchange via ppermute —
results must be bit-identical to the single-chip pipeline."""

import numpy as np
import jax.numpy as jnp

from refimpl.synthetic import moving_disk_clip
from tpuva.dist.spatial import make_space_mesh, make_spatial_processor
from tpuva.graph.config import (
    BackgroundConfig,
    BlurConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.pipeline import collect_rows, init_carry, process_batch

CFG = PipelineConfig(
    background=BackgroundConfig(alpha=0.05),
    blur=BlurConfig(ksize=5, sigma=0.0),
    morph_open=MorphConfig(ksize=3, shape="rect"),
    morph_close=MorphConfig(ksize=3, shape="ellipse"),
    segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
    track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
    batch=8,
)


def test_spatial_matches_single_chip():
    H, W, T = 128, 160, 24
    clip, _, plate = moving_disk_clip(
        h=H, w=W, frames=T, radius=9, noise_sigma=3.0, seed=6
    )
    n_chips = 4
    mesh = make_space_mesh(n_chips)
    fn = make_spatial_processor(CFG, H, W, n_chips, mesh=mesh)

    carry_sp = init_carry(CFG, H, W, plate)
    carry_1 = init_carry(CFG, H, W, plate)
    rows_sp, rows_1 = [], []
    for s in range(0, T, CFG.batch):
        chunk = jnp.asarray(clip[s : s + CFG.batch])
        carry_sp, out_sp = fn(carry_sp, chunk)
        carry_1, out_1 = process_batch(CFG, carry_1, chunk)
        rows_sp.extend(
            collect_rows(out_sp["rows"], out_sp["row_valid"],
                         row_sums=out_sp["row_sums"])
        )
        rows_1.extend(
            collect_rows(out_1["rows"], out_1["row_valid"],
                         row_sums=out_1["row_sums"])
        )
    assert rows_sp == rows_1
    np.testing.assert_array_equal(
        np.asarray(carry_sp.bg), np.asarray(carry_1.bg)
    )
    assert int(carry_sp.track.next_id) == int(carry_1.track.next_id)


def test_spatial_band_parallel_tail_adversarial():
    """Components spanning 2-4 bands, multiple disconnected pieces of one
    component inside a band, dense noise — rows and sums bit-equal to the
    single-chip pipeline (VERDICT r1 weak #3: the tail must be
    band-parallel, not replicated)."""
    H, W, T = 96, 128, 8
    rng = np.random.default_rng(20)
    clip = np.zeros((T, H, W), np.uint8)
    # U-shape: one component with two disconnected pieces in middle bands
    clip[:, 10:80, 20:24] = 200
    clip[:, 10:80, 40:44] = 200
    clip[:, 10:14, 20:44] = 200
    # tall skinny component through all 4 bands
    clip[:, 0:96, 100:102] = 200
    # speckle noise
    noise = (rng.random((T, H, W)) > 0.995).astype(np.uint8) * 200
    clip = np.maximum(clip, noise)
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.0),
        segment=SegmentConfig(threshold=40.0, min_area=2, max_blobs=8),
        track=TrackConfig(max_dist=80.0, death_patience=3, max_tracks=16),
        batch=4,
    )
    plate = np.zeros((H, W), np.float32)
    mesh = make_space_mesh(4)
    fn = make_spatial_processor(cfg, H, W, 4, mesh=mesh, max_components=32)
    c_sp = init_carry(cfg, H, W, plate)
    c_1 = init_carry(cfg, H, W, plate)
    for s in range(0, T, cfg.batch):
        chunk = jnp.asarray(clip[s : s + cfg.batch])
        c_sp, out_sp = fn(c_sp, chunk)
        c_1, out_1 = process_batch(cfg, c_1, chunk, max_components=32)
        np.testing.assert_array_equal(
            np.asarray(out_sp["rows"]), np.asarray(out_1["rows"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_sp["row_sums"]), np.asarray(out_1["row_sums"])
        )
        assert int(np.asarray(out_sp["stats_overflow"]).max()) == 0
        # band-spanning components force >1 reconciliation round; the
        # counter surfaces it (SURVEY §5.5 observability)
        assert int(np.asarray(out_sp["tp_recon_rounds"])) > 1


def test_spatial_otsu_matches_single_chip():
    """Otsu in spatial-TP mode: each band histograms its interior rows
    and a psum over ('space',) assembles the exact global per-frame
    histogram — the resulting mask, rows, and carried background must be
    bit-identical to the single-chip jnp Otsu path."""
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold="otsu", min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    H, W, T = 128, 160, 16
    clip, _, plate = moving_disk_clip(
        h=H, w=W, frames=T, radius=9, noise_sigma=3.0, seed=13
    )
    n_chips = 4
    fn = make_spatial_processor(cfg, H, W, n_chips,
                                mesh=make_space_mesh(n_chips))
    carry_sp = init_carry(cfg, H, W, plate)
    carry_1 = init_carry(cfg, H, W, plate)
    rows_sp, rows_1 = [], []
    for s in range(0, T, cfg.batch):
        chunk = jnp.asarray(clip[s : s + cfg.batch])
        carry_sp, out_sp = fn(carry_sp, chunk)
        carry_1, out_1 = process_batch(cfg, carry_1, chunk)
        rows_sp.extend(
            collect_rows(out_sp["rows"], out_sp["row_valid"],
                         row_sums=out_sp["row_sums"])
        )
        rows_1.extend(
            collect_rows(out_1["rows"], out_1["row_valid"],
                         row_sums=out_1["row_sums"])
        )
    assert rows_sp == rows_1
    assert rows_sp, "otsu scene produced no detections — test is vacuous"
    np.testing.assert_array_equal(
        np.asarray(carry_sp.bg), np.asarray(carry_1.bg)
    )
