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
