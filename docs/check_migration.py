#!/usr/bin/env python
"""Execute every code snippet in docs/MIGRATION.md against the real API.

Keeps the migration guide honest: run after any public-API change
(CPU backend; a few seconds). Exit 0 = every snippet ran.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> int:
    from refimpl.synthetic import moving_disk_clip

    clip, truth, plate = moving_disk_clip(
        h=96, w=128, frames=24, radius=8, noise_sigma=3.0, seed=3
    )
    H, W = clip.shape[1:]
    first_frame_float = plate

    # --- iterating a filtered video -----------------------------------
    from tpuva.io import VideoMemory
    from tpuva.filters import FilterBlur, FilterCrop

    video = VideoMemory(clip)
    filtered = FilterBlur(FilterCrop(video, "upper left"), 3)
    n = sum(1 for _ in filtered)
    assert n == len(clip)
    frame_7 = filtered.get_frame(7)
    assert frame_7.shape == (H // 2, W // 2)
    tail = filtered[10:]
    assert tail.frame_count == len(clip) - 10
    batches = list(filtered.iter_batches(8))
    assert batches[0][1].shape[0] == 8 or batches[0].shape[0] == 8

    # --- segmentation + tracking --------------------------------------
    from tpuva.graph.config import (
        PipelineConfig,
        BackgroundConfig,
        BlurConfig,
        MorphConfig,
        SegmentConfig,
        TrackConfig,
    )
    from tpuva.graph.pipeline import process_clip

    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.02),
        blur=BlurConfig(ksize=5),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=40.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5,
                          assigner="hungarian"),
        batch=8,
    )
    rows, carry, _ = process_clip(clip, cfg, background0=first_frame_float)
    assert rows, "no detections"

    otsu_cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.02),
        segment=SegmentConfig(threshold="otsu", min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5),
        batch=8,
    )
    orows, _, _ = process_clip(clip, otsu_cfg, background0=first_frame_float)
    assert orows

    with tempfile.TemporaryDirectory() as d:
        # --- export ----------------------------------------------------
        from tpuva.export import (
            write_tracks_csv,
            write_tracks_hdf5,
            read_tracks_csv,
            read_tracks_hdf5,
        )

        path_csv = os.path.join(d, "t.csv")
        path_h5 = os.path.join(d, "t.h5")
        write_tracks_csv(path_csv, rows)
        write_tracks_hdf5(path_h5, rows)
        assert len(read_tracks_csv(path_csv)) == len(rows)
        assert len(read_tracks_hdf5(path_h5)) == len(rows)

        # --- streaming with checkpoints + row log ----------------------
        from tpuva.graph.streaming import StreamingPipeline

        sp = StreamingPipeline(
            cfg,
            checkpoint_path=os.path.join(d, "state.npz"),
            checkpoint_every=50,
            row_log_path=os.path.join(d, "rows.bin"),
        )
        srows = sp.run(VideoMemory(clip), background0=plate)
        assert len(srows) == len(rows)

        # --- multi-stream ----------------------------------------------
        from tpuva.dist import MultiStreamPipeline

        S = 2
        videos = [VideoMemory(clip) for _ in range(S)]
        plates = np.stack([plate] * S)
        msp = MultiStreamPipeline(cfg, S)
        rows_by_stream, merged = msp.run(
            videos, background0=plates, export_dir=os.path.join(d, "out")
        )
        assert len(rows_by_stream) == S and merged

        # --- debug movie ------------------------------------------------
        from tpuva.compose import VideoComposer, annotate_tracks

        comp = VideoComposer(
            os.path.join(d, "debug.avi"), size=(W, H), fps=25.0
        )
        annotate_tracks(comp, clip, rows)
        comp.close()
        assert os.path.getsize(os.path.join(d, "debug.avi")) > 0

        # --- multi-pass project ----------------------------------------
        from tpuva.app import TrackingProject

        proj = TrackingProject(
            os.path.join(d, "proj"), cfg,
            overrides={"tracks/min_length": 5},
        )
        results = proj.run(VideoMemory(clip), background0=plate)
        assert results

    # --- spatial TP factory import (mesh needs >=2 devices; the full
    # run is covered by tests/test_spatial_tp.py) ----------------------
    from tpuva.dist.spatial import make_spatial_processor  # noqa: F401

    print("MIGRATION.md snippets: all OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
