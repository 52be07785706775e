#!/usr/bin/env python
"""End-to-end example: track moving objects in a video and produce
trajectories, a statistics report, and an annotated debug movie.

    python examples/track_video.py input.mp4 out_dir/
    python examples/track_video.py --demo out_dir/   # synthetic demo clip

Mirrors the reference workflow (open video -> filter chain -> multi-pass
tracking -> HDF5/CSV/report/debug movie) with the compute running on TPU
when one is available.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuva.app import TrackingProject
from tpuva.graph.config import (
    BackgroundConfig,
    BlurConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.io import VideoMemory, load_any_video


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("video", nargs="?", help="video file / glob / image dir")
    ap.add_argument("out_dir")
    ap.add_argument("--demo", action="store_true", help="use a synthetic clip")
    ap.add_argument("--threshold", type=float, default=30.0)
    ap.add_argument("--min-area", type=int, default=50)
    ap.add_argument("--alpha", type=float, default=0.02)
    ap.add_argument("--pallas", action="store_true",
                    help="use the fused TPU kernels")
    ap.add_argument("--movie", action="store_true",
                    help="write an annotated debug movie")
    args = ap.parse_args()

    if args.demo:
        from refimpl.synthetic import multi_blob_clip

        clip, _, _, _ = multi_blob_clip(
            h=480, w=640, frames=200, n_blobs=4, radius=12
        )
        video = VideoMemory(clip, fps=25.0)
    elif args.video:
        video = load_any_video(args.video, gray=True)
    else:
        ap.error("give a video path or --demo")

    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=args.alpha),
        blur=BlurConfig(ksize=5),
        morph_open=MorphConfig(ksize=3),
        segment=SegmentConfig(
            threshold=args.threshold, min_area=args.min_area, max_blobs=8
        ),
        track=TrackConfig(max_dist=80.0, death_patience=5,
                          assigner="hungarian"),
        batch=32,
    )
    proj = TrackingProject(
        args.out_dir,
        cfg,
        overrides={
            "pipeline": {"use_pallas": args.pallas},
            "pass4": {"enabled": args.movie},
        },
    )
    report = proj.run(video)
    print(json.dumps(
        {"n_tracks": report["n_tracks"],
         "total_points": report["total_points"],
         "out_dir": args.out_dir},
        indent=2,
    ))
    return 0


if __name__ == "__main__":
    sys.exit(main())
