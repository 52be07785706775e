"""Application layer: parameters, track containers, multi-pass project
(reference: companion-project passes, SURVEY.md §2.1)."""

import json
import os

import numpy as np

from refimpl.synthetic import moving_disk_clip, multi_blob_clip
from tpuva.app import Parameters, Track, TrackCollection, TrackingProject
from tpuva.graph.config import (
    BackgroundConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.io import VideoMemory


def test_parameters_overrides():
    p = Parameters({"a": {"b": 1, "c": 2}, "d": 3})
    assert p["a.b"] == 1 and p["d"] == 3
    q = p.with_overrides({"a": {"b": 10}})
    assert q["a.b"] == 10 and q["a.c"] == 2 and p["a.b"] == 1
    q["a.e.f"] = 7
    assert q["a.e.f"] == 7
    assert "a.c" in q and "zz" not in q
    r = Parameters.from_json(q.to_json())
    assert r["a.e.f"] == 7


def test_track_stats_and_interpolation():
    frames = np.array([0, 1, 2, 5])
    pos = np.array([[0, 0], [3, 4], [6, 8], [6, 8]], float)
    t = Track(1, frames, pos, np.array([10.0, 12, 11, 10]))
    assert t.duration == 6 and len(t) == 4
    assert abs(t.path_length() - 10.0) < 1e-9
    assert abs(t.displacement() - 10.0) < 1e-9
    ti = t.interpolated()
    assert len(ti) == 6
    np.testing.assert_allclose(ti.position_at(3), t.position_at(3))


def test_track_collection_stitch():
    rows = (
        [(1, t, 10.0 + t, 20.0, 30) for t in range(10)]
        # same object re-detected after a 4-frame gap, new id
        + [(2, t, 10.0 + t, 20.5, 30) for t in range(14, 25)]
        # far-away other object
        + [(3, t, 200.0, 200.0, 40) for t in range(12, 20)]
    )
    tc = TrackCollection.from_rows(rows)
    assert len(tc) == 3
    st = tc.stitch(max_gap=10, max_dist=10.0)
    assert len(st) == 2
    merged = st.by_id(1)
    assert merged.start == 0 and merged.end == 24
    assert st.by_id(3).start == 12


def test_tracking_project_end_to_end(tmp_path):
    clip, alive, truth, plate = multi_blob_clip(
        h=120, w=160, frames=40, n_blobs=2, radius=8, births_deaths=False
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.0),
        segment=SegmentConfig(threshold=40.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=40.0, death_patience=3, max_tracks=8),
        batch=8,
    )
    proj = TrackingProject(
        str(tmp_path / "out"), cfg, overrides={"pass4": {"enabled": True}}
    )
    report = proj.run(VideoMemory(clip), background0=plate)
    assert report["n_tracks"] == 2
    assert os.path.exists(proj.path("pass1_tracks.h5"))
    assert os.path.exists(proj.path("pass2_tracks.h5"))
    assert os.path.exists(proj.path("report.json"))
    assert os.path.exists(proj.path("pass2_tracks.csv"))
    assert os.path.exists(proj.path("debug.avi"))
    with open(proj.path("report.json")) as fh:
        r2 = json.load(fh)
    assert r2["n_tracks"] == 2
    # pass-boundary restartability: rerunning pass1 with resume loads the
    # HDF5 instead of recomputing
    t1 = proj.pass1(VideoMemory(clip), background0=plate, resume=True)
    assert len(t1) >= 2
