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


def _track(tid, t0, points):
    """Track with frames t0..t0+len-1 and given (x, y) points."""
    pts = np.asarray(points, float)
    return (
        [(tid, t0 + i, float(x), float(y), 30.0) for i, (x, y) in enumerate(pts)]
    )


def test_stitch_conflict_picks_cheapest():
    """Two open tracks both end within max_dist of B's start: the closer
    one wins, regardless of list/id order (adversarial: the cheaper
    candidate has the HIGHER id, so a first/last-scanned-wins bug loses)."""
    rows = (
        _track(1, 0, [(0, 0)] * 5)         # ends at (0,0), d=5 to B
        + _track(2, 0, [(0, 3)] * 5)       # ends at (0,3), d=2 to B
        + _track(9, 8, [(0, 5), (0, 6)])   # B
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=10, max_dist=10.0)
    assert sorted(t.id for t in st) == [1, 2]
    assert st.by_id(2).end == 9            # B went to the closer track 2
    assert st.by_id(1).end == 4


def test_stitch_exact_distance_tie_smaller_gap_then_lower_id():
    # equidistant candidates, different gaps: smaller gap wins
    rows = (
        _track(1, 0, [(0, 0)] * 4)      # ends frame 3, gap 5 to B
        + _track(2, 0, [(10, 0)] * 6)   # ends frame 5, gap 3 to B
        + _track(9, 8, [(5, 0)])        # B equidistant (d=5) to both
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=10, max_dist=10.0)
    assert st.by_id(2).end == 8 and st.by_id(1).end == 3
    # equal distance AND equal gap: lower id wins
    rows = (
        _track(4, 0, [(0, 0)] * 4)
        + _track(3, 0, [(10, 0)] * 4)
        + _track(9, 6, [(5, 0)])
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=10, max_dist=10.0)
    assert st.by_id(3).end == 6 and st.by_id(4).end == 3


def test_stitch_time_overlap_never_merges():
    """Tracks that coexist (gap <= 0) are distinct objects even when
    spatially on top of each other."""
    rows = (
        _track(1, 0, [(0, 0)] * 10)          # frames 0..9
        + _track(2, 9, [(0, 0), (0, 1)])     # starts AT track 1's end
        + _track(3, 5, [(0, 0)] * 5)         # frames 5..9: overlaps both
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=10, max_dist=10.0)
    assert len(st) == 3


def test_stitch_gap_and_dist_boundaries():
    # gap == max_gap merges; gap == max_gap + 1 does not
    rows = _track(1, 0, [(0, 0)] * 3) + _track(2, 2 + 5, [(0, 0)])
    assert len(TrackCollection.from_rows(rows).stitch(max_gap=5, max_dist=1)) == 1
    rows = _track(1, 0, [(0, 0)] * 3) + _track(2, 2 + 6, [(0, 0)])
    assert len(TrackCollection.from_rows(rows).stitch(max_gap=5, max_dist=1)) == 2
    # d == max_dist merges (inclusive); just over does not
    rows = _track(1, 0, [(0, 0)] * 3) + _track(2, 4, [(3, 4)])
    assert len(TrackCollection.from_rows(rows).stitch(max_gap=5, max_dist=5.0)) == 1
    rows = _track(1, 0, [(0, 0)] * 3) + _track(2, 4, [(3, 4.001)])
    assert len(TrackCollection.from_rows(rows).stitch(max_gap=5, max_dist=5.0)) == 2


def test_stitch_chain_collapses_and_extends_endpoint():
    """A<-B<-C: B attaches to A, then C must stitch against A's EXTENDED
    endpoint (both in time and space), not A's original end."""
    rows = (
        _track(1, 0, [(0, 0), (1, 0), (2, 0)])       # ends frame 2 at x=2
        + _track(2, 5, [(4, 0), (5, 0), (6, 0)])     # ends frame 7 at x=6
        # C: frame 10, x=8 — within reach of B's end (gap 3, d 2) but NOT
        # of A's original end (gap 8 > max_gap=5, d 6 > max_dist=4)
        + _track(3, 10, [(8, 0)])
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=5, max_dist=4.0)
    assert len(st) == 1
    t = st.by_id(1)
    assert t.end == 10 and tuple(t.positions[-1]) == (8.0, 0.0)
    np.testing.assert_array_equal(t.frames, [0, 1, 2, 5, 6, 7, 10])


def test_stitch_loser_can_attach_to_extended_track():
    """After B wins open track A, a later C may still attach to A —
    gated by A's new (extended) endpoint."""
    rows = (
        _track(1, 0, [(0, 0)] * 3)             # ends frame 2
        + _track(2, 4, [(0, 1), (0, 2)])       # attaches, A now ends frame 5
        + _track(3, 7, [(0, 3)])               # gap 2 from extended end: merges
    )
    st = TrackCollection.from_rows(rows).stitch(max_gap=3, max_dist=5.0)
    assert len(st) == 1 and st.by_id(1).end == 7


def test_interpolation_matches_analytic_linear_motion():
    """Linear motion with missing detections: interpolation must recover
    the exact analytic positions at the missing frames."""
    frames = np.array([0, 1, 4, 7, 8])
    pos = np.stack([2.0 * frames + 1.0, -3.0 * frames + 50.0], axis=1)
    t = Track(1, frames, pos, np.full(len(frames), 10.0))
    ti = t.interpolated()
    full = np.arange(0, 9)
    np.testing.assert_array_equal(ti.frames, full)
    np.testing.assert_allclose(ti.positions[:, 0], 2.0 * full + 1.0, atol=1e-12)
    np.testing.assert_allclose(ti.positions[:, 1], -3.0 * full + 50.0, atol=1e-12)


def test_smoothing_analytic_ground_truth():
    """Moving-average smoothing: exact on a straight line away from the
    (edge-padded) ends, endpoints preserved exactly, and zero-mean noise
    on a line is attenuated by ~sqrt(window)."""
    n, w = 41, 5
    frames = np.arange(n)
    line = np.stack([1.5 * frames, np.full(n, 7.0)], axis=1)
    t = Track(1, frames, line, np.full(n, 1.0))
    ts = t.smoothed(window=w)
    # interior of a straight line is a fixed point of the moving average
    np.testing.assert_allclose(ts.positions[w:-w], line[w:-w], atol=1e-12)
    np.testing.assert_array_equal(ts.positions[0], line[0])
    np.testing.assert_array_equal(ts.positions[-1], line[-1])
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 1.0, (n, 2))
    tn = Track(1, frames, line + noise, np.full(n, 1.0)).smoothed(window=w)
    resid = tn.positions[w:-w] - line[w:-w]
    assert resid.std() < noise[w:-w].std() * 0.7


def test_cli_on_encoded_file(tmp_path):
    """Installed CLI (tpuva/cli.py, `python -m tpuva`): argparse ->
    load_any_video -> TrackingProject on a real encoded file."""
    from tpuva.cli import main
    from tpuva.io import VideoFileWriter

    clip, alive, truth, plate = multi_blob_clip(
        h=96, w=128, frames=32, n_blobs=2, radius=8, births_deaths=False
    )
    path = str(tmp_path / "in.avi")
    with VideoFileWriter(path, fps=25.0) as w:
        for f in clip:
            w.write_frame(f)
    out = str(tmp_path / "out")
    rc = main([path, out, "--threshold", "40", "--min-area", "20",
               "--alpha", "0"])
    assert rc == 0
    with open(os.path.join(out, "report.json")) as fh:
        report = json.load(fh)
    assert report["n_tracks"] >= 2
    assert os.path.exists(os.path.join(out, "pass2_tracks.csv"))


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
