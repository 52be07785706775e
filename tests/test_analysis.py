"""L3/L4 tests: regions, curves, image measurement, shapes, active
contour, composer (reference: video/analysis/*, video/composer.py)."""

import numpy as np
import pytest

from tpuva.analysis import ActiveContour, Circle, Ellipse, Rectangle
from tpuva.analysis.curves import (
    curve_distance,
    curve_length,
    fit_spline,
    make_curve_equidistant,
    simplify_curve,
    smooth_curve,
)
from tpuva.analysis.image import (
    get_image_statistics,
    get_steepest_point,
    line_scan,
    subpixel_peak_1d,
    subpixel_peak_2d,
)
from tpuva.analysis.regions import (
    contour_to_mask,
    get_enclosing_outline,
    mask_boundary,
    mask_to_contours,
)
from refimpl.synthetic import render_disk


# ------------------------------------------------------------------ regions
def test_rectangle_algebra():
    r = Rectangle(10, 20, 30, 40)
    assert r.corners == ((10, 20), (40, 60))
    assert r.center == (25, 40) and r.area == 1200
    assert r.buffer(5) == Rectangle(5, 15, 40, 50)
    other = Rectangle(30, 50, 30, 30)
    inter = r.intersection(other)
    assert (inter.x, inter.y, inter.width, inter.height) == (30, 50, 10, 10)
    assert r.intersects(other)
    u = r.union(other)
    assert (u.x, u.y, u.right, u.bottom) == (10, 20, 60, 80)
    assert 0 < r.overlap_fraction(other) < 1
    assert r.contains_point((15, 25)) and not r.contains_point((50, 25))
    assert Rectangle(0, 0, 10, 10).intersection(Rectangle(20, 20, 5, 5)).is_empty


def test_rectangle_from_mask_and_slices():
    mask = np.zeros((50, 60), np.uint8)
    mask[10:20, 30:45] = 1
    r = Rectangle.from_mask(mask)
    assert (r.x, r.y, r.width, r.height) == (30, 10, 15, 10)
    rs, cs = r.slices()
    assert mask[rs, cs].all()


def test_mask_contour_roundtrip():
    mask = render_disk(60, 80, 40, 30, 12) > 0
    contours = mask_to_contours(mask)
    assert len(contours) == 1
    back = contour_to_mask(contours[0], (60, 80)) > 0
    # contour fill reproduces the disk closely
    assert (back ^ mask).sum() / mask.sum() < 0.15
    hull = get_enclosing_outline(np.argwhere(mask)[:, ::-1])
    assert len(hull) >= 4
    b = np.asarray(mask_boundary(mask.astype(np.uint8) * 255))
    assert b.sum() > 0 and (b & ~mask).sum() == 0


# ------------------------------------------------------------------- curves
def test_curve_length_and_resample():
    sq = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], float)
    assert curve_length(sq) == 30.0
    eq = make_curve_equidistant(sq, count=31)
    seg = np.linalg.norm(np.diff(eq, axis=0), axis=1)
    np.testing.assert_allclose(seg, 1.0, atol=1e-9)
    np.testing.assert_allclose(eq[0], sq[0])
    np.testing.assert_allclose(eq[-1], sq[-1])
    eq2 = make_curve_equidistant(sq, spacing=2.0)
    assert abs(curve_length(eq2) - 30.0) < 1e-9


def test_simplify_curve():
    t = np.linspace(0, 1, 101)
    line = np.stack([t * 100, t * 50], axis=1)
    line_noisy = line + np.random.default_rng(0).normal(0, 0.01, line.shape)
    simp = simplify_curve(line_noisy, tolerance=0.5)
    assert len(simp) == 2  # collinear within tolerance
    vshape = np.array([(0, 0), (5, 5), (10, 0)], float)
    dense = make_curve_equidistant(vshape, count=50)
    simp2 = simplify_curve(dense, tolerance=0.1)
    assert 3 <= len(simp2) <= 5
    assert any(np.allclose(p, (5, 5), atol=0.3) for p in simp2)


def test_curve_distance_and_smooth():
    curve = np.array([(0, 0), (10, 0)], float)
    d, s = curve_distance((5, 3), curve)
    assert abs(d - 3) < 1e-9 and abs(s - 5) < 1e-9
    noisy = np.stack([np.arange(20.0), np.random.default_rng(1).normal(0, 1, 20)], 1)
    sm = smooth_curve(noisy, window=5)
    assert sm[:, 1].std() < noisy[:, 1].std()
    sp = fit_spline(noisy, count=50, smoothing=10.0)
    assert sp.shape == (50, 2)


# -------------------------------------------------------------------- image
def test_image_statistics_and_line_scan():
    img = np.zeros((40, 40), np.float64)
    img[:, 20:] = 100.0
    stats = get_image_statistics(img)
    assert stats["mean"] == 50.0
    mask = np.zeros((40, 40), bool)
    mask[:, :20] = True
    assert get_image_statistics(img, mask)["mean"] == 0.0
    prof = line_scan(img, (5, 10), (35, 10), count=31)
    assert prof[0] == 0.0 and prof[-1] == 100.0
    edge = get_steepest_point(prof)
    # the 0->100 step is at x=20 -> profile index (20-5) = 15
    assert abs(edge - 14.5) < 1.5


def test_subpixel_peak():
    x = np.arange(21.0)
    prof = -((x - 10.3) ** 2)
    assert abs(subpixel_peak_1d(prof) - 10.3) < 0.05
    yy, xx = np.mgrid[:21, :21]
    img = -((xx - 12.2) ** 2) - (yy - 8.7) ** 2
    px, py = subpixel_peak_2d(img)
    assert abs(px - 12.2) < 0.05 and abs(py - 8.7) < 0.05


# ------------------------------------------------------------------- shapes
def test_circle_fit_and_intersect():
    t = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    pts = np.stack([5 + 3 * np.cos(t), 7 + 3 * np.sin(t)], 1)
    c = Circle.fit(pts)
    assert abs(c.cx - 5) < 1e-6 and abs(c.cy - 7) < 1e-6 and abs(c.radius - 3) < 1e-6
    hits = c.intersect_line((0, 7), (10, 7))
    assert len(hits) == 2
    xs = sorted(h[0] for h in hits)
    np.testing.assert_allclose(xs, [2, 8], atol=1e-9)
    assert c.contains_point((5, 7)) and not c.contains_point((9, 7))


def test_ellipse_from_moments():
    mask = np.zeros((60, 90), np.uint8)
    yy, xx = np.mgrid[:60, :90]
    mask[((xx - 45) / 20) ** 2 + ((yy - 30) / 10) ** 2 <= 1] = 1
    e = Ellipse.from_moments(mask)
    assert abs(e.cx - 45) < 0.5 and abs(e.cy - 30) < 0.5
    assert abs(e.angle % np.pi) < 0.1
    assert e.a > e.b
    assert e.contains_point((45, 30))


def test_active_contour_refines_to_edge():
    img = render_disk(80, 80, 40, 40, 20, fg=200).astype(np.float64)
    # start outside the true radius-20 edge, within the gradient's capture
    # range (edge blur 3 -> reach ~2*3 px; greedy snakes can't cross flat
    # energy farther out)
    circ = Circle(40, 40, 24)
    snake = ActiveContour(alpha=0.05, beta=0.05, gamma=1.0, window=2,
                          max_iterations=80, closed=True, blur_radius=3.0)
    refined = snake.fit(circ.polyline(48), img)
    r = np.hypot(refined[:, 0] - 40, refined[:, 1] - 40)
    assert abs(np.median(r) - 20) < 2.0, np.median(r)


# ----------------------------------------------------------------- composer
def test_video_composer(tmp_path):
    from tpuva.compose import VideoComposer, composer as comp_mod
    from tpuva.io import VideoFile

    path = str(tmp_path / "debug.avi")
    c = VideoComposer(path, fps=10)
    for t in range(5):
        c.set_frame(np.full((48, 64), 30, np.uint8))
        c.add_circle((10 + 5 * t, 20), 4, (0, 0, 255))
        c.add_line((0, 0), (63, 47), (0, 255, 0))
        c.add_rectangle((5, 5, 20, 15), (255, 0, 0))
        c.add_text(str(t), (2, 40))
    c.close()
    v = VideoFile(path)
    assert v.frame_count == 5 and v.is_color
    f0 = v.get_frame(0)
    # circle drawn in red (BGR) near (10, 20) — MJPG is lossy on tiny
    # frames, so check the neighborhood dominates in red vs the background
    region = f0[16:25, 6:15].astype(int)
    assert region[..., 2].max() > 100
    assert region[..., 2].max() > region[..., 0].max() + 40
    v.close()


def test_annotate_tracks(tmp_path):
    from tpuva.compose import VideoComposer
    from tpuva.compose.composer import annotate_tracks
    from tpuva.io import VideoFile

    clip = np.full((6, 48, 64), 20, np.uint8)
    rows = [(1, t, 10.0 + 3 * t, 24.0, 30) for t in range(6)]
    path = str(tmp_path / "tracks.avi")
    annotate_tracks(VideoComposer(path, fps=10), clip, rows)
    v = VideoFile(path)
    assert v.frame_count == 6
    v.close()
