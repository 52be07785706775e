"""Unit tests for the device tracker against refimpl.tracker semantics
(the pinned contract, refimpl/tracker.py docstring) and for the assigners
against their oracles (refimpl greedy; scipy Hungarian)."""

import numpy as np
import pytest

import jax.numpy as jnp

from refimpl.tracker import Tracker
from refimpl.tracker import greedy_assign as ref_greedy
from tpuva.graph.config import TrackConfig
from tpuva.track import init_track_state, track_update
from tpuva.track.assign import BIG, greedy_assign, hungarian_assign


def random_cost(rng, T, D, frac_valid=0.8):
    cost = rng.uniform(0, 100, (T, D)).astype(np.float32)
    invalid = rng.random((T, D)) > frac_valid
    return np.where(invalid, np.float32(1e30), cost)


@pytest.mark.parametrize("T,D", [(4, 4), (8, 3), (3, 8), (16, 8), (1, 1)])
def test_greedy_matches_refimpl(T, D):
    rng = np.random.default_rng(hash((T, D)) % 2**32)
    for trial in range(20):
        cost = random_cost(rng, T, D)
        max_dist = float(rng.uniform(10, 90))
        ref_cost = np.where(cost >= 1e29, np.inf, cost)
        ref = {j: i for i, j in ref_greedy(ref_cost, max_dist)}
        got = np.asarray(greedy_assign(jnp.asarray(cost), max_dist))
        for j in range(D):
            assert got[j] == ref.get(j, -1), (trial, j, cost)


@pytest.mark.parametrize("T,D", [(4, 4), (8, 3), (3, 8), (16, 8)])
def test_hungarian_matches_scipy(T, D):
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(hash((T, D, "h")) % 2**32)
    for trial in range(20):
        cost = rng.uniform(0, 100, (T, D)).astype(np.float32)
        max_dist = float(rng.uniform(20, 90))
        rows, cols = linear_sum_assignment(cost)
        ref = {
            int(j): int(i)
            for i, j in zip(rows, cols)
            if cost[i, j] <= max_dist
        }
        got = np.asarray(hungarian_assign(jnp.asarray(cost), max_dist))
        for j in range(D):
            assert got[j] == ref.get(j, -1), (trial, j, cost)


def _run_device_tracker(det_stream, cfg, max_blobs):
    state = init_track_state(cfg.max_tracks)
    rows_out = []
    for frame, dets in enumerate(det_stream):
        D = max_blobs
        arr = np.zeros((D, 3), np.float32)
        valid = np.zeros((D,), bool)
        for k, d in enumerate(dets[:D]):
            arr[k] = d
            valid[k] = True
        state, rows, row_valid = track_update(
            state,
            jnp.asarray(arr),
            jnp.asarray(valid),
            jnp.int32(frame),
            max_dist=cfg.max_dist,
            death_patience=cfg.death_patience,
            assigner=cfg.assigner,
        )
        rows = np.asarray(rows)
        for k in range(D):
            if np.asarray(row_valid)[k]:
                t = rows[k]
                rows_out.append(
                    (int(t[0]), int(t[1]), float(t[2]), float(t[3]),
                     float(t[4]))
                )
    return rows_out


@pytest.mark.parametrize("assigner", ["greedy", "hungarian"])
def test_tracker_matches_refimpl_randomized(assigner):
    """Random walks with births, deaths, zero-detection frames, and
    capacity pressure — device rows must match refimpl exactly."""
    rng = np.random.default_rng(42 if assigner == "greedy" else 43)
    cfg = TrackConfig(
        max_dist=25.0, death_patience=3, max_tracks=6, assigner=assigner
    )
    max_blobs = 5
    # simulate wandering objects that appear/disappear
    objs = {}
    next_obj = 0
    det_stream = []
    for frame in range(60):
        if rng.random() < 0.3 and len(objs) < 7:
            objs[next_obj] = rng.uniform(20, 200, 2)
            next_obj += 1
        if rng.random() < 0.2 and objs:
            del objs[rng.choice(list(objs))]
        if rng.random() < 0.15:
            det_stream.append([])  # dropout frame: zero detections
            continue
        dets = []
        for k in sorted(objs):
            objs[k] = objs[k] + rng.uniform(-6, 6, 2)
            dets.append((float(objs[k][0]), float(objs[k][1]),
                         float(rng.integers(30, 90))))
        det_stream.append(dets[:max_blobs])

    ref = Tracker(cfg)
    for frame, dets in enumerate(det_stream):
        ref.update(frame, dets)

    got = _run_device_tracker(det_stream, cfg, max_blobs)
    assert len(got) == len(ref.rows), (len(got), len(ref.rows))
    for g, r in zip(
        sorted(got, key=lambda x: (x[1], x[0])),
        sorted(ref.rows, key=lambda x: (x[1], x[0])),
    ):
        assert g[0] == r[0] and g[1] == r[1], (g, r)
        assert abs(g[2] - r[2]) < 1e-4 and abs(g[3] - r[3]) < 1e-4, (g, r)
        assert abs(g[4] - r[4]) < 1e-4, (g, r)


def test_hungarian_contested_and_degenerate():
    """Frames engineered to DEFEAT the fast path (shared column minima,
    ties, D > T) must still match scipy exactly."""
    from scipy.optimize import linear_sum_assignment

    cases = [
        # two dets whose nearest row is the SAME -> contested
        np.array([[1.0, 1.5], [9.0, 9.5], [9.0, 9.9]], np.float32),
        # exact tie in a column
        np.array([[2.0, 5.0], [2.0, 7.0], [8.0, 1.0]], np.float32),
        # D > T (more detections than tracks)
        np.array([[3.0, 1.0, 2.0, 8.0]], np.float32),
        np.array([[3.0, 1.0, 2.0, 8.0], [1.0, 4.0, 0.5, 2.0]], np.float32),
        # swap-optimal: greedy would pick (0,0) but optimum crosses
        np.array([[1.0, 2.0], [2.0, 100.0]], np.float32),
    ]
    for cost in cases:
        T, D = cost.shape
        rows, cols = linear_sum_assignment(cost)
        ref = {int(j): int(i) for i, j in zip(rows, cols)}
        got = np.asarray(hungarian_assign(jnp.asarray(cost), 1e6))
        total_ref = sum(cost[i, j] for j, i in ref.items())
        total_got = sum(
            cost[got[j], j] for j in range(D) if got[j] >= 0
        )
        n_got = int((got >= 0).sum())
        # optima may be non-unique under ties: require equal cardinality
        # and equal total cost (the LSA objective), and exact agreement
        # when the optimum is unique
        assert n_got == len(ref), (cost, got, ref)
        assert abs(total_got - total_ref) < 1e-4, (cost, got, ref)
