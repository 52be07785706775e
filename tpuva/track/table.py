"""Fixed-capacity track table as `lax.scan` carry (components G/H/I,
SURVEY.md §2.3, §3.3).

The reference keeps a Python list of Track objects updated per frame on the
host; here the tracker is a static-shape pytree living on device, updated
inside the scan over the frame axis so tracker state never leaves the chip
(BASELINE.json:5 "tracker state stays on-device").

Semantics replicate refimpl.tracker.Tracker exactly, including:
- cost rows ordered by track insertion order (track ids are monotonically
  increasing, so sorting active rows by id reproduces the reference's
  list order — this matters for greedy tie-breaks);
- deaths (missed >= death_patience after aging) free their slots *before*
  births are placed, matching the reference's list compaction;
- births take detections in detection order while capacity remains;
- a trajectory row is emitted per matched or birthed detection:
  (track_id, frame, x, y, area).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuva.track.assign import BIG, greedy_assign, hungarian_assign


class TrackState(NamedTuple):
    pos: jnp.ndarray  # (MAX_TRACKS, 2) float32 — last known (x, y)
    tid: jnp.ndarray  # (MAX_TRACKS,) int32 — track id, 0 if slot free
    missed: jnp.ndarray  # (MAX_TRACKS,) int32 — consecutive unmatched frames
    active: jnp.ndarray  # (MAX_TRACKS,) bool
    next_id: jnp.ndarray  # () int32 — next id to assign (ids start at 1)


def init_track_state(max_tracks: int) -> TrackState:
    return TrackState(
        pos=jnp.zeros((max_tracks, 2), jnp.float32),
        tid=jnp.zeros((max_tracks,), jnp.int32),
        missed=jnp.zeros((max_tracks,), jnp.int32),
        active=jnp.zeros((max_tracks,), bool),
        next_id=jnp.int32(1),
    )


def track_update(
    state: TrackState,
    dets: jnp.ndarray,  # (D, 3) float32 (x, y, area)
    det_valid: jnp.ndarray,  # (D,) bool
    frame_idx,  # int32 scalar
    max_dist: float,
    death_patience: int,
    assigner: str = "greedy",
):
    """One tracker step. Returns (new_state, rows (D, 5) float32,
    row_valid (D,) bool). Row = (track_id, frame, x, y, area).

    Exact-export note: rows carry the float32 centroid; the pipeline
    additionally forwards the detections' integer coordinate sums
    (extract_detections det_sums) so hosts can redo the centroid division
    in float64, bit-identical to cv2.

    Perf note: this step runs once per frame inside the device scan, so
    its op count dominates tracker cost. Everything is expressed as
    iota-compare selects, tiny reductions, and one-hot f32 matmuls — no
    sort, no scatter, no searchsorted (each ~10x the cost of a fused
    elementwise op at this size). Frames with zero detections take a
    cheap age-and-reap branch via lax.cond."""
    T = state.pos.shape[0]
    D = dets.shape[0]
    INT_MAX = jnp.int32(2**31 - 1)
    ti = jnp.arange(T, dtype=jnp.int32)

    def update_with_dets(state: TrackState):
        # ---- reference list order (active rows sorted by id): ids are
        # unique among active slots, so a comparison-count rank replaces
        # argsort; ordmat[r, i] == (slot i has rank r).
        key = jnp.where(state.active, state.tid, INT_MAX)
        before = (key[None, :] < key[:, None]) | (
            (key[None, :] == key[:, None]) & (ti[None, :] < ti[:, None])
        )
        rank = jnp.sum(before, axis=1).astype(jnp.int32)  # (T,)
        ordmat = rank[None, :] == ti[:, None]  # (T_sorted, T_slot)
        order = jnp.argmax(ordmat, axis=1).astype(jnp.int32)
        n_active = jnp.sum(state.active.astype(jnp.int32))
        active_sorted = ti < n_active
        pos_sorted = ordmat.astype(jnp.float32) @ state.pos  # exact 0/1 dot

        # ---- cost matrix in sorted order
        dx = pos_sorted[:, 0:1] - dets[None, :, 0].reshape(1, D)
        dy = pos_sorted[:, 1:2] - dets[None, :, 1].reshape(1, D)
        cost = jnp.sqrt(dx * dx + dy * dy).reshape(T, D)
        pairable = active_sorted[:, None] & det_valid[None, :]
        cost = jnp.where(pairable, cost, BIG)
        assign = hungarian_assign if assigner == "hungarian" else greedy_assign
        row_for_det_sorted = assign(cost, max_dist)  # (D,) in sorted rows
        det_matched = row_for_det_sorted >= 0
        slot_for_det = jnp.where(
            det_matched, order[jnp.maximum(row_for_det_sorted, 0)], -1
        ).astype(jnp.int32)

        # ---- matched updates (eq2[t, j] == slot t matched detection j)
        eq2 = (slot_for_det[None, :] == ti[:, None]) & det_matched[None, :]
        slot_matched = jnp.any(eq2, axis=1)
        matched_pos = eq2.astype(jnp.float32) @ dets[:, :2]
        pos = jnp.where(slot_matched[:, None], matched_pos, state.pos)
        missed = jnp.where(
            slot_matched,
            0,
            jnp.where(state.active, state.missed + 1, state.missed),
        )

        # ---- deaths (free slots before births, like the reference's
        # list compaction)
        still = state.active & (missed < death_patience)

        # ---- births: the r-th birthable detection takes the r-th free slot
        birth_det = det_valid & ~det_matched
        birth_rank = jnp.cumsum(birth_det.astype(jnp.int32))  # (D,) 1-based
        free = ~still
        free_rank = jnp.cumsum(free.astype(jnp.int32))  # (T,) 1-based
        n_free = free_rank[-1] if T else jnp.int32(0)
        can_birth = birth_det & (birth_rank <= n_free)
        # first slot t with free_rank[t] >= birth_rank[j]
        slot_for_birth = jnp.sum(
            free_rank[None, :] < birth_rank[:, None], axis=1
        ).astype(jnp.int32)
        new_tid_for_det = jnp.where(
            can_birth, state.next_id - 1 + birth_rank, 0
        ).astype(jnp.int32)

        bo = (slot_for_birth[None, :] == ti[:, None]) & can_birth[None, :]
        has_b = jnp.any(bo, axis=1)
        pos = jnp.where(
            has_b[:, None], bo.astype(jnp.float32) @ dets[:, :2], pos
        )
        tid = jnp.where(still, state.tid, 0)
        tid = jnp.where(
            has_b,
            jnp.sum(jnp.where(bo, new_tid_for_det[None, :], 0), axis=1),
            tid,
        )
        # births land on non-still slots, whose missed is already zeroed
        missed = jnp.where(still, missed, 0)
        active = still | has_b
        next_id = state.next_id + jnp.sum(can_birth.astype(jnp.int32))

        new_state = TrackState(
            pos=pos, tid=tid, missed=missed, active=active, next_id=next_id
        )

        # ---- trajectory rows, one per matched-or-birthed detection
        row_tid = jnp.where(
            det_matched,
            jnp.sum(jnp.where(eq2, tid[:, None], 0), axis=0),
            new_tid_for_det,
        )
        row_valid = det_matched | can_birth
        return new_state, row_tid, row_valid

    def update_no_dets(state: TrackState):
        # age active tracks, reap deaths; no assignment, no births
        missed = jnp.where(state.active, state.missed + 1, state.missed)
        still = state.active & (missed < death_patience)
        new_state = TrackState(
            pos=state.pos,
            tid=jnp.where(still, state.tid, 0),
            missed=jnp.where(still, missed, 0),
            active=still,
            next_id=state.next_id,
        )
        return new_state, jnp.zeros((D,), jnp.int32), jnp.zeros((D,), bool)

    new_state, row_tid, row_valid = jax.lax.cond(
        jnp.any(det_valid), update_with_dets, update_no_dets, state
    )
    rows = jnp.stack(
        [
            row_tid.astype(jnp.float32),
            jnp.full((D,), 0, jnp.float32) + jnp.float32(frame_idx),
            dets[:, 0],
            dets[:, 1],
            dets[:, 2],
        ],
        axis=-1,
    )
    return new_state, rows, row_valid
