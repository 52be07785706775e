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
    in float64, bit-identical to cv2."""
    T = state.pos.shape[0]
    D = dets.shape[0]
    INT_MAX = jnp.int32(2**31 - 1)

    # ---- cost matrix in reference list order (active rows sorted by id)
    dx = state.pos[:, 0:1] - dets[None, :, 0].reshape(1, D)
    dy = state.pos[:, 1:2] - dets[None, :, 1].reshape(1, D)
    cost = jnp.sqrt(dx * dx + dy * dy).reshape(T, D)
    pairable = state.active[:, None] & det_valid[None, :]
    cost = jnp.where(pairable, cost, BIG)
    order = jnp.argsort(jnp.where(state.active, state.tid, INT_MAX))  # stable
    cost_sorted = cost[order]
    assign = hungarian_assign if assigner == "hungarian" else greedy_assign
    row_for_det_sorted = assign(cost_sorted, max_dist)  # (D,) in sorted rows
    slot_for_det = jnp.where(
        row_for_det_sorted >= 0,
        order[jnp.maximum(row_for_det_sorted, 0)],
        -1,
    ).astype(jnp.int32)
    det_matched = slot_for_det >= 0

    # invert: detection index per slot (or -1)
    det_for_slot = (
        jnp.full((T,), -1, jnp.int32)
        .at[jnp.where(det_matched, slot_for_det, T)]
        .set(jnp.arange(D, dtype=jnp.int32), mode="drop")
    )
    slot_matched = det_for_slot >= 0
    safe_det = jnp.maximum(det_for_slot, 0)

    # ---- matched updates
    pos = jnp.where(slot_matched[:, None], dets[safe_det, :2], state.pos)
    missed = jnp.where(
        slot_matched, 0, jnp.where(state.active, state.missed + 1, state.missed)
    )

    # ---- deaths (free slots before births, like the reference's compaction)
    still = state.active & (missed < death_patience)

    # ---- births
    birth_det = det_valid & ~det_matched
    birth_rank = jnp.cumsum(birth_det.astype(jnp.int32))  # (D,) 1-based
    free = ~still
    free_rank = jnp.cumsum(free.astype(jnp.int32))  # (T,) 1-based per slot
    n_free = free_rank[-1] if T else jnp.int32(0)
    can_birth = birth_det & (birth_rank <= n_free)
    # the r-th birth goes to the first slot with free_rank == r
    slot_for_birth = jnp.searchsorted(
        free_rank, jnp.where(can_birth, birth_rank, T + 1)
    ).astype(jnp.int32)
    new_tid_for_det = jnp.where(
        can_birth, state.next_id - 1 + birth_rank, 0
    ).astype(jnp.int32)

    bidx = jnp.where(can_birth, slot_for_birth, T)
    darange = jnp.arange(D, dtype=jnp.int32)
    pos = pos.at[bidx].set(dets[:, :2], mode="drop")
    tid = state.tid
    tid = jnp.where(still, tid, 0)
    tid = tid.at[bidx].set(new_tid_for_det, mode="drop")
    missed = jnp.where(still, missed, 0)
    missed = missed.at[bidx].set(0, mode="drop")
    active = still.at[bidx].set(True, mode="drop")
    next_id = state.next_id + jnp.sum(can_birth.astype(jnp.int32))

    new_state = TrackState(pos=pos, tid=tid, missed=missed, active=active,
                           next_id=next_id)

    # ---- trajectory rows, one per matched-or-birthed detection
    row_tid = jnp.where(
        det_matched, tid[jnp.maximum(slot_for_det, 0)], new_tid_for_det
    )
    row_valid = det_matched | can_birth
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
    del darange
    return new_state, rows, row_valid
