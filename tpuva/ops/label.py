"""Connected-component labeling + per-blob stats on device (components E/F,
SURVEY.md §2.3; the "hardest kernel" of §7.3).

Replaces cv2.connectedComponentsWithStats (C++ SAUF/BBDT raster scans) with
an iterative min-label propagation + pointer-jumping scheme that is pure
XLA: static shapes, `lax.while_loop`, `reduce_window`, gathers — vmappable
over the frame-batch axis and shardable over a stream mesh.

cv2 label-id semantics reproduced bit-exactly (pinned empirically against
cv2 5.0.0 in this session; SURVEY.md §8):
- background label 0; labels dense 1..n;
- connectivity=4 (SAUF, pixel-based scan): ids ordered by the component's
  first pixel in PIXEL raster order;
- connectivity=8 (BBDT, 2x2-block-based scan): ids ordered by the
  component's first 2x2 block in BLOCK raster order (any two pixels inside
  one 2x2 block are 8-adjacent, so at most one component touches a block
  and the order is total).

Both orders are realized the same way: propagate the minimum of a
scan-order key K (a bijection pixel -> int; K = linear index for 4-conn,
K = block-major index for 8-conn). The converged per-component minimum IS
the component's first appearance under that scan, and ranking the minima
ascending (a cumsum in K space) reproduces cv2's ids exactly.

Static capacity: components beyond `max_components` (in scan order) are
relabeled to background — capacities are config knobs sized far above the
workload (2-8 blobs + noise specks, BASELINE.json:9).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _neighbor_min_8(label: jnp.ndarray, sent: int) -> jnp.ndarray:
    """Min over the 3x3 neighborhood (self included; out-of-bounds = sent)."""
    nd = label.ndim
    wdims = (1,) * (nd - 2) + (3, 3)
    pad = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    return lax.reduce_window(
        label, jnp.int32(sent), lax.min, wdims, (1,) * nd, pad
    )


def _neighbor_min_4(label: jnp.ndarray, sent: int) -> jnp.ndarray:
    H, W = label.shape[-2], label.shape[-1]
    pad = [(0, 0)] * (label.ndim - 2) + [(1, 1), (1, 1)]
    lp = jnp.pad(label, pad, constant_values=sent)

    def sh(dy, dx):
        idx = [slice(None)] * (label.ndim - 2) + [
            slice(1 + dy, 1 + dy + H),
            slice(1 + dx, 1 + dx + W),
        ]
        return lp[tuple(idx)]

    out = label
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        out = jnp.minimum(out, sh(dy, dx))
    return out


@lru_cache(maxsize=32)
def _scan_key(H: int, W: int, connectivity: int):
    """(kmap (H,W) int32, inv (S+1,) int32, S) — K bijection for the cv2
    scan order of the given connectivity, its inverse (K -> linear pixel
    index, with unused/sentinel K slots pointing at the pad slot S), and the
    sentinel value S (= one past the largest K)."""
    if connectivity == 4:
        S = H * W
        kmap = np.arange(S, dtype=np.int32).reshape(H, W)
    else:
        Hb, Wb = (H + 1) // 2, (W + 1) // 2
        r = np.arange(H)[:, None]
        c = np.arange(W)[None, :]
        kmap = (((r // 2) * Wb + (c // 2)) * 4 + (r % 2) * 2 + (c % 2)).astype(
            np.int32
        )
        S = Hb * Wb * 4
    inv = np.full(S + 1, H * W, np.int32)  # default: point at the pad slot
    inv[kmap.reshape(-1)] = np.arange(H * W, dtype=np.int32)
    return kmap, inv, S  # numpy: safe to close over inside any jit trace


@partial(jax.jit, static_argnames=("connectivity", "jump_rounds"))
def label_components(mask: jnp.ndarray, connectivity: int = 8, jump_rounds: int = 2):
    """Label connected components of a boolean/uint8 mask batch.

    mask: (N, H, W) (or (H, W)); returns int32 "root key" labels of the same
    shape: each component carries (its minimum scan key K) + 1, background
    is 0. Use `relabel_dense` for cv2-compatible dense ids.
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    m = mask > 0
    N, H, W = m.shape
    kmap, inv, sent = _scan_key(H, W, connectivity)
    label0 = jnp.where(m, kmap[None], jnp.int32(sent))
    nb_min = _neighbor_min_8 if connectivity == 8 else _neighbor_min_4
    flat_m = m.reshape(N, H * W)
    # pad slot (index H*W) always holds `sent`
    pad_col = jnp.full((N, 1), sent, jnp.int32)

    def jump(flat):
        # label-of-the-pixel-my-label-points-at, in K space:
        # K -> pixel via inv, pixel -> its current label via flat.
        flat_p = jnp.concatenate([flat, pad_col], axis=1)
        label_by_k = flat_p[:, inv]  # (N, S+1); slot S = sent
        return jnp.where(
            flat_m,
            jnp.take_along_axis(label_by_k, flat, axis=1),
            jnp.int32(sent),
        )

    def body(state):
        label, _ = state
        new = jnp.where(m, jnp.minimum(label, nb_min(label, sent)), jnp.int32(sent))
        flat = new.reshape(N, H * W)
        for _ in range(jump_rounds):
            flat = jump(flat)
        new = flat.reshape(N, H, W)
        return new, jnp.any(new != label)

    label, _ = lax.while_loop(
        lambda s: s[1], body, (label0, jnp.bool_(True))
    )
    label = jnp.where(m, label + 1, 0)  # 1-based root keys, 0 background
    return label[0] if squeeze else label


@partial(jax.jit, static_argnames=("max_components", "connectivity"))
def relabel_dense(
    root_label: jnp.ndarray, max_components: int = 64, connectivity: int = 8
):
    """Convert root-key labels (from label_components) to cv2's dense
    scan-order ids 1..n (0 = background; components past max_components
    -> 0).

    Returns (dense (N,H,W) int32, count (N,) int32 = min(n, max_components)).
    """
    squeeze = root_label.ndim == 2
    if squeeze:
        root_label = root_label[None]
    N, H, W = root_label.shape
    kmap, inv, sent = _scan_key(H, W, connectivity)
    m = root_label > 0
    flat_m = m.reshape(N, H * W)
    flat = root_label.reshape(N, H * W) - 1  # K values for mask pixels
    # is_root in K space: K slot v is a root iff the pixel at K=v is a mask
    # pixel whose label equals v.
    pad_false = jnp.zeros((N, 1), bool)
    m_by_k = jnp.concatenate([flat_m, pad_false], axis=1)[:, inv]  # (N, S+1)
    lab_by_k = jnp.concatenate(
        [flat, jnp.full((N, 1), sent, jnp.int32)], axis=1
    )[:, inv]
    kiota = jnp.arange(lab_by_k.shape[1], dtype=jnp.int32)[None]
    is_root_k = m_by_k & (lab_by_k == kiota)
    rank = jnp.cumsum(is_root_k, axis=1, dtype=jnp.int32)  # (N, S+1)
    n = rank[:, -1]
    dense = jnp.where(
        flat_m, jnp.take_along_axis(rank, jnp.where(flat_m, flat, 0), axis=1), 0
    )
    dense = jnp.where(dense <= max_components, dense, 0).reshape(N, H, W)
    count = jnp.minimum(n, max_components)
    return (dense[0], count[0]) if squeeze else (dense, count)


@partial(
    jax.jit, static_argnames=("max_components", "connectivity", "jump_rounds")
)
def connected_components_with_stats(
    mask: jnp.ndarray,
    max_components: int = 64,
    connectivity: int = 8,
    jump_rounds: int = 2,
):
    """Batched cv2.connectedComponentsWithStats.

    mask: (N, H, W) (or (H, W)) uint8/bool.
    Returns dict with:
      labels   : (N, H, W) int32  — dense cv2-order ids, 0 = background
      count    : (N,)      int32  — number of non-background components
      area     : (N, C+1)  int32  — row 0 is background, rows 1..C blobs
      bbox     : (N, C+1, 4) int32 — (x, y, w, h), zeros for absent ids
      centroid : (N, C+1, 2) float32 — (x=col, y=row), (0,0) for absent ids
    C = max_components. All shapes static.
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    root = label_components(
        mask, connectivity=connectivity, jump_rounds=jump_rounds
    )
    dense, count = relabel_dense(
        root, max_components=max_components, connectivity=connectivity
    )
    N, H, W = dense.shape
    C = max_components
    flat = dense.reshape(N, H * W)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).reshape(-1)

    def per_frame(d):
        area = jnp.bincount(d, length=C + 1).astype(jnp.int32)
        # integer coordinate sums: exact, so the final centroid division can
        # be done in float64 on host for bit-identical cv2/refimpl output
        sx = jax.ops.segment_sum(cols, d, num_segments=C + 1).astype(jnp.int32)
        sy = jax.ops.segment_sum(rows, d, num_segments=C + 1).astype(jnp.int32)
        xmin = jax.ops.segment_min(cols, d, num_segments=C + 1)
        xmax = jax.ops.segment_max(cols, d, num_segments=C + 1)
        ymin = jax.ops.segment_min(rows, d, num_segments=C + 1)
        ymax = jax.ops.segment_max(rows, d, num_segments=C + 1)
        present = area > 0
        safe_area = jnp.maximum(area, 1).astype(jnp.float32)
        cx = jnp.where(present, sx / safe_area, 0.0).astype(jnp.float32)
        cy = jnp.where(present, sy / safe_area, 0.0).astype(jnp.float32)
        csum = jnp.where(
            present[:, None], jnp.stack([sx, sy], axis=-1), 0
        ).astype(jnp.int32)
        bbox = jnp.where(
            present[:, None],
            jnp.stack(
                [xmin, ymin, xmax - xmin + 1, ymax - ymin + 1], axis=-1
            ),
            0,
        ).astype(jnp.int32)
        return area, bbox, jnp.stack([cx, cy], axis=-1), csum

    area, bbox, centroid, csum = jax.vmap(per_frame)(flat)
    out = {
        "labels": dense,
        "count": count,
        "area": area,
        "bbox": bbox,
        "centroid": centroid,
        "centroid_sum": csum,
    }
    if squeeze:
        out = {k: v[0] for k, v in out.items()}
    return out


@partial(jax.jit, static_argnames=("max_blobs",))
def extract_detections(stats: dict, min_area: int, max_blobs: int = 8):
    """Area-filter components and pack the first `max_blobs` (in cv2 label
    order) into fixed slots — the variable-length -> static-shape bridge
    (SURVEY.md §7.3).

    stats: batched output of connected_components_with_stats.
    Returns (dets (N, max_blobs, 3) float32 of (x, y, area), n_det (N,)
    int32, valid (N, max_blobs) bool, det_sums (N, max_blobs, 2) int32 of
    exact integer coordinate sums (sx, sy) for host-side float64 centroid
    division — bit-identical to cv2's m10/m00, m01/m00).
    """
    area = stats["area"][:, 1:]  # drop background row
    cent = stats["centroid"][:, 1:]
    csum = stats["centroid_sum"][:, 1:]
    count = stats["count"]
    N, C = area.shape
    comp_idx = jnp.arange(C, dtype=jnp.int32)
    valid = (area >= min_area) & (comp_idx[None, :] < count[:, None])
    rank = jnp.cumsum(valid, axis=1, dtype=jnp.int32)  # 1-based among valid
    slot = jnp.where(valid & (rank <= max_blobs), rank - 1, max_blobs)
    payload = jnp.concatenate(
        [cent, area[..., None].astype(jnp.float32)], axis=-1
    )

    def scatter(slots, pay):
        return jnp.zeros((max_blobs, 3), jnp.float32).at[slots].set(
            pay, mode="drop"
        )

    def scatter_i(slots, pay):
        return jnp.zeros((max_blobs, 2), jnp.int32).at[slots].set(
            pay, mode="drop"
        )

    dets = jax.vmap(scatter)(slot, payload)
    det_sums = jax.vmap(scatter_i)(slot, csum)
    n_det = jnp.minimum(rank[:, -1], max_blobs) if C else jnp.zeros(N, jnp.int32)
    det_valid = jnp.arange(max_blobs)[None, :] < n_det[:, None]
    return dets, n_det, det_valid, det_sums
