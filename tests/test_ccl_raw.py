"""Gen-4 raw-buffer CCL + stats: bit-equality with the dense path.

label_components_tiled_raw never initializes its label buffer (pass 1
writes only occupied tiles; halos are masked in-kernel by per-frame
neighbor occupancy), and _stats_from_raw reads the buffer only through
gathers of occupied strips. These tests pin that the (stats, overflow)
outputs are bit-identical to the gen-3 path (label_components_tiled +
_stats_from_root), which is itself golden-tested against cv2.

Interpret-mode caveat: on CPU, unwritten Pallas output regions read as
zeros rather than TPU garbage — so these tests prove the masking logic
against *benign* junk. The same code path runs on real TPU via bench.py
(which checks centroid accuracy vs the OpenCV oracle end-to-end) and the
soak script.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpuva.ops.label import _stats_from_raw, _stats_from_root, label_components
from tpuva.ops.pallas.ccl import (
    label_components_tiled,
    label_components_tiled_raw,
)

STAT_KEYS = ("count", "area", "centroid_sum", "overflow")


def run_raw(mask: np.ndarray, H: int, W: int, sparse_strips: int = 256,
            max_components: int = 64):
    m = jnp.asarray(mask)
    Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256
    mp = jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))
    o1 = lax.reduce_window(
        mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
    )
    so = lax.reduce_window(
        o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
    )
    # F=4 keeps interpret-mode trace/compile time sane on the 1-core CI
    # box; the library default (F=8, tuned on TPU) is exercised through
    # _post_mask_stage by the staged pipeline tests.
    labraw, conv = label_components_tiled_raw(
        mp, so, H, W, frames_per_step=4
    )
    stats = _stats_from_raw(
        labraw, so, H, W,
        max_components=max_components, sparse_strips=sparse_strips,
    )
    return stats, bool(conv)


def run_ref(mask: np.ndarray, sparse_strips: int = 256,
            max_components: int = 64):
    root = label_components_tiled(jnp.asarray(mask))
    return _stats_from_root(
        root, max_components=max_components, compute_bbox=False,
        compute_labels=False, sparse_strips=sparse_strips,
    )


def assert_stats_equal(ref, new):
    for k in STAT_KEYS:
        np.testing.assert_array_equal(
            np.asarray(ref[k]), np.asarray(new[k]), err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(ref["centroid"]), np.asarray(new["centroid"])
    )


def test_random_masks_match_dense_path():
    rng = np.random.default_rng(3)
    # W=100 is the regression case for the SENT/expected-key alias fix
    for (h, w, p) in [(64, 256, 0.25), (50, 100, 0.45), (96, 300, 0.05)]:
        mask = (rng.random((3, h, w)) < p).astype(np.uint8) * 255
        mask[1] = 0  # empty frame between occupied frames
        ref = run_ref(mask)
        new, conv = run_raw(mask, h, w)
        assert conv
        assert_stats_equal(ref, new)


def test_blob_scene_exact_centroids():
    """Disjoint blobs spanning tile boundaries: exact integer sums."""
    mask = np.zeros((2, 130, 280), np.uint8)
    mask[0, 60:70, 250:265] = 255  # crosses the 256-col tile boundary
    mask[0, 62:66, 10:30] = 255
    mask[1, 126:130, 0:8] = 255  # image edge, unaligned H
    ref = run_ref(mask)
    new, conv = run_raw(mask, 130, 280)
    assert conv
    assert_stats_equal(ref, new)
    # sanity against first principles for the single-edge blob
    area = np.asarray(new["area"])[1, 1]
    assert area == 4 * 8


def test_multi_frame_groups_and_partial_last_group():
    """N not divisible by frames_per_step exercises the group padding."""
    rng = np.random.default_rng(7)
    mask = (rng.random((6, 64, 256)) < 0.2).astype(np.uint8) * 255
    mask[2] = 0
    mask[5] = 0
    ref = run_ref(mask)
    new, conv = run_raw(mask, 64, 256)
    assert conv
    assert_stats_equal(ref, new)


def test_overflow_reported_identically():
    """More occupied strips than capacity: same overflow counts, and the
    kept strips (ascending key order) produce the same stats."""
    rng = np.random.default_rng(11)
    mask = (rng.random((1, 64, 512)) < 0.3).astype(np.uint8) * 255
    ref = run_ref(mask, sparse_strips=8)
    new, _conv = run_raw(mask, 64, 512, sparse_strips=8)
    assert int(np.asarray(new["overflow"]).max()) > 0
    assert_stats_equal(ref, new)


def test_backward_pass_flag_reflection_regression():
    """One 8-connected component whose global min key lives in tile
    (0,1) but which reaches tile (1,0) only through tile (0,0): pass 1
    (forward) leaves (1,0) stale, pass 2 (backward) updates (0,0) — its
    ring-change flag must land at tile (0,0), not at the point-reflected
    grid position (the round-2 bug), or the frontier never schedules
    (1,0) and the loop exits "converged" with the component split in
    two. Exercises both the dense (gen-3) and raw (gen-4) kernels."""
    mask = np.zeros((1, 192, 768), np.uint8)
    mask[0, 0:9, 280:284] = 255   # stub: global min key, tile (0,1)
    mask[0, 5:9, 10:301] = 255    # bar spanning tiles (0,0)-(0,1)
    mask[0, 5:101, 10:14] = 255   # arm descending into tile (1,0)
    lab, conv = label_components_tiled(
        jnp.asarray(mask), return_converged=True
    )
    assert bool(conv)
    ref = np.asarray(label_components(jnp.asarray(mask)))
    np.testing.assert_array_equal(np.asarray(lab), ref)
    refs = run_ref(mask)
    new, conv = run_raw(mask, 192, 768)
    assert conv
    assert int(np.asarray(new["count"])[0]) == 1
    assert_stats_equal(refs, new)


def test_cross_tile_component_propagation():
    """One component snaking across several tiles forces multi-pass
    propagation through occupancy-masked halos."""
    mask = np.zeros((1, 192, 768), np.uint8)
    mask[0, 10:14, 20:700] = 255  # long horizontal bar across 3 tiles
    mask[0, 10:180, 690:700] = 255  # down through 3 tile rows
    mask[0, 170:180, 30:700] = 255  # back left: a U shape
    ref = run_ref(mask)
    new, conv = run_raw(mask, 192, 768)
    assert conv
    assert_stats_equal(ref, new)
    assert int(np.asarray(new["count"])[0]) == 1
