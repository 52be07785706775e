"""Gen-4 raw-buffer CCL + stats: bit-equality with the dense path.

label_components_tiled_raw never initializes its label buffer (pass 1
writes only occupied tiles; halos are masked in-kernel by per-frame
neighbor occupancy), and _stats_from_raw reads the buffer only through
gathers of occupied strips. These tests pin that the (stats, overflow)
outputs are bit-identical to the gen-3 path (label_components_tiled +
_stats_from_root), which is itself golden-tested against cv2.

On CPU, unwritten Pallas output regions read as zeros rather than TPU
garbage, so plain interpret-mode runs only prove the masking against
*benign* junk. test_poisoned_buffers_masked closes that gap in CI: it
donates 0x5A5A5A5A-filled buffers into pass 1 (debug_poison=True), so
any read of a never-written region leaks the sentinel into stats and
fails bit-equality. The same code path also runs on real TPU via
bench.py and bench/tpu_smoke.py.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpuva.ops.label import (
    _stats_from_compact,
    _stats_from_raw,
    _stats_from_root,
    label_components,
)
from tpuva.ops.pallas.ccl import (
    label_components_tiled,
    label_components_tiled_raw,
)

STAT_KEYS = ("count", "area", "centroid_sum", "overflow")


def run_raw(mask: np.ndarray, H: int, W: int, sparse_strips: int = 256,
            max_components: int = 64, compute_bbox: bool = False):
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
        compute_bbox=compute_bbox,
    )
    return stats, bool(conv)


def run_compact(mask: np.ndarray, slots: int = 32, max_components: int = 64,
                compute_bbox: bool = False):
    """Gen-5 path: compact tile write-out + gather-free stats."""
    m = jnp.asarray(mask)
    N, H, W = m.shape
    Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256
    mp = jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))
    o1 = lax.reduce_window(
        mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
    )
    so = lax.reduce_window(
        o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
    )
    _labraw, cbuf, conv = label_components_tiled_raw(
        mp, so, H, W, frames_per_step=4, compact_slots=slots
    )
    stats = _stats_from_compact(
        cbuf, so, H, W, max_components=max_components,
        compute_bbox=compute_bbox,
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


def test_compact_matches_dense_path():
    """Gen-5 compact stats: bit-equal (incl. cv2 id order) to the dense
    path on scenes spanning several tile rows AND columns — slot-major
    order differs from ascending-key order there, exercising the
    metadata re-sort."""
    rng = np.random.default_rng(13)
    scenes = []
    m1 = (rng.random((3, 64, 256)) < 0.25).astype(np.uint8) * 255
    m1[1] = 0
    scenes.append((m1, 64, 256))
    m2 = (rng.random((2, 150, 700)) < 0.04).astype(np.uint8) * 255
    scenes.append((m2, 150, 700))  # multi-tile, unaligned H/W
    m3 = np.zeros((1, 192, 768), np.uint8)
    m3[0, 10:14, 20:700] = 255
    m3[0, 10:180, 690:700] = 255
    m3[0, 170:180, 30:700] = 255
    scenes.append((m3, 192, 768))  # serpentine across 9 tiles
    for mask, h, w in scenes:
        ref = run_ref(mask)
        new, conv = run_compact(mask, slots=64)
        assert conv
        assert int(np.asarray(new["overflow"]).max()) == 0
        assert_stats_equal(ref, new)


def test_compact_slot_overflow():
    """More occupied slots than capacity: overflow counts the occupied
    strips inside dropped sub-blocks; kept blocks produce exact stats
    for the components they fully contain."""
    mask = np.zeros((1, 64, 1024), np.uint8)
    # one blob per 256-col tile, inside the first 16-row band: 4
    # occupied slots
    for t in range(4):
        mask[0, 2:12, t * 256 + 5 : t * 256 + 25] = 255
    new, conv = run_compact(mask, slots=2)
    assert conv
    ov = int(np.asarray(new["overflow"])[0])
    assert ov > 0  # strict mode would raise on this frame
    # the first two kept blocks hold blobs 0-1 intact and correctly id'd
    ref = run_ref(mask[:, :, :512])
    np.testing.assert_array_equal(
        np.asarray(new["area"])[0, 1:3], np.asarray(ref["area"])[0, 1:3]
    )


def test_overflow_reported_identically():
    """More occupied strips than capacity: same overflow counts, and the
    kept strips (ascending key order) produce the same stats."""
    rng = np.random.default_rng(11)
    mask = (rng.random((1, 64, 512)) < 0.3).astype(np.uint8) * 255
    ref = run_ref(mask, sparse_strips=8)
    new, _conv = run_raw(mask, 64, 512, sparse_strips=8)
    assert int(np.asarray(new["overflow"]).max()) > 0
    assert_stats_equal(ref, new)


def test_bbox_on_fast_paths():
    """compute_bbox=True on the raw and compact paths: (x, y, w, h)
    bit-equal to the dense path (which is golden-tested vs cv2),
    including blobs crossing tile boundaries and image edges."""
    rng = np.random.default_rng(31)
    scenes = [
        ((rng.random((2, 150, 700)) < 0.04).astype(np.uint8) * 255,
         150, 700),
    ]
    m2 = np.zeros((1, 130, 280), np.uint8)
    m2[0, 60:70, 250:265] = 255   # crosses the 256-col tile boundary
    m2[0, 126:130, 0:8] = 255     # image edge
    scenes.append((m2, 130, 280))
    for mask, h, w in scenes:
        root = label_components_tiled(jnp.asarray(mask))
        ref = _stats_from_root(
            root, max_components=64, compute_bbox=True,
            compute_labels=False,
        )
        raw, conv = run_raw(mask, h, w, compute_bbox=True)
        assert conv
        np.testing.assert_array_equal(
            np.asarray(ref["bbox"]), np.asarray(raw["bbox"])
        )
        cmp_, conv2 = run_compact(mask, slots=64, compute_bbox=True)
        assert conv2
        np.testing.assert_array_equal(
            np.asarray(ref["bbox"]), np.asarray(cmp_["bbox"])
        )


def test_poisoned_buffers_masked():
    """Occupancy masking proven against HOSTILE buffer contents: with the
    label (and compact) buffers donated as 0x5A5A5A5A fills, stats must
    still be bit-identical to the dense reference — any unwritten-region
    read would leak the poison into the root table or payload sums."""
    rng = np.random.default_rng(23)
    scenes = [
        ((rng.random((2, 150, 700)) < 0.04).astype(np.uint8) * 255,
         150, 700),
        ((rng.random((3, 64, 256)) < 0.3).astype(np.uint8) * 255, 64, 256),
    ]
    scenes[0][0][1] = 0  # an empty frame between occupied ones
    for mask, h, w in scenes:
        m = jnp.asarray(mask)
        Hp, Wp = -(-h // 64) * 64, -(-w // 256) * 256
        mp = jnp.pad(m, ((0, 0), (0, Hp - h), (0, Wp - w)))
        o1 = lax.reduce_window(
            mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
        )
        so = lax.reduce_window(
            o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
        )
        ref = run_ref(mask)
        # raw path under poison
        labraw, conv = label_components_tiled_raw(
            mp, so, h, w, frames_per_step=4, debug_poison=True
        )
        assert bool(conv)
        new = _stats_from_raw(labraw, so, h, w, max_components=64)
        assert_stats_equal(ref, new)
        # compact path under poison
        _lr, cbuf, conv2 = label_components_tiled_raw(
            mp, so, h, w, frames_per_step=4, compact_slots=64,
            debug_poison=True,
        )
        assert bool(conv2)
        new2 = _stats_from_compact(cbuf, so, h, w, max_components=64)
        assert_stats_equal(ref, new2)


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


def test_compact_slot_smem_budget_guard():
    """Compact-slot prefetch arrays past the ~1 MB SMEM budget must fail
    at trace time with an actionable error, not an opaque Mosaic
    compile error (measured on v5e: batch 512 @1080p -> 1.13 MB operand
    -> 'Allocation would exceed memory (space=smem)')."""
    import pytest

    N, H, W = 512, 1080, 1920
    Hp, Wp = 1088, 2048  # 512*68*8*4 B = 1.11 MB slot array
    mp = jnp.zeros((N, Hp, Wp), jnp.uint8)
    so = jnp.zeros((N, Hp // 2, Wp // 256), jnp.uint8)
    with pytest.raises(ValueError, match="SMEM"):
        label_components_tiled_raw(
            mp, so, H, W, frames_per_step=4, compact_slots=32
        )


def test_row_frontier_full_ring_spiral():
    """A single component running around all four image edges (a closed
    ring) spans every boundary tile and must propagate its min key both
    forward and backward across several passes. Regression guard for the
    row-granular ring-change frontier (gen 5): the raw kernel emits ONE
    flag per (group, tile-row) and _frontier_rows re-expands it to tiles
    — if the row superset argument (or the backward-pass row reflection)
    were wrong, the loop would exit converged with the ring split."""
    mask = np.zeros((2, 192, 768), np.uint8)
    mask[0, 0:2, :] = 255
    mask[0, :, 766:768] = 255
    mask[0, 190:192, :] = 255
    mask[0, :, 0:2] = 255
    # second frame: same ring minus the top edge -> a C shape whose min
    # key sits mid-left, still multi-pass
    mask[1] = mask[0]
    mask[1, 0:2, :] = 0
    refs = run_ref(mask)
    new, conv = run_raw(mask, 192, 768)
    assert conv
    assert (np.asarray(new["count"]) == 1).all()
    assert_stats_equal(refs, new)


def test_labels_from_raw_matches_dense():
    """Opt-in dense label maps from the raw buffer + root table are
    bit-equal to the dense path's cv2-id labels (golden vs cv2), with
    the buffers POISONED so any unmasked read corrupts the map."""
    from tpuva.ops import connected_components_with_stats
    from tpuva.ops.label import labels_from_raw

    rng = np.random.default_rng(41)
    scenes = [
        ((rng.random((2, 150, 700)) < 0.04).astype(np.uint8) * 255,
         150, 700),
        ((rng.random((3, 64, 256)) < 0.3).astype(np.uint8) * 255, 64, 256),
    ]
    scenes[0][0][1] = 0  # empty frame: all-zero label map expected
    for mask, h, w in scenes:
        m = jnp.asarray(mask)
        Hp, Wp = -(-h // 64) * 64, -(-w // 256) * 256
        mp = jnp.pad(m, ((0, 0), (0, Hp - h), (0, Wp - w)))
        o1 = lax.reduce_window(
            mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
        )
        so = lax.reduce_window(
            o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
        )
        labraw, conv = label_components_tiled_raw(
            mp, so, h, w, frames_per_step=4, debug_poison=True
        )
        assert bool(conv)
        stats = _stats_from_raw(labraw, so, h, w, max_components=64)
        got = labels_from_raw(labraw, so, stats["root_table"], h, w)
        ref = connected_components_with_stats(
            m, max_components=64, compute_labels=True, compute_bbox=False
        )["labels"]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_labels_from_raw_masks_key_aliasing_garbage():
    """The 0x5A5A5A5A poison can never alias a real scan key (keys <
    SENT << poison), so the poisoned e2e test above cannot prove the
    occupancy gate against the WORST garbage: a stale buffer region
    holding a key that IS in the root table. Hand-craft that case."""
    from tpuva.ops.label import _scan_key, labels_from_raw

    h = w = 64
    Wp = 256
    _k, _i, sent_base = _scan_key(h, w, 8)
    SENT = sent_base + 1
    # component = single pixel (0, 0): root key 0
    labraw = np.zeros((1, h + 16, Wp + 512), np.int32)  # 0 == root key!
    # occupied strip (row-pair 0, chunk 0): kernel-written contents —
    # SENT background except the component pixel
    labraw[0, 8:10, 256:512] = SENT
    labraw[0, 8, 256] = 0
    so = np.zeros((1, h // 2, Wp // 256), np.uint8)
    so[0, 0, 0] = 1
    table = np.full((1, 64), sent_base + 2, np.int32)
    table[0, 0] = 0
    got = np.asarray(
        labels_from_raw(
            jnp.asarray(labraw), jnp.asarray(so), jnp.asarray(table), h, w
        )
    )
    want = np.zeros((1, h, w), np.int32)
    want[0, 0, 0] = 1  # ONLY the real component pixel; every aliasing
    # garbage pixel outside the occupied strip must stay background
    np.testing.assert_array_equal(got, want)


def test_exact_pass1_flag_right_to_left_improvement():
    """Gen-6 exact pass-1 flag: a component straddling a 256-col tile
    boundary with its MIN key on the RIGHT side forces the right tile to
    flag (it can improve its already-visited left neighbor); skipping
    that flag would end pass 1 'converged' with the left part stale."""
    mask = np.zeros((2, 64, 512), np.uint8)
    # frame 0: horizontal bar crossing col 256, topmost pixel on the right
    mask[0, 10, 250:270] = 255   # bar row
    mask[0, 8, 260:262] = 255    # topmost block in the RIGHT tile
    mask[0, 9, 255:262] = 255    # connect top block to the bar
    # frame 1: U through the tile BELOW — two arms in the top tile row
    # joined only via the bottom tile, so the bottom tile must improve
    # its earlier-visited top neighbor in pass 2
    mask[1, 50:64, 100:103] = 255   # left arm (top tile, exits bottom)
    mask[1, 50:64, 200:203] = 255   # right arm
    mask[1, 63, 100:203] = 255      # bridge: bottom edge row of the top tile
    ref = run_ref(mask)
    new, conv = run_raw(mask, 64, 512)
    assert conv
    assert_stats_equal(ref, new)
    # truly cross-tile-row U: arms reach into the second tile row
    mask2 = np.zeros((1, 128, 256), np.uint8)
    mask2[0, 40:80, 50:53] = 255    # left arm spans rows 40..79 (2 tiles)
    mask2[0, 40:80, 150:153] = 255  # right arm
    mask2[0, 78:80, 50:153] = 255   # bridge lives in the BOTTOM tile
    ref2 = run_ref(mask2)
    new2, conv2 = run_raw(mask2, 128, 256)
    assert conv2
    assert_stats_equal(ref2, new2)
