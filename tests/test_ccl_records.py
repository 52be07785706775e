"""Gen-8 single-pass CCL + record-level reconcile: bit-equality with the
converged multi-pass path.

label_components_tiled_raw(single_pass=True) stops after pass 1, leaving
each tile at a LOCAL fixed point only; _stats_from_compact(reconcile=True)
restores converged-equivalent stats exactly by unioning fragment roots at
the record level (_fragment_closure: tile-boundary pairs -> root-table
closure -> limb-sum merge). These tests pin:

- bit-equality of every stats field (incl. root_table and bbox) against
  the multi-pass kernel + reconcile=False on random and adversarial
  scenes (corner straddles, long cross-tile snakes, multi-fragment rows);
- the dx/dy-stream completeness case a per-pixel min over neighbor
  offsets would get wrong (one pixel diagonally adjacent to two distinct
  fragments below);
- poison-proofing: with debug_poison=True any reconcile read of a
  never-written compact region leaks 0x5A5A5A5A into the merge;
- strict capacity: root-table truncation (n_roots > max_components)
  reports reconcile_overflow > 0 instead of silently dropping unions;
  the boundary-pair streams themselves are capacity-unbounded (round-5
  chunked adjacency build — dense comb/arm scenes reconcile exactly).

Reference behavior: cv2.connectedComponentsWithStats semantics as pinned
by SURVEY.md §2.2/§8 (the multi-pass path is golden-tested against cv2 in
tests/test_ccl_raw.py / test_ops_golden.py; equality here is transitive).
"""

import numpy as np
import jax.numpy as jnp
from jax import lax

from tpuva.ops.label import _stats_from_compact, extract_detections
from tpuva.ops.pallas.ccl import label_components_tiled_raw

CMP_KEYS = (
    "count", "area", "centroid", "centroid_sum", "overflow", "root_table",
)


def run_compact(mask: np.ndarray, H: int, W: int, single_pass: bool,
                compact_slots: int = 24, max_components: int = 64,
                compute_bbox: bool = False, debug_poison: bool = False):
    m = jnp.asarray(mask)
    Hp, Wp = -(-H // 64) * 64, -(-W // 256) * 256
    mp = jnp.pad(m, ((0, 0), (0, Hp - H), (0, Wp - W)))
    o1 = lax.reduce_window(
        mp, jnp.uint8(0), lax.max, (1, 1, 256), (1, 1, 256), "VALID"
    )
    so = lax.reduce_window(
        o1, jnp.uint8(0), lax.max, (1, 2, 1), (1, 2, 1), "VALID"
    )
    labraw, cbuf, conv = label_components_tiled_raw(
        mp, so, H, W, frames_per_step=4, compact_slots=compact_slots,
        single_pass=single_pass, debug_poison=debug_poison,
    )
    stats = _stats_from_compact(
        cbuf, so, H, W, max_components=max_components,
        compute_bbox=compute_bbox, reconcile=single_pass,
    )
    return stats, bool(conv)


def assert_stats_equal(sa, sb, bbox=False):
    keys = CMP_KEYS + (("bbox",) if bbox else ())
    for k in keys:
        np.testing.assert_array_equal(
            np.asarray(sa[k]), np.asarray(sb[k]), err_msg=k
        )


def both(mask, H, W, **kw):
    s1, c1 = run_compact(mask, H, W, single_pass=True, **kw)
    s0, c0 = run_compact(mask, H, W, single_pass=False, **kw)
    assert c0 and c1
    assert int(np.asarray(s1["reconcile_overflow"]).max()) == 0
    assert int(np.asarray(s0["reconcile_overflow"]).max()) == 0
    assert_stats_equal(s1, s0, bbox=kw.get("compute_bbox", False))
    return s1, s0


def test_random_masks_match_multipass():
    # randomly placed disks (many straddling tile boundaries by chance)
    # within root-table capacity; dense IID noise exceeds max_components
    # by hundreds of fragments and is a strict-overflow scene by contract
    # (test_reconcile_overflow_reported), not an equality scene
    rng = np.random.default_rng(7)
    for H, W in ((64, 256), (100, 300), (130, 520), (190, 270)):
        yy, xx = np.mgrid[0:H, 0:W]
        m = np.zeros((3, H, W), np.uint8)
        for t in range(3):
            for _ in range(12):
                cy = int(rng.integers(0, H))
                cx = int(rng.integers(0, W))
                r = int(rng.integers(1, 9))
                m[t][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
        both(m, H, W, compact_slots=48, max_components=128)


def test_corner_straddle_blobs():
    # disks centered exactly on (64, 256)-tile corners: every blob
    # fragments across 4 tiles — the multi-pass kernel's worst case and
    # the single-pass reconcile's bread and butter
    H, W = 192, 512
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((2, H, W), np.uint8)
    for cy, cx in ((64, 256), (128, 256), (64, 32), (128, 480)):
        m[0][(yy - cy) ** 2 + (xx - cx) ** 2 <= 81] = 255
    for cy, cx in ((63, 255), (65, 257)):
        m[1][(yy - cy) ** 2 + (xx - cx) ** 2 <= 49] = 255
    s1, _ = both(m, H, W, compute_bbox=True)
    assert int(np.asarray(s1["count"])[0]) == 4


def test_long_snake_closure_depth():
    # a 1-px path zig-zagging through many tiles: the fragment chain is
    # long, exercising the pointer-jumping closure depth
    H, W = 320, 512
    m = np.zeros((1, H, W), np.uint8)
    x = 5
    for ty in range(0, H, 64):
        m[0, ty:ty + 64, x] = 255  # vertical run through the tile row
        nx = W - 6 if x == 5 else 5
        m[0, ty + 63, min(x, nx):max(x, nx) + 1] = 255  # horizontal link
        x = nx
    s1, _ = both(m, H, W)
    assert int(np.asarray(s1["count"])[0]) == 1


def test_diagonal_two_distinct_fragments():
    # one pixel on a tile's bottom row diagonally adjacent to TWO
    # distinct fragments below that touch nothing else: a per-pixel min
    # over dx would drop one of the two edges and split the component
    H, W = 128, 256
    m = np.zeros((1, H, W), np.uint8)
    x = 40
    m[0, 63, x] = 255          # above the tile boundary
    m[0, 64, x - 1] = 255      # below-left diagonal fragment
    m[0, 64, x + 1] = 255      # below-right diagonal fragment
    s1, s0 = both(m, H, W)
    assert int(np.asarray(s1["count"])[0]) == 1
    assert int(np.asarray(s1["area"])[0, 1]) == 3


def test_corner_only_adjacency():
    # components connected ONLY through the single-pixel tile-corner
    # diagonals (both orientations), incl. across tile columns
    H, W = 128, 512
    m = np.zeros((2, H, W), np.uint8)
    m[0, 63, 255] = 255
    m[0, 64, 256] = 255  # BR corner across both boundaries
    m[1, 63, 256] = 255
    m[1, 64, 255] = 255  # BL corner across both boundaries
    s1, _ = both(m, H, W)
    assert np.asarray(s1["count"]).tolist() == [1, 1]
    assert np.asarray(s1["area"])[:, 1].tolist() == [2, 2]


def test_horizontal_straddle_and_detections():
    # blobs straddling the 256-col tile boundary; detections (the
    # tracker's actual input) must match exactly, incl. id order
    H, W = 128, 512
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((3, H, W), np.uint8)
    rng = np.random.default_rng(3)
    for t in range(3):
        for cx in (256, 100, 400):
            cy = int(rng.integers(20, 100))
            m[t][(yy - cy) ** 2 + (xx - cx) ** 2 <= 64] = 255
    s1, s0 = both(m, H, W)
    d1 = extract_detections(s1, min_area=5, max_blobs=8)
    d0 = extract_detections(s0, min_area=5, max_blobs=8)
    for a, b in zip(d1, d0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_poisoned_single_pass():
    # hostile sentinel in every never-written compact region: any
    # reconcile read outside the occupancy-masked slots corrupts stats
    rng = np.random.default_rng(11)
    H, W = 130, 300
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((2, H, W), np.uint8)
    for t in range(2):
        for _ in range(10):
            cy = int(rng.integers(0, H))
            cx = int(rng.integers(0, W))
            r = int(rng.integers(1, 9))
            m[t][(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 255
    s1, _ = run_compact(m, H, W, single_pass=True, debug_poison=True)
    s0, _ = run_compact(m, H, W, single_pass=False)
    assert int(np.asarray(s1["reconcile_overflow"]).max()) == 0
    assert_stats_equal(s1, s0)


def test_recurring_pair_runs_no_overflow():
    # advisor r4 repro: ONE surviving pair touching a boundary row in
    # many disjoint contact intervals (comb teeth). Run-head counting
    # inflated reconcile_overflow (~73) and tripped strict mode on a
    # legal scene; distinct-pair compaction must report 0 and stay
    # bit-equal. Frame 0: 30 one-px teeth (interval recurrence + dx-echo
    # duplicates); frame 1: three 10-px-wide teeth (contiguous lane runs
    # of the same pair).
    H, W = 128, 256
    m = np.zeros((2, H, W), np.uint8)
    for t in (0, 1):
        m[t, 0:71, 0] = 255       # anchor arm: smallest key, crosses x=0
        m[t, 55, 8:250] = 255     # bar B in the top tile
        m[t, 70, :] = 255         # bar in the lower tile joins everything
    for k in range(30):
        m[0, 55:71, 8 + 8 * k] = 255      # 1-px teeth across the boundary
    for k in range(3):
        x = 20 + 60 * k
        m[1, 55:71, x:x + 10] = 255       # wide teeth: same-pair lane runs
    s1, s0 = both(m, H, W)
    assert np.asarray(s1["count"]).tolist() == [1, 1]


def test_distinct_pairs_at_capacity_no_overflow():
    # 15 distinct (arm_key, anchor_key) pairs witnessed on one 256-px
    # boundary row (the round-4 design's near-capacity case; pair
    # streams are now capacity-unbounded). Must reconcile exactly with
    # overflow 0.
    H, W = 128, 256
    m = np.zeros((1, H, W), np.uint8)
    m[0, 0:71, 0] = 255  # anchor arm: smallest key, crosses at x=0
    for k in range(15):
        x = 8 + 16 * k
        m[0, 60:71, x] = 255  # arms above+below the boundary
    m[0, 70, :] = 255  # bar in the lower tile joins everything
    s1, s0 = both(m, H, W)
    assert int(np.asarray(s1["count"])[0]) == 1


def test_many_distinct_pairs_reconciled_exactly():
    # 20 DISTINCT back-propagation pairs in ONE 256-px boundary row: 20
    # arms above the tile boundary (distinct fragment keys), joined only
    # by a bar below it that adopts the x=0 anchor arm's smaller key via
    # the pass-1 halo — every arm crossing witnesses a distinct
    # (arm_key, anchor_key) pair. The round-4 design capped distinct
    # pairs per row at 16 and flagged this scene; the round-5 chunked
    # full-stream adjacency has no per-row capacity, so it must
    # reconcile EXACTLY with overflow 0.
    H, W = 128, 256
    m = np.zeros((1, H, W), np.uint8)
    m[0, 0:71, 0] = 255  # anchor arm: smallest key, crosses at x=0
    for k in range(20):
        x = 8 + 12 * k
        m[0, 60:71, x] = 255  # arms above+below the boundary
    m[0, 70, :] = 255  # bar in the lower tile joins everything
    s1, s0 = both(m, H, W)
    assert int(np.asarray(s1["count"])[0]) == 1


def test_root_table_truncation_overflow_reported():
    # the remaining strict-capacity condition: more roots than the
    # root-table width C. Isolated dots produce one root each; with
    # max_components=8 and 20 dots the table truncates, boundary pairs
    # (none here, so force some with a straddling bar scene) — the
    # per-frame reconcile_overflow must be > 0 instead of silently
    # merging into a wrong table.
    H, W = 128, 256
    m = np.zeros((1, H, W), np.uint8)
    for k in range(20):
        m[0, 10 + (k % 3) * 20, 5 + 12 * k] = 255  # 20 isolated roots
    m[0, 60:71, 40] = 255  # one straddling arm: a real boundary pair
    m[0, 70, 30:60] = 255
    s1, _ = run_compact(m, H, W, single_pass=True, compact_slots=24,
                        max_components=8)
    assert int(np.asarray(s1["reconcile_overflow"])[0]) > 0


def test_pipeline_staged_single_pass_rows_match():
    # end-to-end staged stage: same synthetic mask batch through
    # _post_mask_stage with and without single-pass CCL
    from tpuva.graph.config import PipelineConfig
    from tpuva.graph.pipeline import _post_mask_stage, init_carry

    H, W = 128, 512
    yy, xx = np.mgrid[0:H, 0:W]
    m = np.zeros((4, H, W), np.uint8)
    for t in range(4):
        m[t][(yy - 64) ** 2 + (xx - (250 + 2 * t)) ** 2 <= 100] = 255
    cfg = PipelineConfig()
    mask = jnp.asarray(m)
    bg = jnp.zeros((H, W), jnp.float32)
    outs = []
    for sp in (True, False):
        carry = init_carry(cfg, H, W)
        _c, out = _post_mask_stage(
            cfg, carry, mask, bg, ccl_single_pass=sp
        )
        outs.append(out)
    for k in ("rows", "row_valid", "row_sums", "stats_overflow"):
        np.testing.assert_array_equal(
            np.asarray(outs[0][k]), np.asarray(outs[1][k]), err_msg=k
        )
