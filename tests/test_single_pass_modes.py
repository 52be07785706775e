"""Single-pass CCL (gen 8) x every execution mode (VERDICT r4 item 3).

The record-reconcile single-pass kernel is bit-equality-pinned against
the converged multi-pass path at the op level (tests/test_ccl_records).
These tests pin the MODE lattice on the virtual 8-device CPU mesh
(SURVEY.md §4.2; Pallas runs in interpret mode):

- DP shard_map + single-chip lax.map multistream processors with
  ccl_single_pass=True match the dense-CCL processors row for row;
- StreamingPipeline(ccl_single_pass=True) matches the dense run and
  keeps checkpoint/resume equivalence (the config-4 machinery);
- the staged dispatch plumbing (force_staged CI knob) carries the flag;
- spatial-TP band output matches the single-chip single-pass rows
  (two independent convergence-free CCL implementations agree);
- the reconcile strict-capacity contract surfaces through the streaming
  driver: raise when strict, warn + count when not.

Shapes stay tiny: interpret-mode Pallas inside shard_map dominates CI
cost (CLAUDE.md suite-split discipline).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from refimpl.synthetic import moving_disk_clip
from tpuva.dist import (
    init_multistream_carry,
    make_multistream_processor,
    make_stream_mesh,
)
from tpuva.graph.config import (
    BackgroundConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.pipeline import collect_rows, init_carry, process_batch
from tpuva.graph.streaming import StreamingPipeline
from tpuva.io import VideoMemory

CFG = PipelineConfig(
    background=BackgroundConfig(alpha=0.03),
    segment=SegmentConfig(threshold=40.0, min_area=20, max_blobs=4),
    track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
    batch=8,
)


def make_streams(S, T=8, h=64, w=96):
    clips, plates = [], []
    for s in range(S):
        clip, _, plate = moving_disk_clip(h=h, w=w, frames=T, radius=6,
                                          seed=s)
        clips.append(clip)
        plates.append(plate)
    return np.stack(clips), np.stack(plates)


def run_multistream(fn, cfg, clips, plates, check_overflow=False):
    S, T, H, W = clips.shape
    carry = init_multistream_carry(cfg, H, W, S, background0=plates)
    rows_by_stream = [[] for _ in range(S)]
    for start in range(0, T, cfg.batch):
        chunk = jnp.asarray(clips[:, start:start + cfg.batch])
        carry, out = fn(carry, chunk)
        if check_overflow:
            assert int(np.asarray(out["stats_overflow"]).max()) == 0
            assert bool(np.asarray(out["ccl_converged"]).all())
        for s in range(S):
            rows_by_stream[s].extend(
                collect_rows(out["rows"][s], out["row_valid"][s],
                             row_sums=out["row_sums"][s])
            )
    return rows_by_stream


def test_dp_shard_map_single_pass_matches_dense():
    clips, plates = make_streams(S=8)
    mesh = make_stream_mesh(8)
    fn = make_multistream_processor(CFG, 8, mesh=mesh, use_pallas=False)
    fn_sp = make_multistream_processor(
        CFG, 8, mesh=mesh, use_pallas=False, ccl_single_pass=True
    )
    rows = run_multistream(fn, CFG, clips, plates)
    rows_sp = run_multistream(fn_sp, CFG, clips, plates,
                              check_overflow=True)
    assert rows_sp == rows


def test_single_chip_lax_map_single_pass_matches_dense():
    clips, plates = make_streams(S=3)
    fn = make_multistream_processor(CFG, 3, mesh=None, use_pallas=False)
    fn_sp = make_multistream_processor(
        CFG, 3, mesh=None, use_pallas=False, ccl_single_pass=True
    )
    rows = run_multistream(fn, CFG, clips, plates)
    rows_sp = run_multistream(fn_sp, CFG, clips, plates,
                              check_overflow=True)
    assert rows_sp == rows


def _rows_equal(a, b):
    fa = [(int(r[0]), int(r[1]), round(r[2], 3), round(r[3], 3), int(r[4]))
          for r in a]
    fb = [(int(r[0]), int(r[1]), round(r[2], 3), round(r[3], 3), int(r[4]))
          for r in b]
    return sorted(fa) == sorted(fb)


def test_streaming_single_pass_matches_and_resumes(tmp_path):
    clip, _, plate = moving_disk_clip(h=96, w=128, frames=32, radius=8,
                                      seed=11)
    dense = StreamingPipeline(CFG).run(VideoMemory(clip), background0=plate)
    sp = StreamingPipeline(CFG, ccl_single_pass=True)
    rows = sp.run(VideoMemory(clip), background0=plate)
    assert _rows_equal(rows, dense)
    assert sp.overflow_frames == 0

    # interrupted + resumed with the flag on == one uninterrupted run
    ckpt = str(tmp_path / "sp.npz")
    p1 = StreamingPipeline(
        CFG, checkpoint_path=ckpt, checkpoint_every=10**9,
        ccl_single_pass=True,
    )
    p1.run(VideoMemory(clip[:16]), background0=plate)
    p2 = StreamingPipeline(
        CFG, checkpoint_path=ckpt, checkpoint_every=10**9,
        ccl_single_pass=True,
    )
    rows2 = p2.run(VideoMemory(clip), background0=plate, resume=True)
    assert _rows_equal(rows2, dense)


def test_streaming_staged_forced_single_pass():
    # the staged two-dispatch path (production TPU route) with the flag,
    # forced onto the CPU backend via the CI knob
    clip, _, plate = moving_disk_clip(h=96, w=128, frames=16, radius=8,
                                      seed=11)
    dense = StreamingPipeline(CFG).run(VideoMemory(clip), background0=plate)
    sp = StreamingPipeline(
        CFG, use_pallas=True, force_staged=True, ccl_single_pass=True
    )
    rows = sp.run(VideoMemory(clip), background0=plate)
    assert _rows_equal(rows, dense)
    assert sp.overflow_frames == 0


def _over_capacity_clip(frames=8):
    # streamed twin of test_ccl_records'
    # test_root_table_truncation_overflow_reported: 20 distinct roots +
    # a straddling arm, run with max_components=8 so the reconcile's
    # root table truncates — the remaining strict-capacity condition
    # (the boundary-pair streams themselves are capacity-unbounded
    # since the round-5 chunked adjacency build; the 20-arm comb scene
    # now reconciles exactly and is an equality test in
    # test_ccl_records)
    H, W = 128, 256
    m = np.zeros((H, W), np.uint8)
    m[0:71, 0] = 255
    for k in range(20):
        m[60:71, 8 + 12 * k] = 255
    m[70, :] = 255
    clip = np.where(m[None] > 0, np.uint8(255), np.uint8(0))
    return np.repeat(clip, frames, axis=0), np.zeros((H, W), np.uint8)


def test_streaming_single_pass_strict_raises_past_capacity():
    import warnings

    clip, plate = _over_capacity_clip()
    cfg = CFG
    sp = StreamingPipeline(
        cfg, ccl_single_pass=True, strict=True, max_components=8
    )
    with pytest.raises(RuntimeError, match="capacity overflow"):
        sp.run(VideoMemory(clip), background0=plate)
    # non-strict: warn (from the drainer thread — warnings module state
    # is process-global), count, complete
    sp2 = StreamingPipeline(
        cfg, ccl_single_pass=True, strict=False, max_components=8
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sp2.run(VideoMemory(clip), background0=plate)
    assert any("capacity overflow" in str(x.message) for x in w)
    assert sp2.overflow_frames > 0


def test_spatial_tp_matches_single_chip_single_pass():
    # two independent convergence-free CCL implementations must agree:
    # the band-parallel spatial processor vs the single-chip single-pass
    # kernel + record reconcile
    from tpuva.dist.spatial import make_space_mesh, make_spatial_processor

    clip, _, plate = moving_disk_clip(h=64, w=96, frames=8, radius=6,
                                      seed=3)
    H, W = 64, 96
    n = 4
    smesh = make_space_mesh(n)
    sfn = make_spatial_processor(CFG, H, W, n, mesh=smesh)
    scarry = init_carry(CFG, H, W, plate)
    _c, sout = sfn(scarry, jnp.asarray(clip))

    carry = init_carry(CFG, H, W, plate)
    _c2, out = process_batch(
        CFG, carry, jnp.asarray(clip), ccl_single_pass=True
    )
    for k in ("rows", "row_valid", "row_sums"):
        np.testing.assert_array_equal(
            np.asarray(sout[k]), np.asarray(out[k]), err_msg=k
        )
