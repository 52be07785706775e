"""Pallas fused front-end vs the jnp path (interpret mode on CPU):
bit-identical masks, rows, and carry (SURVEY.md §7.1 step 8 "keep jnp
fallback behind a flag")."""

import numpy as np

from refimpl.synthetic import moving_disk_clip, multi_blob_clip
from tpuva.graph.config import (
    BackgroundConfig,
    BlurConfig,
    MorphConfig,
    PipelineConfig,
    SegmentConfig,
    TrackConfig,
)
from tpuva.graph.pipeline import process_clip


def test_fused_matches_jnp_path_end_to_end():
    clip, _, plate = moving_disk_clip(
        h=100, w=140, frames=24, radius=8, noise_sigma=3.0, seed=3
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        morph_close=MorphConfig(ksize=3, shape="ellipse"),
        segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    r_jnp, c_jnp, m_jnp = process_clip(
        clip, cfg, background0=plate, return_masks=True
    )
    r_pls, c_pls, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp
    np.testing.assert_array_equal(
        np.asarray(c_pls.bg), np.asarray(c_jnp.bg)
    )


def test_fused_non_binomial_blur_matches_jnp_path():
    """The kernel's integer-tap correlation path (non-binomial kernels:
    k=7 fixed table, and sigma>0 error-diffusion taps) must stay
    bit-identical to the jnp twin's gaussian_blur_u8, including the
    final floor((acc + 2^15) >> 16) re-quantization."""
    clip, _, plate = moving_disk_clip(
        h=100, w=140, frames=16, radius=8, noise_sigma=3.0, seed=9
    )
    for blur in (BlurConfig(ksize=7, sigma=0.0), BlurConfig(ksize=5, sigma=1.5)):
        cfg = PipelineConfig(
            background=BackgroundConfig(alpha=0.05),
            blur=blur,
            morph_open=MorphConfig(ksize=3, shape="rect"),
            segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
            track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
            batch=8,
        )
        r_jnp, c_jnp, m_jnp = process_clip(
            clip, cfg, background0=plate, return_masks=True
        )
        r_pls, c_pls, m_pls = process_clip(
            clip, cfg, background0=plate, return_masks=True, use_pallas=True
        )
        np.testing.assert_array_equal(m_pls, m_jnp)
        assert r_pls == r_jnp
        np.testing.assert_array_equal(
            np.asarray(c_pls.bg), np.asarray(c_jnp.bg)
        )


def test_fused_first_frame_bg_init():
    clip, _, _ = moving_disk_clip(h=64, w=96, frames=16, radius=6, seed=4)
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.1),
        blur=BlurConfig(ksize=3, sigma=0.0),
        segment=SegmentConfig(threshold=30.0, min_area=10, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=3, max_tracks=8),
        batch=8,
    )
    r_jnp, _, m_jnp = process_clip(clip, cfg, return_masks=True)
    r_pls, _, m_pls = process_clip(
        clip, cfg, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp


def test_fused_no_blur_no_morph():
    clip, _, _, plate = multi_blob_clip(
        h=80, w=120, frames=12, n_blobs=3, radius=7, births_deaths=False
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.0),
        segment=SegmentConfig(threshold=40.0, min_area=15, max_blobs=8),
        track=TrackConfig(max_dist=40.0, death_patience=3, max_tracks=16),
        batch=6,
    )
    r_jnp, _, m_jnp = process_clip(clip, cfg, background0=plate, return_masks=True)
    r_pls, _, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp


def test_staged_path_matches_process_batch():
    """process_batch_staged (the TPU production path: fused kernel + tiled
    CCL + sparse-strip stats) must match the single-jit jnp path — run in
    interpret mode on CPU so CI covers it."""
    import jax.numpy as jnp

    from tpuva.graph.pipeline import (
        collect_rows,
        init_carry,
        process_batch,
        process_batch_staged,
    )

    clip, _, plate = moving_disk_clip(
        h=96, w=144, frames=16, radius=8, noise_sigma=2.0, seed=8
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    c1 = init_carry(cfg, 96, 144, plate)
    c2 = init_carry(cfg, 96, 144, plate)
    rows1, rows2 = [], []
    for s in range(0, 16, 8):
        b = jnp.asarray(clip[s : s + 8])
        c1, o1 = process_batch(cfg, c1, b)
        c2, o2 = process_batch_staged(cfg, c2, b)
        rows1.extend(collect_rows(o1["rows"], o1["row_valid"],
                                  row_sums=o1["row_sums"]))
        rows2.extend(collect_rows(o2["rows"], o2["row_valid"],
                                  row_sums=o2["row_sums"]))
        assert int(np.asarray(o2["stats_overflow"]).max()) == 0
    assert rows1 == rows2
    np.testing.assert_array_equal(np.asarray(c1.bg), np.asarray(c2.bg))


def test_staged_otsu_matches_process_batch():
    """The staged Otsu route (fused diff-emit kernel -> MXU histogram ->
    jnp morphology -> raw CCL tail) must be bit-identical to the jnp
    Otsu path (same rint quantize, strict compare, cv2 morphology)."""
    import jax.numpy as jnp

    from tpuva.graph.pipeline import (
        collect_rows,
        init_carry,
        process_batch,
        process_batch_staged,
    )

    clip, _, plate = moving_disk_clip(
        h=96, w=144, frames=16, radius=9, noise_sigma=2.0, seed=12
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold="otsu", min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    c1 = init_carry(cfg, 96, 144, plate)
    c2 = init_carry(cfg, 96, 144, plate)
    rows1, rows2 = [], []
    for s in range(0, 16, 8):
        b = jnp.asarray(clip[s : s + 8])
        c1, o1 = process_batch(cfg, c1, b)
        c2, o2 = process_batch_staged(cfg, c2, b)
        rows1.extend(collect_rows(o1["rows"], o1["row_valid"],
                                  row_sums=o1["row_sums"]))
        rows2.extend(collect_rows(o2["rows"], o2["row_valid"],
                                  row_sums=o2["row_sums"]))
        assert int(np.asarray(o2["stats_overflow"]).max()) == 0
    assert rows1 == rows2
    np.testing.assert_array_equal(np.asarray(c1.bg), np.asarray(c2.bg))


def test_padded_occ_output_matches_cropped():
    """fused_segment(padded_occ=True) must return (a) the same mask as the
    cropped path inside the image, (b) exact zeros outside it, and (c)
    occ128 equal to a reduce_window occupancy of the padded mask."""
    import jax.numpy as jnp
    from jax import lax

    from tpuva.ops.pallas import fused_segment

    clip, _, plate = moving_disk_clip(
        h=120, w=200, frames=6, radius=9, noise_sigma=4.0, seed=13
    )
    kw = dict(
        alpha=0.05, threshold=35.0, blur_ksize=5, blur_sigma=0.0,
        open_ksize=3, open_shape="rect",
    )
    f = jnp.asarray(clip)
    b0 = jnp.asarray(plate, dtype=jnp.float32)
    m_crop, bg_crop = fused_segment(f, b0, **kw)
    m_pad, bg_pad, occ = fused_segment(f, b0, padded_occ=True, **kw)
    assert m_pad.shape == (6, 128, 256)
    np.testing.assert_array_equal(
        np.asarray(m_pad)[:, :120, :200], np.asarray(m_crop)
    )
    assert int(np.asarray(m_pad)[:, 120:, :].max()) == 0
    assert int(np.asarray(m_pad)[:, :, 200:].max()) == 0
    np.testing.assert_array_equal(np.asarray(bg_pad), np.asarray(bg_crop))
    ref_occ = lax.reduce_window(
        m_pad, jnp.uint8(0), lax.max, (1, 2, 128), (1, 2, 128), "VALID"
    )
    np.testing.assert_array_equal(
        (np.asarray(occ) != 0), (np.asarray(ref_occ) != 0)
    )


def test_staged_padded_handoff_matches_process_batch():
    """Dims where the fused grid aligns to the CCL tiling (Hp%64==0,
    Wp%256==0) take the no-crop padded handoff — must still bit-match the
    single-jit jnp path, including the out-of-image margins."""
    import jax.numpy as jnp

    from tpuva.graph.pipeline import (
        collect_rows,
        init_carry,
        process_batch,
        process_batch_staged,
    )
    from tpuva.ops.pallas.fused_segment import fused_tile

    h, w = 120, 200
    _, _, hp, wp = fused_tile(h, w)
    assert hp % 64 == 0 and wp % 256 == 0  # guard: this IS the fast path
    clip, _, plate = moving_disk_clip(
        h=h, w=w, frames=16, radius=8, noise_sigma=2.0, seed=21
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=35.0, min_area=20, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    c1 = init_carry(cfg, h, w, plate)
    c2 = init_carry(cfg, h, w, plate)
    rows1, rows2 = [], []
    for s in range(0, 16, 8):
        b = jnp.asarray(clip[s : s + 8])
        c1, o1 = process_batch(cfg, c1, b)
        c2, o2 = process_batch_staged(
            cfg, c2, b, return_masks=True, return_labels=True
        )
        assert o2["masks"].shape == (8, h, w)
        # opt-in dense label maps ride the same staged dispatch: cv2-id
        # bit-equality vs the dense path on the pipeline's own masks
        from tpuva.ops import connected_components_with_stats

        ref_lab = connected_components_with_stats(
            o2["masks"], max_components=64, compute_labels=True,
            compute_bbox=False,
        )["labels"]
        np.testing.assert_array_equal(
            np.asarray(o2["labels"]), np.asarray(ref_lab)
        )
        rows1.extend(collect_rows(o1["rows"], o1["row_valid"],
                                  row_sums=o1["row_sums"]))
        rows2.extend(collect_rows(o2["rows"], o2["row_valid"],
                                  row_sums=o2["row_sums"]))
        assert int(np.asarray(o2["stats_overflow"]).max()) == 0
    assert rows1 == rows2
    np.testing.assert_array_equal(np.asarray(c1.bg), np.asarray(c2.bg))


def test_fused_with_median():
    """Fused median (k=3, BORDER_REPLICATE via clamped reads) bit-matches
    the jnp path, including image borders."""
    from tpuva.graph.config import MedianConfig

    clip, _, plate = moving_disk_clip(
        h=72, w=104, frames=16, radius=7, noise_sigma=6.0, seed=11
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.05),
        blur=BlurConfig(ksize=3, sigma=0.0),
        median=MedianConfig(ksize=3),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        segment=SegmentConfig(threshold=30.0, min_area=15, max_blobs=4),
        track=TrackConfig(max_dist=60.0, death_patience=5, max_tracks=8),
        batch=8,
    )
    r_jnp, c_jnp, m_jnp = process_clip(
        clip, cfg, background0=plate, return_masks=True
    )
    r_pls, c_pls, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp
    np.testing.assert_array_equal(np.asarray(c_pls.bg), np.asarray(c_jnp.bg))


def test_empty_batch_returns_empty():
    """N == 0 must answer without entering the kernel: the epilogue waits
    on the last frame's mask DMA, which an empty batch never starts — on
    hardware that wait would deadlock the core."""
    import jax.numpy as jnp

    from tpuva.ops.pallas.fused_segment import fused_segment

    bg0 = jnp.zeros((64, 128), jnp.float32)
    frames = jnp.zeros((0, 64, 128), jnp.uint8)
    m, bg = fused_segment(frames, bg0, alpha=0.1, threshold=20.0)
    assert m.shape == (0, 64, 128) and m.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(bg0))
    mp, bg2, occ = fused_segment(
        frames, bg0, alpha=0.1, threshold=20.0, padded_occ=True
    )
    assert mp.shape[0] == 0 and occ.shape[0] == 0
    assert mp.shape[1] % 2 == 0 and mp.shape[2] % 128 == 0


def test_fused_raw_window_path_matches_jnp():
    """(192, 1280) triggers the fused kernel's raw-window mode (H % 8 ==
    0, W % 128 == 0, window fits: no pre-pad, aligned over-read + VMEM
    rolls + edge-tile reflect fixes). gh == gw == 2, so all four border
    fix branches AND interior repositioning run; blur+open+close give a
    multi-pixel halo that crosses tile edges. Must stay bit-identical to
    the jnp path (which golden tests pin to cv2)."""
    clip, _, plate = moving_disk_clip(
        h=192, w=1280, frames=12, radius=9, noise_sigma=3.0, seed=7
    )
    cfg = PipelineConfig(
        background=BackgroundConfig(alpha=0.06),
        blur=BlurConfig(ksize=5, sigma=0.0),
        morph_open=MorphConfig(ksize=3, shape="rect"),
        morph_close=MorphConfig(ksize=3, shape="ellipse"),
        segment=SegmentConfig(threshold=32.0, min_area=15, max_blobs=4),
        track=TrackConfig(max_dist=80.0, death_patience=4, max_tracks=8),
        batch=6,
    )
    # confirm the gate is actually open for this geometry (else the test
    # silently degrades to re-testing the pre-pad fallback)
    from tpuva.ops.pallas.fused_segment import _ceil_to, fused_tile

    P = 5 // 2 + 3 // 2 * 2 + 3 // 2 * 2  # blur rb + open + close reach
    TH, TW, _, _ = fused_tile(192, 1280)
    SH = _ceil_to(TH + 2 * P, 8)
    SW = _ceil_to(TW + 2 * P, 128)
    assert 192 >= SH + _ceil_to(P, 32) and 1280 >= SW + _ceil_to(P, 128)

    r_jnp, c_jnp, m_jnp = process_clip(
        clip, cfg, background0=plate, return_masks=True
    )
    r_pls, c_pls, m_pls = process_clip(
        clip, cfg, background0=plate, return_masks=True, use_pallas=True
    )
    np.testing.assert_array_equal(m_pls, m_jnp)
    assert r_pls == r_jnp
    np.testing.assert_array_equal(np.asarray(c_pls.bg), np.asarray(c_jnp.bg))


def test_fused_raw_window_padded_occ():
    """Raw-window mode with padded_occ=True: the uncropped padded mask
    must equal the zero-padded cropped mask and occ128 must match a
    reduction of it (the CCL handoff contract), same as the pre-pad
    path's test_padded_occ_output_matches_cropped."""
    import jax.numpy as jnp

    from tpuva.ops.pallas.fused_segment import fused_segment

    rng = np.random.default_rng(5)
    frames = rng.integers(0, 255, (6, 192, 1280), np.uint8)
    bg0 = rng.uniform(0, 255, (192, 1280)).astype(np.float32)
    kw = dict(
        alpha=0.08, threshold=28.0, blur_ksize=5, blur_sigma=0.0,
        open_ksize=3, close_ksize=3,
    )
    m, bg = fused_segment(jnp.asarray(frames), jnp.asarray(bg0), **kw)
    mp, bgp, occ = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), padded_occ=True, **kw
    )
    Hp, Wp = mp.shape[1:]
    want = np.zeros((6, Hp, Wp), np.uint8)
    want[:, :192, :1280] = np.asarray(m)
    np.testing.assert_array_equal(np.asarray(mp), want)
    np.testing.assert_array_equal(np.asarray(bgp), np.asarray(bg))
    occ_want = (
        want.reshape(6, Hp // 2, 2, Wp // 128, 128).max(axis=(2, 4)) > 0
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(occ), occ_want)


def test_fused_fullwidth_ring_matches_prepad():
    """Full-width circular-column mode (round 4): a single tile column
    covering the whole width with the left halo wrapped to the ring's
    end. Forced via an explicit wide tile (gw == 1, TW >= W + 2P,
    W % 128 == 0); reference is the same kernel on the pre-pad fallback
    grid. Covers mask emit, diff emit, padded_occ, median, and a
    partial-bottom row grid — all bit-identical."""
    import jax.numpy as jnp

    from tpuva.ops.pallas.fused_segment import fused_segment

    rng = np.random.default_rng(11)
    H, W, N = 128, 256, 5
    frames = rng.integers(0, 255, (N, H, W), np.uint8)
    bg0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    kw = dict(
        alpha=0.07, threshold=30.0, blur_ksize=5, blur_sigma=0.0,
        median_ksize=3, open_ksize=3, open_shape="rect",
        close_ksize=3, close_shape="ellipse",
    )
    m_ref, bg_ref = fused_segment(jnp.asarray(frames), jnp.asarray(bg0), **kw)
    m_fw, bg_fw = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), tile=(32, 384), **kw
    )
    np.testing.assert_array_equal(np.asarray(m_fw), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(bg_fw), np.asarray(bg_ref))

    mp, bgp, occ = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), tile=(32, 384),
        padded_occ=True, **kw
    )
    Hp, Wp = mp.shape[1:]
    want = np.zeros((N, Hp, Wp), np.uint8)
    want[:, :H, :W] = np.asarray(m_ref)
    np.testing.assert_array_equal(np.asarray(mp), want)
    np.testing.assert_array_equal(np.asarray(bgp), np.asarray(bg_ref))
    occ_want = (
        want.reshape(N, Hp // 2, 2, Wp // 128, 128).max(axis=(2, 4)) > 0
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(occ), occ_want)

    kwd = dict(
        alpha=0.07, threshold=30.0, blur_ksize=5, blur_sigma=0.0,
        median_ksize=3,
    )
    d_ref, _ = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), emit="diff", **kwd
    )
    d_fw, _ = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), tile=(32, 384),
        emit="diff", **kwd
    )
    np.testing.assert_array_equal(np.asarray(d_fw), np.asarray(d_ref))


def test_fused_fullwidth_auto_tile_gate():
    """The tile=None auto-upgrade to the full-width ring engages ONLY
    when it preserves fused_tile's padded grid (graph/pipeline.py:400
    predicts (Hp, Wp) via fused_tile for the padded-occ -> CCL
    handoff): engaged at 1080p/1920w, declined at W=1024 (ring would
    need Wp=1280 > 1024) and at tiny heights (ring rows don't fit)."""
    from tpuva.ops.pallas.fused_segment import _auto_tile, fused_tile

    assert _auto_tile(1080, 1920, 4) == (96, 2048)   # production 1080p
    assert _auto_tile(208, 1920, 4) == (96, 2048)    # partial bottom row
    assert _auto_tile(2160, 3840, 4) == (96, 4096)   # 4K
    assert _auto_tile(208, 1024, 4) == (96, 1024)    # would break Wp=1024
    assert _auto_tile(1080, 1920, 0) == (96, 1024)   # no halo, no ring
    assert _auto_tile(1082, 1920, 4) == (96, 1024)   # H % 8 != 0
    # the engaged grids preserve fused_tile's padded (Hp, Wp)
    for (h, w) in ((1080, 1920), (208, 1920), (2160, 3840)):
        th, tw = _auto_tile(h, w, 4)
        _, _, hp, wp = fused_tile(h, w)
        assert (-(-h // th) * th, -(-w // tw) * tw) == (hp, wp)


def test_fused_fullwidth_auto_upgrade():
    """tile=None at a grid-preserving wide shape (W=1920: Wp stays
    2048) must auto-upgrade to the full-width ring grid and stay
    bit-identical to the explicit old multi-column grid — including a
    partial bottom row tile (H=208 -> gh=3 of TH=96)."""
    import jax.numpy as jnp

    from tpuva.ops.pallas.fused_segment import _auto_tile, fused_segment

    rng = np.random.default_rng(12)
    kw = dict(
        alpha=0.05, threshold=28.0, blur_ksize=5, blur_sigma=0.0,
        open_ksize=3, open_shape="rect", close_ksize=3,
        close_shape="ellipse",
    )
    N, H, W = 4, 208, 1920
    assert _auto_tile(H, W, 4) == (96, 2048), "upgrade must engage here"
    frames = rng.integers(0, 255, (N, H, W), np.uint8)
    bg0 = rng.uniform(0, 255, (H, W)).astype(np.float32)
    m_ref, bg_ref = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), tile=(96, 1024), **kw
    )
    mp, bgp, occ = fused_segment(
        jnp.asarray(frames), jnp.asarray(bg0), padded_occ=True, **kw
    )
    assert mp.shape[2] == 2048
    Hp, Wp = mp.shape[1:]
    want = np.zeros((N, Hp, Wp), np.uint8)
    want[:, :H, :W] = np.asarray(m_ref)
    np.testing.assert_array_equal(np.asarray(mp), want)
    np.testing.assert_array_equal(np.asarray(bgp), np.asarray(bg_ref))
    occ_want = (
        want.reshape(N, Hp // 2, 2, Wp // 128, 128).max(axis=(2, 4)) > 0
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(occ), occ_want)
