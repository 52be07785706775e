"""L1/L2 API tests: the video-iterator contract, file IO round-trips, the
decode pipe/fork, device staging, and the filter chain vs cv2 golden
behavior (BASELINE.json:5 "same video-iterator entry points, same
filter/segmenter composition")."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from refimpl.synthetic import moving_disk_clip
from tpuva.io import (
    BatchStager,
    VideoFile,
    VideoFileStack,
    VideoFileWriter,
    VideoFork,
    VideoMemory,
    VideoPipe,
    load_any_video,
)
from tpuva.filters import (
    FilterBackground,
    FilterBlur,
    FilterCrop,
    FilterFlip,
    FilterMedian,
    FilterMonochrome,
    FilterNormalize,
    FilterResize,
    FilterRotate,
    FilterTimeDifference,
)


def gray_clip(frames=12, h=48, w=64, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (frames, h, w), np.uint8
    )


def color_clip(frames=10, h=40, w=56, seed=1):
    return np.random.default_rng(seed).integers(
        0, 256, (frames, h, w, 3), np.uint8
    )


# ------------------------------------------------------------------- L1: IO
def test_video_memory_iteration_and_slicing():
    clip = gray_clip()
    v = VideoMemory(clip, fps=30.0)
    assert v.frame_count == 12 and v.size == (64, 48) and not v.is_color
    assert v.shape == (12, 48, 64) and len(v) == 12
    frames = [f for f in v]
    assert len(frames) == 12
    np.testing.assert_array_equal(frames[3], clip[3])
    np.testing.assert_array_equal(v[5], clip[5])
    np.testing.assert_array_equal(v[-1], clip[-1])
    sl = v[2:10:2]
    assert sl.frame_count == 4
    np.testing.assert_array_equal(sl[1], clip[4])
    np.testing.assert_array_equal(sl.to_array(), clip[2:10:2])


def test_video_memory_batches():
    clip = gray_clip(frames=10)
    v = VideoMemory(clip)
    got = list(v.iter_batches(4, pad_last=True))
    assert [n for n, _ in got] == [4, 4, 2]
    assert all(b.shape[0] == 4 for _, b in got)
    np.testing.assert_array_equal(got[2][1][1], clip[9])
    np.testing.assert_array_equal(got[2][1][3], clip[9])  # padded


def test_video_file_roundtrip(tmp_path):
    clip = gray_clip(frames=8)
    path = str(tmp_path / "clip.avi")
    with VideoFileWriter(path, fps=20.0) as w:
        for f in clip:
            w.write_frame(f)
    v = VideoFile(path, gray=True)
    assert v.frame_count == 8 and v.size == (64, 48)
    got = v.to_array()
    assert got.shape == clip.shape
    # MJPG is lossy: close but not exact
    assert np.abs(got.astype(int) - clip.astype(int)).mean() < 16
    # random access after sequential read
    f3 = v.get_frame(3)
    np.testing.assert_array_equal(f3, got[3])
    v.close()


def test_video_file_stack_and_factory(tmp_path):
    clips = [gray_clip(frames=5, seed=s) for s in range(3)]
    for i, c in enumerate(clips):
        with VideoFileWriter(str(tmp_path / f"rec_{i:03d}.avi"), fps=10) as w:
            for f in c:
                w.write_frame(f)
    stack = VideoFileStack(str(tmp_path / "rec_*.avi"), gray=True)
    assert stack.frame_count == 15
    np.testing.assert_array_equal(
        stack.get_frame(7).shape, clips[1][2].shape
    )
    v = load_any_video(str(tmp_path / "rec_*.avi"), gray=True)
    assert v.frame_count == 15
    single = load_any_video(str(tmp_path / "rec_000.avi"), gray=True)
    assert single.frame_count == 5
    stack.close()


def test_image_stack(tmp_path):
    clip = gray_clip(frames=4)
    for i, f in enumerate(clip):
        cv2.imwrite(str(tmp_path / f"img_{i:04d}.png"), f)
    v = load_any_video(str(tmp_path))
    assert v.frame_count == 4
    np.testing.assert_array_equal(v.get_frame(2), clip[2])  # png lossless


def test_video_pipe():
    clip = gray_clip(frames=20)
    pipe = VideoPipe(VideoMemory(clip), depth=4)
    got = np.stack([f for f in pipe])
    np.testing.assert_array_equal(got, clip)
    pipe.close()


def test_video_fork_lockstep():
    clip = gray_clip(frames=16)
    fork = VideoFork(VideoMemory(clip), clients=2, max_skew=4)
    a, b = fork[0], fork[1]
    ia, ib = iter(a), iter(b)
    for t in range(16):
        fa, fb = next(ia), next(ib)
        np.testing.assert_array_equal(fa, clip[t])
        np.testing.assert_array_equal(fb, clip[t])
    # skew beyond max raises
    fork2 = VideoFork(VideoMemory(clip), clients=2, max_skew=4)
    it = iter(fork2[0])
    with pytest.raises(RuntimeError):
        for _ in range(6):
            next(it)


def test_batch_stager():
    clip = gray_clip(frames=10)
    stager = BatchStager(VideoMemory(clip), batch=4)
    seen = []
    for n, dev_batch in stager:
        assert dev_batch.shape == (4, 48, 64)
        seen.append((n, np.asarray(dev_batch)[:n]))
    assert [n for n, _ in seen] == [4, 4, 2]
    np.testing.assert_array_equal(np.concatenate([b for _, b in seen]), clip)


# -------------------------------------------------------------- L2: filters
def test_filter_crop_and_quadrant():
    clip = gray_clip()
    v = FilterCrop(VideoMemory(clip), (10, 5, 20, 30))
    assert v.size == (20, 30)
    np.testing.assert_array_equal(v[2], clip[2, 5:35, 10:30])
    q = FilterCrop(VideoMemory(clip), "upper left")
    assert q.size == (32, 24)
    np.testing.assert_array_equal(q[0], clip[0, :24, :32])


def test_filter_monochrome_vs_cv2():
    clip = color_clip()
    v = FilterMonochrome(VideoMemory(clip))
    assert not v.is_color
    got = v[3]
    ref = cv2.cvtColor(clip[3], cv2.COLOR_BGR2GRAY)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_filter_blur_vs_cv2():
    clip = gray_clip()
    v = FilterBlur(VideoMemory(clip), sigma=0.0, ksize=5)
    # uint8 input takes cv2's uint8 fixed-point path — bit-exact
    np.testing.assert_array_equal(v[4], cv2.GaussianBlur(clip[4], (5, 5), 0))


def test_filter_median_exact():
    clip = gray_clip()
    v = FilterMedian(VideoMemory(clip), ksize=3)
    np.testing.assert_array_equal(v[2], cv2.medianBlur(clip[2], 3))


def test_filter_resize():
    clip = gray_clip()
    v = FilterResize(VideoMemory(clip), (32, 24))
    assert v.size == (32, 24)
    ref = cv2.resize(clip[1].astype(np.float32), (32, 24), interpolation=cv2.INTER_LINEAR)
    got = v[1].astype(np.float32)
    assert np.abs(got - ref).max() <= 2.0


def test_filter_resize_uint8_golden():
    """uint8 resize pinned vs cv2's fixed-point INTER_LINEAR: <=1 LSB
    across downscale, upscale, fractional, and anisotropic factors
    (cv2 uses 11-bit fixed-point coefficients; our float32 resample +
    round differs only where its truncation crosses a rounding boundary).
    Quantified-bound counterpart of the warp_affine <=2 LSB golden."""
    rng = np.random.default_rng(7)
    for (h0, w0) in [(48, 64), (37, 53)]:
        clip = rng.integers(0, 256, (3, h0, w0), np.uint8)
        for (w, h) in [(32, 24), (128, 96), (17, 13), (100, 75), (w0, h0)]:
            v = FilterResize(VideoMemory(clip), (w, h))
            got = v[1]
            assert got.dtype == np.uint8
            ref = cv2.resize(clip[1], (w, h), interpolation=cv2.INTER_LINEAR)
            assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, (
                (h0, w0, w, h)
            )
    # color frames resize per channel identically
    color = rng.integers(0, 256, (2, 40, 56, 3), np.uint8)
    v = FilterResize(VideoMemory(color), (28, 20))
    ref = cv2.resize(color[0], (28, 20), interpolation=cv2.INTER_LINEAR)
    assert np.abs(v[0].astype(int) - ref.astype(int)).max() <= 1


def test_filter_normalize_rotate_flip():
    clip = gray_clip()
    v = FilterNormalize(VideoMemory(clip), 0, 255)
    out = v[0]
    assert out.dtype == np.float32 and 0 <= out.min() and out.max() <= 1
    r = FilterRotate(VideoMemory(clip), 1)
    assert r.size == (48, 64)
    np.testing.assert_array_equal(r[0], np.rot90(clip[0]))
    f = FilterFlip(VideoMemory(clip), horizontal=True)
    np.testing.assert_array_equal(f[0], clip[0, :, ::-1])


def test_filter_time_difference():
    clip = gray_clip(frames=9)
    v = FilterTimeDifference(VideoMemory(clip))
    assert v.frame_count == 8
    np.testing.assert_array_equal(
        v[3], clip[4].astype(np.int16) - clip[3].astype(np.int16)
    )
    # batch path across boundaries equals per-frame path
    outs = []
    for n, stack in v.iter_batches(4):
        outs.append(stack[:n])
    got = np.concatenate(outs)
    ref = clip[1:].astype(np.int16) - clip[:-1].astype(np.int16)
    np.testing.assert_array_equal(got, ref)


def test_filter_background_sequential():
    clip, _, plate = moving_disk_clip(h=48, w=64, frames=20, radius=6)
    v = FilterBackground(VideoMemory(clip), alpha=0.1)
    outs = []
    for n, stack in v.iter_batches(8):
        outs.append(stack[:n])
    got = np.concatenate(outs)
    assert got.shape == clip.shape
    # reference semantics: running mean seeded from frame 0
    bg = clip[0].astype(np.float32)
    ref = []
    for f in clip.astype(np.float32):
        bg = 0.9 * bg + 0.1 * f
        ref.append(np.abs(f - bg))
    ref = np.clip(np.round(np.stack(ref)), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)
    with pytest.raises(NotImplementedError):
        v[3]


def test_filter_chain_composition():
    """The reference's universal entry point (SURVEY.md §3.1): nested
    filters iterate as one device program."""
    clip = color_clip(frames=12, h=48, w=64)
    chain = FilterBlur(
        FilterMonochrome(FilterCrop(VideoMemory(clip), (8, 8, 48, 32))),
        sigma=0.0,
        ksize=3,
    )
    assert chain.size == (48, 32) and not chain.is_color
    # iterator protocol
    frames = [f for f in chain]
    assert len(frames) == 12 and frames[0].shape == (32, 48)
    # equals the per-frame cv2 reference computation within rounding
    crop = clip[5, 8:40, 8:56]
    ref = cv2.GaussianBlur(
        cv2.cvtColor(crop, cv2.COLOR_BGR2GRAY).astype(np.float32), (3, 3), 0
    )
    assert np.abs(frames[5].astype(np.float32) - ref).max() <= 4
    # batch path equals frame path
    outs = []
    for n, stack in chain.iter_batches(5):
        outs.append(stack[:n])
    np.testing.assert_array_equal(np.concatenate(outs), np.stack(frames))


def test_parallel_decode_matches_sequential(tmp_path):
    """Seek-sharded pool reassembles the exact sequential decode stream
    (bit-equal frames in order), incl. a chunk size that misaligns with
    both the batch size and the clip length."""
    from tpuva.io import ParallelVideoReader

    clip = gray_clip(frames=37, seed=5)
    path = str(tmp_path / "pd.avi")
    with VideoFileWriter(path, fps=20.0) as w:
        for f in clip:
            w.write_frame(f)
    ref = VideoFile(path, gray=True).to_array()

    pv = ParallelVideoReader(path, workers=3, chunk=5, gray=True)
    assert pv.frame_count == 37 and pv.size == (64, 48)
    got = np.stack(list(pv))
    np.testing.assert_array_equal(got, ref)
    pv.close()

    # batch API + padded tail
    pv2 = ParallelVideoReader(path, workers=2, chunk=8, gray=True)
    outs = list(pv2.iter_batches(16, pad_last=True))
    assert [n for n, _ in outs] == [16, 16, 5]
    np.testing.assert_array_equal(
        np.concatenate([s for _, s in outs])[:37], ref
    )
    pv2.close()


def test_parallel_decode_stack_and_backward_access(tmp_path):
    """File-parallel decode over a VideoFileStack; backward random access
    falls back to the sequential handle and stays correct."""
    from tpuva.io import ParallelVideoReader

    clips = [gray_clip(frames=6, seed=s) for s in range(3)]
    for i, c in enumerate(clips):
        with VideoFileWriter(str(tmp_path / f"pp_{i:03d}.avi"), fps=10) as w:
            for f in c:
                w.write_frame(f)
    pat = str(tmp_path / "pp_*.avi")
    ref = VideoFileStack(pat, gray=True).to_array()

    pv = ParallelVideoReader(pat, workers=2, chunk=6, gray=True)
    assert pv.frame_count == 18
    got = np.stack([pv.get_frame(i) for i in range(18)])
    np.testing.assert_array_equal(got, ref)
    # frontier has moved past chunk 0: backward access uses the fallback
    np.testing.assert_array_equal(pv.get_frame(1), ref[1])
    pv.close()


def test_warp_affine_golden_vs_cv2():
    """Gather-based affine sampler vs cv2.warpAffine (INTER_LINEAR):
    float path matches tightly; uint8 within 2 LSB of cv2's 5-bit
    fixed-point kernel; both border modes; rectangular out size."""
    import cv2

    from tpuva.ops.warp import rotation_matrix, warp_affine

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 80), np.uint8)
    cases = [
        (rotation_matrix((39.5, 31.5), 33.0), (80, 64), "constant"),
        (rotation_matrix((10.0, 50.0), -122.5, scale=0.7), (60, 70),
         "replicate"),
        (np.array([[1.3, 0.2, -5.0], [-0.1, 0.8, 7.0]]), (96, 40),
         "constant"),
    ]
    for M, (w, h), border in cases:
        bflag = (
            cv2.BORDER_CONSTANT if border == "constant"
            else cv2.BORDER_REPLICATE
        )
        ref_f = cv2.warpAffine(
            img.astype(np.float32), M, (w, h), flags=cv2.INTER_LINEAR,
            borderMode=bflag,
        )
        got_f = np.asarray(
            warp_affine(jnp.asarray(img.astype(np.float32)), M,
                        out_size=(w, h), border=border)
        )
        np.testing.assert_allclose(got_f, ref_f, atol=1e-2, rtol=1e-5)
        ref_u = cv2.warpAffine(
            img, M, (w, h), flags=cv2.INTER_LINEAR, borderMode=bflag
        )
        got_u = np.asarray(
            warp_affine(jnp.asarray(img), M, out_size=(w, h),
                        border=border)
        )
        assert np.abs(got_u.astype(int) - ref_u.astype(int)).max() <= 2


def test_filter_rotate_arbitrary_angle():
    """FilterRotate(angle=...) matches cv2.warpAffine about the frame
    center; legacy turns= path unchanged; batch axis works."""
    import cv2

    from tpuva.filters import FilterRotate

    clip = gray_clip(frames=3)
    h, w = clip.shape[1:]
    M = cv2.getRotationMatrix2D(((w - 1) / 2.0, (h - 1) / 2.0), 20.0, 1.0)
    ref = np.stack([
        cv2.warpAffine(f, M, (w, h), flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_CONSTANT)
        for f in clip
    ])
    r = FilterRotate(VideoMemory(clip), angle=20.0)
    got = r.to_array()
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2
    with pytest.raises(ValueError):
        FilterRotate(VideoMemory(clip))
    with pytest.raises(ValueError):
        FilterRotate(VideoMemory(clip), turns=1, angle=5.0)


def test_filter_warp_affine_chain():
    """FilterWarpAffine composes in a chain and matches cv2 on the
    composed source."""
    import cv2

    from tpuva.filters import FilterCrop, FilterWarpAffine

    clip = gray_clip(frames=2)
    M = np.array([[0.9, 0.1, 3.0], [-0.05, 1.1, -2.0]])
    src = FilterCrop(VideoMemory(clip), (4, 2, 48, 40))
    f = FilterWarpAffine(src, M, out_size=(32, 24), border="replicate")
    got = f.to_array()
    ref = np.stack([
        cv2.warpAffine(c[2:42, 4:52], M, (32, 24),
                       flags=cv2.INTER_LINEAR,
                       borderMode=cv2.BORDER_REPLICATE)
        for c in clip
    ])
    assert got.shape == (2, 24, 32)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2
