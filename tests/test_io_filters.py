"""L1/L2 API tests: the video-iterator contract, file IO round-trips, the
decode pipe/fork, device staging, and the filter chain vs cv2 golden
behavior (BASELINE.json:5 "same video-iterator entry points, same
filter/segmenter composition")."""

import numpy as np
import cv2
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
    ref = cv2.GaussianBlur(clip[4].astype(np.float32), (5, 5), 0)
    got = v[4]
    assert np.abs(got.astype(np.float32) - ref).max() <= 3  # uint8 rounding


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
