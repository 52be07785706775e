"""Native host runtime (native/batcher.cpp via ctypes): ring-buffer batch
assembly, cv2-compatible fixed-point color conversion, and the native
BatchStager path. Skipped when the library hasn't been built
(`make -C native`)."""

import threading

import cv2
import numpy as np
import pytest

from tpuva.io.native import available, bgr2gray

pytestmark = pytest.mark.skipif(
    not available(), reason="native library not built (make -C native)"
)


def test_ring_roundtrip_with_padding():
    from tpuva.io.native import NativeBatcher

    frames = np.random.default_rng(0).integers(0, 256, (10, 32, 48), np.uint8)
    b = NativeBatcher((32, 48), batch=4, depth=2)

    def produce():
        for f in frames:
            b.push(f)
        b.close()

    t = threading.Thread(target=produce)
    t.start()
    got, valids = [], []
    while True:
        n, batch = b.pop()
        if n == 0:
            break
        valids.append(n)
        got.append(batch)
    t.join()
    assert valids == [4, 4, 2]
    np.testing.assert_array_equal(
        np.concatenate([g[:n] for g, n in zip(got, valids)]), frames
    )
    # tail batch padded by repeating the last frame
    np.testing.assert_array_equal(got[-1][3], frames[-1])


def test_bgr2gray_vs_cv2():
    img = np.random.default_rng(1).integers(0, 256, (40, 56, 3), np.uint8)
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    ours = bgr2gray(img)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1


def test_native_batch_stager():
    from tpuva.io import BatchStager, VideoMemory

    clip = np.random.default_rng(2).integers(0, 256, (11, 40, 64), np.uint8)
    stager = BatchStager(VideoMemory(clip), batch=4, use_native=True)
    seen = []
    for n, dev in stager:
        seen.append((n, np.asarray(dev)[:n]))
    assert [n for n, _ in seen] == [4, 4, 3]
    np.testing.assert_array_equal(
        np.concatenate([b for _, b in seen]), clip
    )
