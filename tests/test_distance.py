"""Exact EDT vs the scipy.ndimage oracle (SURVEY.md §2.2 scipy.ndimage
row): the iterated-parabolic-erosion decomposition must be EXACT, not
approximate — squared distances are compared as exact integers."""

import numpy as np
import pytest

scipy_ndi = pytest.importorskip("scipy.ndimage")

from tpuva.ops.distance import (  # noqa: E402
    distance_transform_edt,
    distance_transform_edt_sq,
)


def _cases():
    rng = np.random.default_rng(7)
    yield (rng.random((40, 56)) > 0.5)  # dense random
    yield (rng.random((33, 61)) > 0.95)  # sparse background (long runs)
    solid = np.ones((24, 48), bool)
    solid[12, 30] = False  # single seed
    yield solid
    ring = np.ones((32, 32), bool)
    ring[8:24, 8:24] = False
    ring[12:20, 12:20] = True  # island inside a hole
    yield ring


@pytest.mark.parametrize("idx", range(4))
def test_edt_sq_exact_vs_scipy(idx):
    mask = list(_cases())[idx]
    ref = scipy_ndi.distance_transform_edt(mask) ** 2
    got = np.asarray(distance_transform_edt_sq(mask))
    np.testing.assert_array_equal(np.rint(ref).astype(np.int64),
                                  got.astype(np.int64))


def test_edt_batched_and_sqrt():
    rng = np.random.default_rng(3)
    batch = rng.random((3, 28, 36)) > 0.6
    got = np.asarray(distance_transform_edt(batch))
    for i in range(3):
        ref = scipy_ndi.distance_transform_edt(batch[i])
        np.testing.assert_allclose(got[i], ref, rtol=0, atol=1e-5)


def test_edt_no_seed_is_inf():
    out = np.asarray(distance_transform_edt(np.ones((8, 16), np.uint8)))
    assert np.isinf(out).all()
    out0 = np.asarray(distance_transform_edt(np.zeros((8, 16), np.uint8)))
    assert (out0 == 0).all()
