"""Golden tests: filters / NMS / descriptors vs the NumPy oracle.

Pattern follows the reference's randomized differential SIMD test
(test/simd.cpp:49-136): random inputs, exact equality in the valid region.
"""

import numpy as np
import pytest

import oracles
from sfm_tpu.ops import filters, nms, descriptors

MARGIN = oracles.MARGIN


def random_img(rng, h=64, w=96):
    return rng.randint(0, 256, size=(h, w)).astype(np.uint8)


def interior(a, m):
    return np.asarray(a)[m:-m, m:-m]


class TestFilters:
    def test_sobel5x5(self, rng):
        img = random_img(rng)
        du, dv = filters.sobel5x5(img)
        odu, odv = oracles.sobel5x5(img)
        np.testing.assert_array_equal(interior(du, 2), interior(odu, 2))
        np.testing.assert_array_equal(interior(dv, 2), interior(odv, 2))

    def test_blob5x5(self, rng):
        img = random_img(rng)
        out = filters.blob5x5(img)
        ref = oracles.blob5x5(img)
        np.testing.assert_array_equal(interior(out, 2), interior(ref, 2))

    def test_checkerboard5x5(self, rng):
        img = random_img(rng)
        out = filters.checkerboard5x5(img)
        ref = oracles.checkerboard5x5(img)
        np.testing.assert_array_equal(interior(out, 2), interior(ref, 2))

    def test_half_resolution(self, rng):
        img = random_img(rng, 63, 97)  # odd dims exercise floor semantics
        out = filters.half_resolution(img, 31, 48)
        ref = oracles.half_resolution(img)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_integral_image(self, rng):
        img = random_img(rng, 16, 24)
        out = filters.integral_image(img)
        ref = img.astype(np.int64).cumsum(0).cumsum(1)
        np.testing.assert_array_equal(np.asarray(out), ref)

    def test_sobel_saturation_extremes(self):
        img = np.zeros((32, 32), np.uint8)
        img[:, 16:] = 255  # max-contrast vertical edge
        du, dv = filters.sobel5x5(img)
        odu, odv = oracles.sobel5x5(img)
        np.testing.assert_array_equal(interior(du, 2), interior(odu, 2))
        np.testing.assert_array_equal(interior(dv, 2), interior(odv, 2))


class TestNMS:
    @pytest.mark.parametrize("n", [3, 9])
    def test_matches_oracle(self, rng, n):
        h, w = 80, 120
        img = random_img(rng, h, w)
        f1 = np.asarray(filters.blob5x5(img))
        f2 = np.asarray(filters.checkerboard5x5(img))
        got = nms.nms_features(f1, f2, w=w, h=h, n=n, tau=50, cap=4096)
        cnt = int(got.count)
        got_list = [
            (int(got.u[i]), int(got.v[i]), int(got.val[i]), int(got.cls[i]))
            for i in range(cnt)
        ]
        ref_list = oracles.nms(f1, f2, w, h, n, 50)
        assert got_list == ref_list

    def test_padded_input(self, rng):
        """Logical dims smaller than array dims must give identical features."""
        h, w = 72, 100
        img = random_img(rng, h, w)
        f1 = np.asarray(filters.blob5x5(img))
        f2 = np.asarray(filters.checkerboard5x5(img))
        f1p = np.zeros((96, 128), np.int16)
        f2p = np.zeros((96, 128), np.int16)
        f1p[:h, :w], f2p[:h, :w] = f1, f2
        a = nms.nms_features(f1, f2, w=w, h=h, n=3, tau=50, cap=2048)
        b = nms.nms_features(f1p, f2p, w=w, h=h, n=3, tau=50, cap=2048)
        assert int(a.count) == int(b.count)
        k = int(a.count)
        np.testing.assert_array_equal(np.asarray(a.u[:k]), np.asarray(b.u[:k]))
        np.testing.assert_array_equal(np.asarray(a.v[:k]), np.asarray(b.v[:k]))

    def test_capacity_clamp(self, rng):
        h, w = 80, 120
        img = random_img(rng, h, w)
        f1 = np.asarray(filters.blob5x5(img))
        f2 = np.asarray(filters.checkerboard5x5(img))
        small = nms.nms_features(f1, f2, w=w, h=h, n=3, tau=50, cap=8)
        assert int(small.count) <= 8
        full = nms.nms_features(f1, f2, w=w, h=h, n=3, tau=50, cap=4096)
        # first 8 features agree
        np.testing.assert_array_equal(np.asarray(small.u), np.asarray(full.u[:8]))

    def test_sparse_nms_n(self):
        assert nms.sparse_nms_n(3) == 9
        assert nms.sparse_nms_n(4) == 10   # 12 > 10 -> max(4, 10)
        assert nms.sparse_nms_n(20) == 20  # 60 > 10 -> max(20, 10)


class TestDescriptors:
    def test_large_descriptor(self, rng):
        img = random_img(rng)
        du, dv = map(np.asarray, filters.sobel5x5(img))
        us = np.array([10, 20, 33], np.int32)
        vs = np.array([12, 40, 25], np.int32)
        got = np.asarray(descriptors.compute_descriptors(du, dv, us, vs))
        for i in range(len(us)):
            ref = oracles.descriptor(du, dv, int(us[i]), int(vs[i]))
            np.testing.assert_array_equal(got[i], ref)

    def test_small_descriptor(self, rng):
        img = random_img(rng)
        du, dv = map(np.asarray, filters.sobel5x5(img))
        us = np.array([10, 20, 33], np.int32)
        vs = np.array([12, 40, 25], np.int32)
        got = np.asarray(descriptors.compute_small_descriptors(du, dv, us, vs))
        for i in range(len(us)):
            ref = oracles.small_descriptor(du, dv, int(us[i]), int(vs[i]))
            np.testing.assert_array_equal(got[i], ref)
