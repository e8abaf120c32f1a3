"""Matcher model integration tests: methods, config variants, gain."""

import numpy as np
import pytest

from sfm_tpu.config import EngineConfig, MatcherParams, replace
from sfm_tpu.models.matcher import Matcher
from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

W, H = 320, 160
SCENE = SceneConfig(width=W, height=H, f=166.0, cu=160.0, cv=80.0,
                    wall_dist=6.0)
ENGINE = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                      max_matches=1024)


@pytest.fixture(scope="module")
def seq():
    return make_sequence(3, SCENE, step=0.4, baseline=0.5)


def flow_stats(m):
    """(count, median |flow|): forward motion gives radial flow, so the
    magnitude is the meaningful statistic (median du is ~0 by symmetry)."""
    n = int(m.count)
    du = np.asarray(m.u1c - m.u1p)[:n]
    dv = np.asarray(m.v1c - m.v1p)[:n]
    return n, float(np.median(np.hypot(du, dv)))


class TestMethods:
    def test_stereo_method(self, seq):
        left, right, _ = seq
        m = Matcher(MatcherParams(), ENGINE, dims=(W, H))
        m.push_back(left[0], right[0])
        m.match_features(1)
        mm = m.get_matches()
        n = int(mm.count)
        assert n > 50
        disp = np.asarray(mm.u1c - mm.u2c)[:n]
        dv = np.asarray(mm.v1c - mm.v2c)[:n]
        assert (disp >= 0).all()          # positive disparity enforced
        assert np.abs(np.median(dv)) <= 1  # rectified pair
        assert np.median(disp) > 1

    def test_flow_replace_keeps_old_previous(self, seq):
        left, _, _ = seq
        m = Matcher(MatcherParams(), ENGINE, dims=(W, H))
        m.push_back(left[0])
        m.push_back(left[1])
        m.push_back(left[2], replace=True)  # replaces current; prev stays f0
        m.match_features(0)
        n, mag2 = flow_stats(m.get_matches())
        assert n > 50
        # frame2 vs frame0: roughly double flow magnitude vs frame1 case
        m2 = Matcher(MatcherParams(), ENGINE, dims=(W, H))
        m2.push_back(left[0])
        m2.push_back(left[1])
        m2.match_features(0)
        _, mag1 = flow_stats(m2.get_matches())
        assert mag2 > mag1 * 1.3, (mag1, mag2)

    def test_single_stage(self, seq):
        left, _, _ = seq
        params = replace(MatcherParams(), multi_stage=0)
        m = Matcher(params, ENGINE, dims=(W, H))
        m.push_back(left[0])
        m.push_back(left[1])
        m.match_features(0)
        assert int(m.get_matches().count) > 50

    def test_full_resolution(self, seq):
        left, _, _ = seq
        params = replace(MatcherParams(), half_resolution=0)
        m = Matcher(params, ENGINE, dims=(W, H))
        m.push_back(left[0])
        m.push_back(left[1])
        m.match_features(0)
        assert int(m.get_matches().count) > 50

    def test_subpixel_refinement(self, seq):
        left, _, _ = seq
        params = replace(MatcherParams(), refinement=2)
        m = Matcher(params, ENGINE, dims=(W, H))
        m.push_back(left[0])
        m.push_back(left[1])
        m.match_features(0)
        mm = m.get_matches()
        n = int(mm.count)
        assert n > 30
        # subpixel: u1p values are non-integer for most matches
        frac = np.asarray(mm.u1p)[:n] % 1.0
        assert (np.abs(frac) > 1e-6).mean() > 0.5


class TestGain:
    def test_gain_detects_brightness_change(self, seq):
        left, _, _ = seq
        bright = np.clip(left[1].astype(np.int32) * 1.2, 0, 255).astype(np.uint8)
        m = Matcher(MatcherParams(), ENGINE, dims=(W, H))
        m.push_back(left[0])
        m.push_back(bright)
        m.match_features(0)
        n = int(m.get_matches().count)
        assert n > 30
        gain = m.get_gain(np.ones(ENGINE.max_matches, bool))
        assert 1.1 < gain < 1.35, gain

    def test_gain_without_frames_is_one(self):
        m = Matcher(MatcherParams(), ENGINE, dims=(W, H))
        assert m.get_gain(np.ones(ENGINE.max_matches, bool)) == 1.0


def test_parabolic_fitting_subpixel_accuracy(rng):
    """Parabolic refinement recovers a known sub-pixel shift (<0.3 px)."""
    import jax.numpy as jnp
    from scipy.ndimage import shift as ndshift

    from sfm_tpu.ops import filters
    from sfm_tpu.ops.refine import parabolic_fitting

    base = rng.rand(80, 120) * 255
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 1.5)
    img1 = base[:64, :96].astype(np.uint8)
    img2 = ndshift(base, (0.4, 0.3), order=3)[:64, :96].astype(np.uint8)
    du1, dv1 = filters.sobel5x5(img1)
    du2, dv2 = filters.sobel5x5(img2)
    u1 = jnp.asarray([30.0, 50.0, 40.0])
    v1 = jnp.asarray([30.0, 20.0, 40.0])
    # initial integer guess in img2 (true shift is +0.3, +0.4)
    u2, v2, ok = parabolic_fitting(du1, dv1, du2, dv2, u1, v1, u1, v1,
                                   jnp.float32(96), jnp.float32(64))
    ok = np.asarray(ok)
    assert ok.any()
    err_u = np.abs(np.asarray(u2) - (np.asarray(u1) + 0.3))[ok]
    err_v = np.abs(np.asarray(v2) - (np.asarray(v1) + 0.4))[ok]
    assert err_u.max() < 0.3 and err_v.max() < 0.3
