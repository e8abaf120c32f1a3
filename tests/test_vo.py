"""Sequence-level VO tests on synthetic calibrated scenes (SURVEY.md §4c:
trajectory-error tests, since the reference validates by eye on Karlsruhe
data we don't have)."""

import numpy as np
import pytest

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig, MonoParams,
                            StereoParams)
from sfm_tpu.utils.synthetic import SceneConfig, make_sequence

W, H = 320, 160
CAL = Calibration(f=166.0, cu=160.0, cv=80.0)
SCENE = SceneConfig(width=W, height=H, f=166.0, cu=160.0, cv=80.0,
                    wall_dist=6.0)
ENGINE = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                      max_matches=1024)


class TestDrawSamples:
    def test_distinct_and_uniform(self):
        import jax
        import jax.numpy as jnp

        from sfm_tpu.ops.ransac import draw_samples

        n, count, k, iters = 64, 20, 8, 20000
        valid = jnp.arange(n) < count
        idx = np.asarray(draw_samples(jax.random.PRNGKey(3), valid, iters, k))
        # all indices in the valid prefix
        assert idx.min() >= 0 and idx.max() == count - 1
        # distinct within every sample
        assert all(len(set(row)) == k for row in idx)
        # per-index inclusion frequency uniform at k/count (binomial std
        # ~0.35% here; 4 sigma)
        freq = np.bincount(idx.ravel(), minlength=count) / iters
        np.testing.assert_allclose(freq, k / count, atol=0.015)

    def test_degenerate_count_below_k(self):
        import jax
        import jax.numpy as jnp

        from sfm_tpu.ops.ransac import draw_samples

        valid = jnp.arange(16) < 3  # count=3 < k=8
        idx = np.asarray(draw_samples(jax.random.PRNGKey(0), valid, 50, 8))
        assert idx.min() >= 0 and idx.max() <= 2  # stays in the valid prefix


class TestMonoVO:
    def test_synthetic_forward_motion(self):
        from sfm_tpu.models.mono import VisualOdometryMono

        frames, poses = make_sequence(4, SCENE, step=0.4)
        params = MonoParams(calib=CAL, height=1.6, pitch=0.0,
                            ransac_iters=200,
                            bucket=Bucketing(max_features=1000))
        vo = VisualOdometryMono(params, ENGINE, dims=(W, H))
        assert vo.process(frames[0]) is False  # no previous frame
        errs = []
        for i in range(1, 4):
            ok = vo.process(frames[i])
            assert ok, f"frame {i} failed"
            gt = poses[i] @ np.linalg.inv(poses[i - 1])
            est = vo.get_motion()
            errs.append(np.linalg.norm(est[:3, 3] - gt[:3, 3]))
            # rotation ~ identity
            assert np.abs(est[:3, :3] - np.eye(3)).max() < 0.03
        # mono scale from ground plane: within 30% of the 0.4 m step
        assert np.median(errs) < 0.12

    def test_featureless_frame_fails_gracefully(self):
        from sfm_tpu.models.mono import VisualOdometryMono

        params = MonoParams(calib=CAL, bucket=Bucketing(max_features=1000))
        vo = VisualOdometryMono(params, ENGINE, dims=(W, H))
        blank = np.full((H, W), 128, np.uint8)
        assert vo.process(blank) is False
        assert vo.process(blank) is False  # matching finds nothing
        np.testing.assert_array_equal(vo.get_motion(), np.eye(4))


class TestStereoVO:
    def test_synthetic_forward_motion(self):
        from sfm_tpu.models.stereo import VisualOdometryStereo

        left, right, poses = make_sequence(4, SCENE, step=0.5, baseline=0.5)
        params = StereoParams(calib=CAL, base=0.5)
        vo = VisualOdometryStereo(params, ENGINE, dims=(W, H))
        vo.process(left[0], right[0])
        for i in range(1, 4):
            ok = vo.process(left[i], right[i])
            assert ok, f"frame {i} failed"
            gt = poses[i] @ np.linalg.inv(poses[i - 1])
            est = vo.get_motion()
            # stereo is metric: ~15% of the 0.5 m step at this low test
            # resolution (full-res bench accuracy is ~1%, BASELINE.md)
            assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.08, (i, est[:3, 3])
            assert np.abs(est[:3, :3] - np.eye(3)).max() < 0.02

    def test_reweighting_toggle(self):
        """StereoParams.reweighting must actually switch the GN weighting
        (viso_stereo.cpp:265-269, toggle viso_stereo.h:41): off = unit
        weights, on = the 1/(|u-cu|/|cu|+0.05) taper."""
        import jax.numpy as jnp

        from sfm_tpu.ops.stereo_gn import residuals_and_jacobian

        rng = np.random.RandomState(5)
        tr = jnp.asarray(rng.uniform(-0.05, 0.05, 6), jnp.float32)
        pts = jnp.asarray(rng.uniform([-3, -1, 4], [3, 1, 12], (8, 3)),
                          jnp.float32)
        obs = jnp.asarray(rng.uniform([0, 0, 0, 0], [320, 160, 320, 160],
                                      (8, 4)), jnp.float32)
        wmask = jnp.ones(8, jnp.float32)
        calib = jnp.asarray([166.0, 160.0, 80.0, 0.5], jnp.float32)
        _, r_off, pred = residuals_and_jacobian(tr, pts, obs, wmask, calib,
                                                reweighting=False)
        _, r_on, _ = residuals_and_jacobian(tr, pts, obs, wmask, calib,
                                            reweighting=True)
        np.testing.assert_allclose(np.asarray(r_off), np.asarray(obs - pred),
                                   rtol=1e-6)
        w = 1.0 / (np.abs(np.asarray(obs)[:, 0] - 160.0) / 160.0 + 0.05)
        np.testing.assert_allclose(
            np.asarray(r_on), w[:, None] * np.asarray(obs - pred), rtol=1e-5)

        # end-to-end: reweighting=False still estimates the motion
        left, right, poses = make_sequence(3, SCENE, step=0.5, baseline=0.5)
        from sfm_tpu.models.stereo import VisualOdometryStereo

        params = StereoParams(calib=CAL, base=0.5, reweighting=False)
        vo = VisualOdometryStereo(params, ENGINE, dims=(W, H))
        vo.process(left[0], right[0])
        assert vo.process(left[1], right[1])
        gt = poses[1] @ np.linalg.inv(poses[0])
        assert np.linalg.norm(vo.get_motion()[:3, 3] - gt[:3, 3]) < 0.08

    def test_tr_prior_quad_prediction(self):
        """Second process() call uses Tr_delta prediction (viso_stereo.cpp:35)."""
        from sfm_tpu.models.stereo import VisualOdometryStereo

        left, right, poses = make_sequence(4, SCENE, step=0.5, baseline=0.5)
        params = StereoParams(calib=CAL, base=0.5)
        vo = VisualOdometryStereo(params, ENGINE, dims=(W, H))
        for i in range(3):
            vo.process(left[i], right[i])
        assert vo.Tr_valid
        ok = vo.process(left[3], right[3])
        assert ok


class TestSE3:
    def test_transformation_roundtrip(self, rng):
        import jax.numpy as jnp

        from sfm_tpu.ops import se3

        tr = jnp.asarray(rng.uniform(-0.3, 0.3, 6))
        T = se3.transformation_vector_to_matrix(tr)
        rx, ry, rz = se3.rotation_angles(np.asarray(T)[:3, :3])
        np.testing.assert_allclose([rx, ry, rz], np.asarray(tr)[:3], atol=1e-6)
        Ti = se3.se3_inverse(T)
        np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-6)
