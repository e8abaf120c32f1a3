"""Long-horizon keyframe BA over a real 100+-frame sequence run
(VERDICT r4 item 3: lift the FRAME_CAP=8 in-pipeline ring into the
SURVEY §7 map/keyframe-block sharded BA capability).

End-to-end: fused stereo VO over a 110-frame curve drive -> unbounded
host-side track chaining -> distance-spaced keyframes -> fixed-capacity
BAProblem -> adaptive-LM Schur refinement, landmarks sharded over the
8-device virtual mesh. Asserts single-step sharded chi2 == unsharded,
chi2 decreases, and keyframe ATE vs ground truth improves after BA.
"""

import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(HERE, "..", "benchmarks"))


@pytest.fixture(scope="module")
def eval_out():
    from keyframe_ba_eval import run_eval

    return run_eval("curve", 110, use_mesh=True, verbose=False)


def test_keyframe_ba_chi2_decreases(eval_out):
    assert eval_out["n_frames"] >= 100
    assert eval_out["n_keyframes"] >= 20
    assert eval_out["n_landmarks"] >= 500
    assert eval_out["chi2_after_local"] < 0.8 * eval_out["chi2_initial"]


def test_keyframe_ba_sharded_matches_local(eval_out):
    """One sharded step's psum-reduced chi2 equals the unsharded step."""
    assert eval_out["mesh_devices"] == 8
    assert abs(eval_out["chi2_step_sharded"]
               - eval_out["chi2_step_local"]) <= (
        1e-5 * abs(eval_out["chi2_step_local"]))
    # end-state after 20 adaptive iterations stays equivalent (f32 psum
    # reduction order shifts individual accept/reject decisions slightly)
    assert eval_out["sharded_pose_max_diff_m"] < 0.5


def test_keyframe_ba_improves_ate(eval_out):
    assert eval_out["ate_after_local_m"] < eval_out["ate_before_m"], (
        eval_out["ate_after_local_m"], eval_out["ate_before_m"])


def test_track_accumulator_chains():
    """Unit check: tracks chain across frames via i1p == prev i1c and stop
    at reset_chain()."""
    from sfm_tpu.models.keyframe_ba import TrackAccumulator

    class M:
        def __init__(self, i1p, i1c, u1p, v1p, u1c, v1c):
            self.i1p = np.asarray(i1p)
            self.i1c = np.asarray(i1c)
            self.u1p = np.asarray(u1p, np.float64)
            self.v1p = np.asarray(v1p, np.float64)
            self.u1c = np.asarray(u1c, np.float64)
            self.v1c = np.asarray(v1c, np.float64)
            self.valid = np.ones(len(self.i1p), bool)

    acc = TrackAccumulator(8)
    # frame 1: features 0,1 (prev) -> 2,3 (cur)
    acc.push(M([0, 1], [2, 3], [10, 20], [1, 2], [11, 21], [1, 2]), 1)
    # frame 2: feature 2 continues as 4 (one track of length 3)
    acc.push(M([2], [4], [11], [1], [12], [1]), 2)
    tid, frame, u, v, ur, vr = acc.observations()
    assert np.isnan(ur).all()  # mono push records no right-image obs
    assert acc.n_tracks == 2
    t0 = tid[np.argmax(frame == 2)]  # track observed at frame 2
    obs0 = np.sort(frame[tid == t0])
    np.testing.assert_array_equal(obs0, [0, 1, 2])
    # chain break: same feature index no longer continues the track
    acc.reset_chain()
    acc.push(M([4], [5], [12], [1], [13], [1]), 3)
    assert acc.n_tracks == 3


def test_stereo_baseline_observations_ba():
    """obs_base stereo rows: a BA problem whose observations include
    rigid-baseline right-camera measurements must converge to the true
    geometry (the projection shifts by -b along camera x; Jacobians are
    unchanged)."""
    import jax.numpy as jnp

    from sfm_tpu.parallel.ba import BAProblem, run_ba

    rng = np.random.RandomState(3)
    f, cu, cv, b = 500.0, 320.0, 160.0, 0.5
    n_cams, n_pts = 4, 64
    gt_tr = np.zeros((n_cams, 6), np.float32)
    gt_tr[:, 5] = -np.arange(n_cams)          # cameras along +z
    pts = np.stack([rng.uniform(-8, 8, n_pts),
                    rng.uniform(-4, 4, n_pts),
                    rng.uniform(10, 40, n_pts)], 1)
    K = 6  # 3 keyframes x (left, right)
    obs_cam = np.stack([rng.choice(n_cams, 3, replace=False)
                        for _ in range(n_pts)])
    obs_cam = np.concatenate([obs_cam, obs_cam], 1)       # [n_pts, 6]
    obs_base = np.zeros((n_pts, K), np.float32)
    obs_base[:, 3:] = b
    xc = pts[:, None, :] + np.concatenate(
        [np.zeros((n_pts, K, 2)), gt_tr[obs_cam][..., 5:6]], -1)
    xs = xc[..., 0] - obs_base
    uv = np.stack([f * xs / xc[..., 2] + cu,
                   f * xc[..., 1] / xc[..., 2] + cv], -1)
    cam_noise = rng.randn(n_cams, 6).astype(np.float32) * 0.005
    cam_noise[:2] = 0.0  # the gauge-fixed cameras stay at ground truth
    prob = BAProblem(
        cam_tr=jnp.asarray(gt_tr + cam_noise, jnp.float32),
        points=jnp.asarray(pts + rng.randn(n_pts, 3) * 0.3, jnp.float32),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_mask=jnp.ones((n_pts, K), bool),
        point_valid=jnp.ones((n_pts,), bool),
        obs_base=jnp.asarray(obs_base),
    )
    new, chi2 = run_ba(prob, (f, cu, cv), iters=10, damping=1e-3,
                       n_fixed=2)
    assert float(chi2) < 1.0, float(chi2)  # noiseless -> near-exact fit
    np.testing.assert_allclose(np.asarray(new.points), pts, atol=0.05)
    np.testing.assert_allclose(np.asarray(new.cam_tr), gt_tr, atol=5e-3)
