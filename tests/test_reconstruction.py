"""Reconstruction track-table tests with fabricated projective geometry."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.config import EngineConfig, ReconstructionParams
from sfm_tpu.models.reconstruction import Reconstruction
from sfm_tpu.ops.matching import empty_matches

F, CU, CV = 300.0, 160.0, 90.0


def project(T, X):
    xc = T[:3, :3] @ X + T[:3, 3]
    return np.array([F * xc[0] / xc[2] + CU, F * xc[1] / xc[2] + CV]), xc[2]


def forward_pose(i, step=0.5):
    T = np.eye(4)
    T[2, 3] = -i * step  # camera at z = +i*step looking +z
    return T


def make_matches(cap, pts_w, poses, k, visible):
    """Matches between frame k-1 and k for the given point subset."""
    m = empty_matches(cap)
    u1p = np.full(cap, -1, np.float32)
    v1p = np.full(cap, -1, np.float32)
    u1c = np.full(cap, -1, np.float32)
    v1c = np.full(cap, -1, np.float32)
    i1p = np.full(cap, -1, np.int32)
    i1c = np.full(cap, -1, np.int32)
    valid = np.zeros(cap, bool)
    for slot, pid in enumerate(visible):
        (up, vp), _ = project(poses[k - 1], pts_w[pid])
        (uc, vc), _ = project(poses[k], pts_w[pid])
        u1p[slot], v1p[slot] = up, vp
        u1c[slot], v1c[slot] = uc, vc
        i1p[slot] = pid
        i1c[slot] = pid
        valid[slot] = True
    return m._replace(
        u1p=jnp.asarray(u1p), v1p=jnp.asarray(v1p), i1p=jnp.asarray(i1p),
        u1c=jnp.asarray(u1c), v1c=jnp.asarray(v1c), i1c=jnp.asarray(i1c),
        valid=jnp.asarray(valid), count=jnp.int32(len(visible)))


def test_tracks_triangulate_to_ground_truth(rng):
    n_pts = 24
    pts_w = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-1, 1.4, n_pts),
                      rng.uniform(6, 14, n_pts)], 1)
    poses = [forward_pose(i) for i in range(7)]
    eng = EngineConfig(max_tracks=256, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(), eng)
    recon.set_calibration(F, CU, CV)

    cap = 64
    for k in range(1, 6):
        visible = list(range(n_pts)) if k <= 4 else []  # drop all at k=5
        mm = make_matches(cap, pts_w, poses, k, visible)
        rev = poses[k] @ np.linalg.inv(poses[k - 1])
        # min_angle=0.1: under pure forward motion, points near the motion
        # axis legitimately have ~0 deg ray angle (the default gate of 3 deg
        # is exercised by test_ray_angle_gate below)
        recon.update(mm, rev, point_type=0, min_track_length=2,
                     max_dist=30, min_angle=0.1)

    pts = recon.get_points()
    assert len(pts) >= n_pts * 0.8, f"only {len(pts)} of {n_pts} reconstructed"
    # recovered points are in the camera frame of the LAST update (k=5)
    gt_cam = (poses[5][:3, :3] @ pts_w.T + poses[5][:3, 3:4]).T
    # match each output point to nearest ground truth
    d = np.linalg.norm(pts[:, None, :] - gt_cam[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    assert np.median(nearest) < 0.05, np.median(nearest)


def test_ray_angle_gate(rng):
    """Forward motion: on-axis points have ~0 ray angle and must be dropped
    by min_angle=3 while wide-lateral points survive (reconstruction.cpp:213-229)."""
    pts_w = np.array([[0.05, 0.5, 8.0],    # on-axis: tiny angle
                      [4.0, 0.5, 6.0]])    # lateral: large angle
    poses = [forward_pose(i) for i in range(7)]
    eng = EngineConfig(max_tracks=64, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(), eng)
    recon.set_calibration(F, CU, CV)
    for k in range(1, 6):
        vis = [0, 1] if k <= 4 else []
        recon.update(make_matches(16, pts_w, poses, k, vis),
                     poses[k] @ np.linalg.inv(poses[k - 1]),
                     point_type=0, min_track_length=2, max_dist=30, min_angle=3)
    pts = recon.get_points()
    assert len(pts) == 1
    gt_cam = poses[5][:3, :3] @ pts_w[1] + poses[5][:3, 3]
    np.testing.assert_allclose(pts[0], gt_cam, atol=1e-3)


def test_short_tracks_rejected(rng):
    """min_track_length=3 must reject 2-observation tracks."""
    n_pts = 10
    pts_w = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-1, 1, n_pts),
                      rng.uniform(6, 12, n_pts)], 1)
    poses = [forward_pose(i) for i in range(4)]
    eng = EngineConfig(max_tracks=128, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(), eng)
    recon.set_calibration(F, CU, CV)
    cap = 32
    # single match round -> tracks of length 2, then lost
    recon.update(make_matches(cap, pts_w, poses, 1, list(range(n_pts))),
                 poses[1] @ np.linalg.inv(poses[0]))
    recon.update(make_matches(cap, pts_w, poses, 2, []),
                 poses[2] @ np.linalg.inv(poses[1]),
                 min_track_length=3)
    assert len(recon.get_points()) == 0


def test_max_track_length_drives_window(rng):
    """ReconstructionParams.max_track_length sizes the track table window:
    tracks stop extending at the cap and finalize as usual (the reference's
    max_track_length bound, reconstruction.h:118 with :97-103)."""
    n_pts = 12
    pts_w = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-1, 1.4, n_pts),
                      rng.uniform(6, 14, n_pts)], 1)
    poses = [forward_pose(i) for i in range(9)]
    eng = EngineConfig(max_tracks=128, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(max_track_length=4), eng)
    recon.set_calibration(F, CU, CV)
    assert recon._state.px_u.shape[1] == 4
    cap = 32
    for k in range(1, 8):
        visible = list(range(n_pts)) if k <= 6 else []
        recon.update(make_matches(cap, pts_w, poses, k, visible),
                     poses[k] @ np.linalg.inv(poses[k - 1]),
                     point_type=0, min_track_length=2, max_dist=30,
                     min_angle=0.0)
        # lengths never exceed the configured window
        assert int(np.asarray(recon._state.length).max()) <= 4
    pts = recon.get_points()
    assert len(pts) >= n_pts  # full tracks finalize at the cap and respawn
    gt_cam = (poses[7][:3, :3] @ pts_w.T + poses[7][:3, 3:4]).T
    d = np.linalg.norm(pts[:, None, :] - gt_cam[None, :, :], axis=-1)
    assert np.median(d.min(axis=1)) < 0.1


def test_track_capacity_overflow_drops_spawns(rng):
    eng = EngineConfig(max_tracks=8, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(), eng)
    recon.set_calibration(F, CU, CV)
    n_pts = 20  # more than capacity
    pts_w = np.stack([rng.uniform(-3, 3, n_pts), rng.uniform(-1, 1, n_pts),
                      rng.uniform(6, 12, n_pts)], 1)
    poses = [forward_pose(i) for i in range(3)]
    recon.update(make_matches(32, pts_w, poses, 1, list(range(n_pts))),
                 poses[1] @ np.linalg.inv(poses[0]))
    assert recon.n_active_tracks <= 8


def test_refine_map_windowed_ba(rng):
    """Active tracks wire into the windowed BA (parallel/ba.py): noisy
    observations still yield a consistent map, BA reduces chi2, and refined
    landmarks land near their triangulated ground truth."""
    n_pts = 24
    pts_w = np.stack([rng.uniform(-4, 4, n_pts), rng.uniform(-1, 1.4, n_pts),
                      rng.uniform(6, 14, n_pts)], 1)
    poses = [forward_pose(i) for i in range(6)]
    eng = EngineConfig(max_tracks=256, max_features_dense=64)
    recon = Reconstruction(ReconstructionParams(), eng)
    recon.set_calibration(F, CU, CV)
    for k in range(1, 5):  # tracks stay ACTIVE (never dropped)
        mm = make_matches(64, pts_w, poses, k, list(range(n_pts)))
        rev = poses[k] @ np.linalg.inv(poses[k - 1])
        recon.update(mm, rev, point_type=0, min_track_length=2,
                     max_dist=30, min_angle=0.1)
    assert recon.n_active_tracks >= n_pts

    pts1, valid1, cams1, chi1 = recon.refine_map(iters=1)
    pts5, valid5, cams5, chi5 = recon.refine_map(iters=6)
    assert valid5.sum() >= n_pts
    assert np.isfinite(chi5) and chi5 <= chi1 + 1e-3

    # ground truth in the last camera's frame
    Tl = poses[4]
    gt_cam = (Tl[:3, :3] @ pts_w.T).T + Tl[:3, 3]
    sel = valid5
    err = np.linalg.norm(pts5[sel][: n_pts] - gt_cam, axis=1)
    assert np.median(err) < 0.2, np.median(err)
