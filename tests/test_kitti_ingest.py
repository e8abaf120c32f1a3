"""KITTI-layout ingest smoke test (VERDICT r3 item 8) + photometric-scene
gain validation.

No KITTI data ships in this environment, so the official directory layout is
fabricated from the synthetic world (3 stereo frames) and pushed through the
same load_sequence -> loaders -> fused-VO path benchmarks/kitti_eval.py uses
on real data.
"""

import os

import numpy as np
import pytest

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                            StereoParams)
from sfm_tpu.utils import kitti
from sfm_tpu.utils.synthetic import (SceneConfig, apply_photometrics,
                                     frame_exposure_gain, make_sequence)

W, H, F, CU, CV, BASE = 320, 160, 166.0, 160.0, 80.0, 0.5


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_root")
    sdir = root / "sequences" / "00"
    (sdir / "image_0").mkdir(parents=True)
    (sdir / "image_1").mkdir()
    (root / "poses").mkdir()

    cfg = SceneConfig(width=W, height=H, f=F, cu=CU, cv=CV, wall_dist=6.0)
    left, right, poses = make_sequence(3, cfg, step=0.5, baseline=BASE)
    for i in range(3):
        _write_pgm(sdir / "image_0" / f"{i:06d}.pgm", left[i])
        _write_pgm(sdir / "image_1" / f"{i:06d}.pgm", right[i])
    # calib.txt: P0 = K [I|0], P1 = K [I | (-f*base, 0, 0)^T]
    with open(sdir / "calib.txt", "w") as f:
        f.write(f"P0: {F} 0 {CU} 0 0 {F} {CV} 0 0 0 1 0\n")
        f.write(f"P1: {F} 0 {CU} {-F * BASE} 0 {F} {CV} 0 0 0 1 0\n")
    # poses file: cam->world 3x4 rows
    cam_to_world = [np.linalg.inv(T) for T in poses]
    np.savetxt(root / "poses" / "00.txt",
               np.stack([P[:3, :].reshape(12) for P in cam_to_world]))
    return str(root), poses


def test_load_sequence_parses_layout(kitti_tree):
    root, poses = kitti_tree
    seq = kitti.load_sequence(root, "00")
    assert seq.f == F and seq.cu == CU and seq.cv == CV
    assert abs(seq.base - BASE) < 1e-9
    assert seq.poses_gt.shape == (3, 4, 4)
    left, right = seq.loaders()
    assert left.get_dims() == (W, H)
    assert right is not None and right.n_frames == 3
    img = left.get_frame(1)
    assert img.shape == (H, W) and img.dtype == np.uint8
    # GT vs GT metric is exactly zero
    t_err, r_err, _ = kitti.kitti_errors(seq.poses_gt, seq.poses_gt,
                                         step=1, lengths=(0.4,))
    assert t_err == 0.0 and r_err == 0.0


def test_kitti_tree_through_fused_vo(kitti_tree):
    """The full kitti_eval.py path: loaders -> fused stereo step -> motion."""
    import jax
    import jax.numpy as jnp

    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step
    from sfm_tpu.ops.se3 import transformation_vector_to_matrix

    root, poses = kitti_tree
    seq = kitti.load_sequence(root, "00")
    left, right = seq.loaders()
    w, h = left.get_dims()
    engine = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                          max_matches=1024)
    params = StereoParams(calib=Calibration(f=seq.f, cu=seq.cu, cv=seq.cv),
                          base=seq.base, bucket=Bucketing(max_features=1000))
    step = make_stereo_frame_step(w, h, params, engine)
    p = params.match

    def detect(img):
        return detect_features(
            jnp.asarray(img), w=w, h=h, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    pl_, pr_ = detect(left.get_frame(0)), detect(right.get_frame(0))
    trp = jnp.eye(4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    for i in (1, 2):
        key, k = jax.random.split(key)
        pl_, pr_, _, res = step(pl_, pr_, jnp.asarray(left.get_frame(i)),
                                jnp.asarray(right.get_frame(i)), trp, k)
        assert bool(res.success), f"frame {i} failed"
        est = np.asarray(transformation_vector_to_matrix(res.tr))
        gt = poses[i] @ np.linalg.inv(poses[i - 1])
        assert np.linalg.norm(est[:3, 3] - gt[:3, 3]) < 0.08


def test_gain_estimate_tracks_exposure_drift():
    """compute_gain on a photometric-drift scene: the fused pipeline's
    getGain output (matcher.cpp:286-324) must track the applied per-frame
    exposure ratio end-to-end."""
    import jax
    import jax.numpy as jnp

    from sfm_tpu.models.matcher import detect_features
    from sfm_tpu.models.pipeline import make_stereo_frame_step

    cfg = SceneConfig(width=W, height=H, f=F, cu=CU, cv=CV, wall_dist=6.0,
                      exposure_amp=0.2, exposure_period=6.0, noise_sigma=1.0)
    left, right, poses = make_sequence(4, cfg, step=0.5, baseline=BASE)
    engine = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                          max_matches=1024, compute_gain=True)
    params = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV), base=BASE,
                          bucket=Bucketing(max_features=1000))
    step = make_stereo_frame_step(W, H, params, engine)
    p = params.match

    def detect(img):
        return detect_features(
            jnp.asarray(img), w=W, h=H, nms_n=p.nms_n, nms_tau=p.nms_tau,
            multi_stage=p.multi_stage, half_resolution=p.half_resolution,
            cap_sparse=engine.max_features_sparse,
            cap_dense=engine.max_features_dense)

    pl_, pr_ = detect(left[0]), detect(right[0])
    trp = jnp.eye(4, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    for i in (1, 2, 3):
        key, k = jax.random.split(key)
        pl_, pr_, _, res = step(pl_, pr_, jnp.asarray(left[i]),
                                jnp.asarray(right[i]), trp, k)
        assert bool(res.success), f"frame {i} failed under photometric drift"
        true_ratio = (frame_exposure_gain(cfg, i)
                      / frame_exposure_gain(cfg, i - 1))
        got = float(res.gain)
        assert abs(got - true_ratio) < 0.05, (
            f"frame {i}: gain {got:.3f} vs applied {true_ratio:.3f}")


def test_apply_photometrics_deterministic_and_bounded():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (H, W)).astype(np.uint8)
    cfg = SceneConfig(width=W, height=H, cu=CU, cv=CV, vignette=0.3,
                      noise_sigma=3.0, exposure_amp=0.2)
    a = apply_photometrics(img, cfg, 5)
    b = apply_photometrics(img, cfg, 5)
    np.testing.assert_array_equal(a, b)
    # vignetting darkens corners relative to center on a flat image
    flat = np.full((H, W), 200, np.uint8)
    cfg2 = SceneConfig(width=W, height=H, cu=CU, cv=CV, vignette=0.3)
    out = apply_photometrics(flat, cfg2, 0)
    assert out[H // 2, W // 2] > out[0, 0]
    # no-op config returns the input unchanged
    assert apply_photometrics(img, SceneConfig(), 0) is img
