"""Stage-level parity tests against the reference C++ pipeline.

SURVEY.md §4(b): parity tests on values extracted from the reference —
filter responses, match sets, per-frame Tr — not just synthetic ground
truth. benchmarks/reference_baseline/ref_dump.cpp drives the read-only
reference sources (matcher.cpp:649-732 computeFeatures, :965-1205 matching,
viso_mono.cpp:100-190 / viso_stereo.cpp:42-145 estimateMotion) and dumps
per-stage outputs; these tests run our engine on the same frames and diff.

Scenes: three named synthetic worlds (forward / curve / scurve) from
sfm_tpu.utils.synthetic at reduced resolution so the CPU test budget holds.
"""

import os
import subprocess

import numpy as np
import pytest

from sfm_tpu.config import (Bucketing, Calibration, EngineConfig,
                            MatcherParams, MonoParams, StereoParams)
from sfm_tpu.utils.synthetic import SceneConfig, scene_sequence

HERE = os.path.dirname(__file__)
REF_DIR = os.path.join(HERE, "..", "benchmarks", "reference_baseline")

W, H = 512, 160
F, CU, CV = 280.0, 256.0, 80.0
BASE = 0.571
N_FRAMES = 8
CFG = SceneConfig(width=W, height=H, f=F, cu=CU, cv=CV, wall_dist=7.0)
ENGINE = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                      max_matches=1024, outlier_mode="delaunay")
SCENES = ("forward", "curve", "scurve")


def _write_pgm(path, img):
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())


@pytest.fixture(scope="session")
def ref_dump_bin():
    binpath = os.path.join(REF_DIR, "ref_dump")
    if not os.path.exists(binpath):
        r = subprocess.run(["bash", os.path.join(REF_DIR, "build.sh")],
                           capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(binpath):
            pytest.skip(f"cannot build reference dump harness: {r.stderr[-500:]}")
    return binpath


@pytest.fixture(scope="session")
def scenes(tmp_path_factory):
    """name -> (left, right, poses, pgm_dir)."""
    out = {}
    root = tmp_path_factory.mktemp("parity_scenes")
    for name in SCENES:
        left, right, poses = scene_sequence(name, N_FRAMES, CFG, baseline=BASE)
        d = root / name
        d.mkdir()
        for i in range(N_FRAMES):
            _write_pgm(str(d / f"{i:06d}.pgm"), left[i])
            _write_pgm(str(d / f"{i:06d}_l.pgm"), left[i])
            _write_pgm(str(d / f"{i:06d}_r.pgm"), right[i])
        out[name] = (left, right, poses, str(d))
    return out


# ---------------------------------------------------------------------------
# Filters: exact integer parity (filter.cpp semantics)
# ---------------------------------------------------------------------------

def test_filter_parity(ref_dump_bin, scenes, tmp_path):
    from sfm_tpu.ops import filters

    left, _, _, d = scenes["forward"]
    img = left[0]
    subprocess.run([ref_dump_bin, "filters", os.path.join(d, "000000.pgm"),
                    str(tmp_path)], check=True, capture_output=True)
    ref = {
        "sobel5_du": np.fromfile(tmp_path / "sobel5_du.u8", np.uint8),
        "sobel5_dv": np.fromfile(tmp_path / "sobel5_dv.u8", np.uint8),
        "sobel3_du": np.fromfile(tmp_path / "sobel3_du.u8", np.uint8),
        "sobel3_dv": np.fromfile(tmp_path / "sobel3_dv.u8", np.uint8),
        "blob5": np.fromfile(tmp_path / "blob5.i16", np.int16),
        "checker5": np.fromfile(tmp_path / "checker5.i16", np.int16),
    }
    du5, dv5 = filters.sobel5x5(img)
    du3, dv3 = filters.sobel3x3(img)
    ours = {
        "sobel5_du": du5, "sobel5_dv": dv5,
        "sobel3_du": du3, "sobel3_dv": dv3,
        "blob5": filters.blob5x5(img),
        "checker5": filters.checkerboard5x5(img),
    }
    m = 8  # border margin; reference leaves borders uninitialized
    for name, r in ref.items():
        r = r.reshape(H, W)[m:-m, m:-m].astype(np.int32)
        o = np.asarray(ours[name])[m:-m, m:-m].astype(np.int32)
        np.testing.assert_array_equal(r, o, err_msg=f"filter {name}")


# ---------------------------------------------------------------------------
# Match sets: coverage within tie-break tolerance
# ---------------------------------------------------------------------------

def _coverage(a_pts, b_pts, a_vec, b_vec, tol_px=1.0, tol_vec=1.5):
    """Fraction of rows in a with a b point within tol_px whose associated
    vector (flow / disparity) agrees within tol_vec."""
    if len(a_pts) == 0:
        return 1.0
    d2 = ((a_pts[:, None, :] - b_pts[None, :, :]) ** 2).sum(-1)
    j = d2.argmin(1)
    close = np.sqrt(d2[np.arange(len(a_pts)), j]) <= tol_px
    agree = np.linalg.norm(a_vec - b_vec[j], axis=-1) <= tol_vec
    return float((close & agree).mean())


def _our_matcher(outlier_mode="delaunay"):
    from sfm_tpu.models.matcher import Matcher

    params = MatcherParams(f=F, cu=CU, cv=CV, base=BASE)
    eng = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                       max_matches=1024, outlier_mode=outlier_mode)
    return Matcher(params, eng, (W, H))


def _valid_matches(m):
    val = np.asarray(m.valid)
    cols = {}
    for k in ("u1p", "v1p", "u1c", "v1c", "u2p", "v2p", "u2c", "v2c"):
        cols[k] = np.asarray(getattr(m, k))[val]
    return cols


def test_flow_match_parity(ref_dump_bin, scenes, tmp_path):
    left, _, _, d = scenes["forward"]
    subprocess.run([ref_dump_bin, "match", d, "4", "0",
                    str(F), str(CU), str(CV), str(BASE), str(tmp_path)],
                   check=True, capture_output=True)
    mat = _our_matcher()
    mat.push_back(left[0])
    for i in (1, 2, 3):
        mat.push_back(left[i])
        mat.match_features(0)
        ours = _valid_matches(mat.get_matches())
        ref = np.loadtxt(tmp_path / f"matches_{i:04d}.txt")
        assert len(ref) > 50, "reference found too few matches to compare"
        r_cur = ref[:, [6, 7]]
        r_flow = ref[:, [0, 1]] - r_cur
        o_cur = np.stack([ours["u1c"], ours["v1c"]], 1)
        o_flow = np.stack([ours["u1p"] - ours["u1c"],
                           ours["v1p"] - ours["v1c"]], 1)
        cov_ro = _coverage(r_cur, o_cur, r_flow, o_flow)
        cov_or = _coverage(o_cur, r_cur, o_flow, r_flow)
        assert cov_ro >= 0.9, f"frame {i}: ref->ours coverage {cov_ro:.3f}"
        assert cov_or >= 0.9, f"frame {i}: ours->ref coverage {cov_or:.3f}"


def test_stereo_match_parity_fused(ref_dump_bin, scenes, tmp_path):
    """Fused method=1 pipeline (make_stereo_match_step) vs the reference
    matchFeatures(1) dump (matcher.cpp:1045-1084) — closes the last
    class-path-only capability (VERDICT r3 item 7)."""
    import jax.numpy as jnp

    from sfm_tpu.models.pipeline import make_stereo_match_step

    left, right, _, d = scenes["forward"]
    subprocess.run([ref_dump_bin, "match", d, "3", "1",
                    str(F), str(CU), str(CV), str(BASE), str(tmp_path)],
                   check=True, capture_output=True)
    params = MatcherParams(f=F, cu=CU, cv=CV, base=BASE)
    eng = EngineConfig(max_features_dense=1024, max_features_sparse=256,
                       max_matches=1024, outlier_mode="delaunay")
    step = make_stereo_match_step(W, H, params, eng)
    for i in (1, 2):
        _, _, m = step(jnp.asarray(left[i]), jnp.asarray(right[i]))
        ours = _valid_matches(m)
        assert len(ours["u1c"]) > 50
        ref = np.loadtxt(tmp_path / f"matches_{i:04d}.txt")
        assert len(ref) > 50
        r_cur = ref[:, [6, 7]]
        # current disparity as the agreement vector (method=1 has no flow)
        r_vec = np.stack([ref[:, 6] - ref[:, 9]], 1)
        o_cur = np.stack([ours["u1c"], ours["v1c"]], 1)
        o_vec = np.stack([ours["u1c"] - ours["u2c"]], 1)
        cov_ro = _coverage(r_cur, o_cur, r_vec, o_vec)
        cov_or = _coverage(o_cur, r_cur, o_vec, r_vec)
        assert cov_ro >= 0.9, f"frame {i}: ref->ours coverage {cov_ro:.3f}"
        assert cov_or >= 0.9, f"frame {i}: ours->ref coverage {cov_or:.3f}"


def test_quad_match_parity(ref_dump_bin, scenes, tmp_path):
    left, right, _, d = scenes["forward"]
    subprocess.run([ref_dump_bin, "match", d, "3", "2",
                    str(F), str(CU), str(CV), str(BASE), str(tmp_path)],
                   check=True, capture_output=True)
    mat = _our_matcher()
    mat.push_back(left[0], right[0])
    for i in (1, 2):
        mat.push_back(left[i], right[i])
        mat.match_features(2)
        ours = _valid_matches(mat.get_matches())
        ref = np.loadtxt(tmp_path / f"matches_{i:04d}.txt")
        assert len(ref) > 50
        r_cur = ref[:, [6, 7]]
        # flow + current disparity as the agreement vector
        r_vec = np.stack([ref[:, 0] - ref[:, 6], ref[:, 1] - ref[:, 7],
                          ref[:, 6] - ref[:, 9]], 1)
        o_cur = np.stack([ours["u1c"], ours["v1c"]], 1)
        o_vec = np.stack([ours["u1p"] - ours["u1c"],
                          ours["v1p"] - ours["v1c"],
                          ours["u1c"] - ours["u2c"]], 1)
        cov_ro = _coverage(r_cur, o_cur, r_vec, o_vec)
        cov_or = _coverage(o_cur, r_cur, o_vec, r_vec)
        assert cov_ro >= 0.85, f"frame {i}: ref->ours coverage {cov_ro:.3f}"
        assert cov_or >= 0.85, f"frame {i}: ours->ref coverage {cov_or:.3f}"


# ---------------------------------------------------------------------------
# Per-frame Tr + trajectory parity
# ---------------------------------------------------------------------------

def _load_ref_vo(path):
    rows = np.loadtxt(path)
    out = []
    for r in rows:
        tr = np.eye(4)
        tr[:3, :] = r[4:16].reshape(3, 4)
        out.append(dict(i=int(r[0]), ok=bool(r[1]), nm=int(r[2]),
                        ni=int(r[3]), tr=tr))
    return out


def _trajectory(deltas):
    """Integrate Tr_total = Tr_total * inv(Tr_delta) (sfm.hh:57-58)."""
    T = np.eye(4)
    out = [T.copy()]
    for d in deltas:
        T = T @ np.linalg.inv(d)
        out.append(T.copy())
    return out


def _gt_deltas(poses):
    return [poses[i] @ np.linalg.inv(poses[i - 1]) for i in range(1, len(poses))]


def _rot_angle(R):
    return float(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1)))


def _run_parity(kind, scenes, ref_dump_bin, tmp_path_factory):
    results = {}
    vo = None
    for name in SCENES:
        left, right, poses, d = scenes[name]
        out = tmp_path_factory.mktemp(f"vo_{kind}_{name}")
        subprocess.run([ref_dump_bin, "vo", d, str(N_FRAMES), kind,
                        str(F), str(CU), str(CV), str(BASE), "1.6", str(out)],
                       check=True, capture_output=True)
        ref = _load_ref_vo(out / "vo.txt")

        if kind == "mono":
            from sfm_tpu.models.mono import VisualOdometryMono

            params = MonoParams(calib=Calibration(f=F, cu=CU, cv=CV),
                                height=1.6, pitch=0.0,
                                bucket=Bucketing(max_features=1000))
            vo = VisualOdometryMono(params, ENGINE, dims=(W, H))
            run = lambda i: vo.process(left[i])
        else:
            from sfm_tpu.models.stereo import VisualOdometryStereo

            params = StereoParams(calib=Calibration(f=F, cu=CU, cv=CV),
                                  base=BASE,
                                  bucket=Bucketing(max_features=1000))
            vo = VisualOdometryStereo(params, ENGINE, dims=(W, H))
            run = lambda i: vo.process(left[i], right[i])

        ours = []
        for i in range(N_FRAMES):
            ok = run(i)
            ours.append(dict(ok=ok, tr=vo.get_motion().copy()))
        results[name] = (ref, ours, poses)
    return results


def _check_vo_parity(results, t_tol, r_tol, t_floor):
    for name, (ref, ours, poses) in results.items():
        gt = _gt_deltas(poses)
        ref_errs, our_errs = [], []
        n_ok_ref = sum(r["ok"] for r in ref[1:])
        n_ok_our = sum(o["ok"] for o in ours[1:])
        assert n_ok_our >= n_ok_ref - 1, (
            f"{name}: ours {n_ok_our} successes vs ref {n_ok_ref}")
        n_fallback = 0
        for i in range(1, N_FRAMES):
            r, o, g = ref[i], ours[i], gt[i - 1]
            if not (r["ok"] and o["ok"]):
                continue
            ref_errs.append(np.linalg.norm(r["tr"][:3, 3] - g[:3, 3]))
            our_errs.append(np.linalg.norm(o["tr"][:3, 3] - g[:3, 3]))
            # direct ref<->ours agreement; on frames where the reference
            # itself is noisy (its own GT rot error ~ r_tol) the two
            # estimators can legitimately err in opposite directions, so
            # accept if we are at least as close to ground truth
            dr = _rot_angle(r["tr"][:3, :3].T @ o["tr"][:3, :3])
            if dr >= r_tol:
                n_fallback += 1
                dr_ref = _rot_angle(r["tr"][:3, :3].T @ g[:3, :3])
                dr_our = _rot_angle(o["tr"][:3, :3].T @ g[:3, :3])
                assert dr_our <= dr_ref + r_tol / 2, (
                    f"{name} frame {i}: rot diff {dr:.4f} rad "
                    f"(gt err ours {dr_our:.4f} vs ref {dr_ref:.4f})")
        assert len(our_errs) >= 4, f"{name}: too few joint successes"
        # the GT-relative fallback is for isolated noisy frames; broad
        # frame-by-frame divergence from the reference must still fail even
        # if it happens to track GT better
        assert n_fallback <= max(2, len(our_errs) // 4), (
            f"{name}: {n_fallback}/{len(our_errs)} frames exceeded the "
            f"direct ref<->ours rotation tolerance")
        ref_med = float(np.median(ref_errs))
        our_med = float(np.median(our_errs))
        assert our_med <= max(t_tol * ref_med, t_floor), (
            f"{name}: our median t err {our_med:.4f} vs ref {ref_med:.4f}")
        # trajectory end-point error no worse than 1.5x reference
        ref_traj = _trajectory([r["tr"] for r in ref[1:]])
        our_traj = _trajectory([o["tr"] for o in ours[1:]])
        gt_traj = _trajectory(gt)
        ref_ate = np.linalg.norm(ref_traj[-1][:3, 3] - gt_traj[-1][:3, 3])
        our_ate = np.linalg.norm(our_traj[-1][:3, 3] - gt_traj[-1][:3, 3])
        assert our_ate <= max(1.5 * ref_ate, t_floor * (N_FRAMES - 1)), (
            f"{name}: end-point err {our_ate:.3f} vs ref {ref_ate:.3f}")


def test_stereo_vo_parity(ref_dump_bin, scenes, tmp_path_factory):
    results = _run_parity("stereo", scenes, ref_dump_bin, tmp_path_factory)
    _check_vo_parity(results, t_tol=1.5, r_tol=0.01, t_floor=0.03)


def test_mono_vo_parity(ref_dump_bin, scenes, tmp_path_factory):
    # mono scale rides on the ground-plane density estimate: looser bounds
    results = _run_parity("mono", scenes, ref_dump_bin, tmp_path_factory)
    _check_vo_parity(results, t_tol=2.0, r_tol=0.02, t_floor=0.12)
