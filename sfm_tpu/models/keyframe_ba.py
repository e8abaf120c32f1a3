"""Long-horizon keyframe bundle adjustment (map refinement over a full run).

The in-pipeline `Reconstruction`/`refine_map` window is bounded by the
8-frame pose ring (reconstruction.py FRAME_CAP — the TPU analog of the
reference's 6-frame track window, reconstruction.h:118). This module lifts
that bound into the SURVEY §7 "keyframe/map-block sharded BA" capability the
reference does not have (its only refinement is per-point with cameras
frozen, reconstruction.cpp:179-299):

  * `TrackAccumulator` chains the per-frame match tables of a WHOLE sequence
    run into unbounded feature tracks on the host (vectorized numpy — this
    is the offline/map-maintenance path, not the per-frame hot loop),
  * `select_keyframes` picks a distance/heading-spaced keyframe subset,
  * `build_keyframe_problem` compiles tracks + VO poses into the
    fixed-capacity `BAProblem` (landmark axis padded for even sharding),
  * `refine_keyframes` runs the Schur-complement engine (parallel/ba.py)
    with landmarks sharded over a device mesh — one psum of the reduced
    camera system per iteration — and writes the refined poses back as
    cam->world matrices.

Scale gauge: monocular reprojection BA has a 7-dof gauge; `n_fixed=2`
(default) pins the first two cameras, fixing global pose AND scale so
metric VO initializations keep their scale through refinement.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from ..parallel.ba import BAProblem, run_ba


class TrackAccumulator:
    """Host-side long-horizon track table.

    Feed each frame's match table (the fused step's `Matches`, numpy-read);
    matches chain via i1p == previous frame's i1c (the association rule of
    reconstruction.cpp:71-104, without the track-length cap).
    """

    def __init__(self, feat_cap: int):
        self.feat_cap = feat_cap
        self.prev_map = np.full(feat_cap, -1, np.int64)  # i1c -> track id
        self.n_tracks = 0
        self._tid: list[np.ndarray] = []
        self._frame: list[np.ndarray] = []
        self._u: list[np.ndarray] = []
        self._v: list[np.ndarray] = []
        self._ur: list[np.ndarray] = []   # right-image u (NaN if mono)
        self._vr: list[np.ndarray] = []

    def reset_chain(self):
        """End every open track (call when VO fails / the keyframe is
        replaced, so broken geometry cannot bridge the gap)."""
        self.prev_map.fill(-1)

    def push(self, m, frame: int, keep: Optional[np.ndarray] = None,
             stereo: bool = False):
        """Add one frame's matches. `m` is a Matches table (device or
        numpy); `keep` optionally restricts to a boolean subset (e.g. the
        RANSAC inlier mask). `frame` indexes the CURRENT image. With
        stereo=True (quad tables) the right-image coordinates u2c/v2c
        (and u2p/v2p for the spawning observation) are recorded so
        build_keyframe_problem can emit rigid-baseline stereo residuals."""
        valid = np.asarray(m.valid).astype(bool)
        if keep is not None:
            valid = valid & np.asarray(keep).astype(bool)
        i1p = np.asarray(m.i1p)[valid].astype(np.int64)
        i1c = np.asarray(m.i1c)[valid].astype(np.int64)
        u1p = np.asarray(m.u1p)[valid]
        v1p = np.asarray(m.v1p)[valid]
        u1c = np.asarray(m.u1c)[valid]
        v1c = np.asarray(m.v1c)[valid]
        if stereo:
            u2p = np.asarray(m.u2p)[valid]
            v2p = np.asarray(m.v2p)[valid]
            u2c = np.asarray(m.u2c)[valid]
            v2c = np.asarray(m.v2c)[valid]
        else:
            u2p = v2p = u2c = v2c = np.full(valid.sum(), np.nan)

        ok = (i1p >= 0) & (i1p < self.feat_cap) & (i1c >= 0) \
            & (i1c < self.feat_cap)
        i1p, i1c = i1p[ok], i1c[ok]
        u1p, v1p, u1c, v1c = u1p[ok], v1p[ok], u1c[ok], v1c[ok]
        u2p, v2p, u2c, v2c = u2p[ok], v2p[ok], u2c[ok], v2c[ok]

        tid = self.prev_map[i1p]
        new = tid < 0
        n_new = int(new.sum())
        tid = tid.copy()
        tid[new] = self.n_tracks + np.arange(n_new)
        self.n_tracks += n_new

        # spawning observation at the PREVIOUS frame
        if n_new:
            self._tid.append(tid[new])
            self._frame.append(np.full(n_new, frame - 1, np.int64))
            self._u.append(u1p[new].astype(np.float64))
            self._v.append(v1p[new].astype(np.float64))
            self._ur.append(u2p[new].astype(np.float64))
            self._vr.append(v2p[new].astype(np.float64))
        self._tid.append(tid)
        self._frame.append(np.full(len(tid), frame, np.int64))
        self._u.append(u1c.astype(np.float64))
        self._v.append(v1c.astype(np.float64))
        self._ur.append(u2c.astype(np.float64))
        self._vr.append(v2c.astype(np.float64))

        nm = np.full(self.feat_cap, -1, np.int64)
        nm[i1c] = tid
        self.prev_map = nm

    def observations(self):
        """(tid, frame, u, v, ur, vr) flat arrays over the whole run
        (ur/vr are NaN for observations without a right-image pairing)."""
        if not self._tid:
            z = np.zeros(0)
            return (z.astype(np.int64), z.astype(np.int64), z, z, z, z)
        return (np.concatenate(self._tid), np.concatenate(self._frame),
                np.concatenate(self._u), np.concatenate(self._v),
                np.concatenate(self._ur), np.concatenate(self._vr))


def select_keyframes(poses_c2w: np.ndarray, min_dist: float = 1.5,
                     min_rot_deg: float = 5.0) -> np.ndarray:
    """Greedy distance/heading-spaced keyframe subset (indices, always
    including frame 0). poses_c2w: [N,4,4] cam->world."""
    kf = [0]
    for i in range(1, len(poses_c2w)):
        rel = np.linalg.inv(poses_c2w[kf[-1]]) @ poses_c2w[i]
        dt = float(np.linalg.norm(rel[:3, 3]))
        ang = float(np.degrees(np.arccos(
            np.clip((np.trace(rel[:3, :3]) - 1.0) / 2.0, -1.0, 1.0))))
        if dt >= min_dist or ang >= min_rot_deg:
            kf.append(i)
    return np.asarray(kf, np.int64)


class KeyframeProblem(NamedTuple):
    problem: BAProblem
    kf_frames: np.ndarray    # [Nc] original frame index per camera
    n_landmarks: int         # real landmarks (before padding)


def _world_to_cam_tr(pose_c2w: np.ndarray) -> np.ndarray:
    """[4,4] cam->world -> [6] rx ry rz tx ty tz (world->cam), reference
    Euler convention (viso.cpp:59-84 inverse)."""
    import jax.numpy as jnp

    from ..ops.se3 import rotation_angles

    T = np.linalg.inv(pose_c2w)
    rx, ry, rz = (float(a) for a in rotation_angles(jnp.asarray(T,
                                                                jnp.float32)))
    return np.asarray([rx, ry, rz, T[0, 3], T[1, 3], T[2, 3]], np.float32)


def cam_tr_to_pose(cam_tr) -> np.ndarray:
    """[Nc,6] world->cam params -> [Nc,4,4] cam->world matrices."""
    import jax
    import jax.numpy as jnp

    from ..ops.se3 import transformation_vector_to_matrix

    T = np.asarray(jax.vmap(transformation_vector_to_matrix)(
        jnp.asarray(cam_tr, jnp.float32)))
    return np.linalg.inv(T)


def build_keyframe_problem(
    acc: TrackAccumulator,
    poses_c2w: np.ndarray,
    kf: np.ndarray,
    intr,
    max_obs: int = 8,
    min_obs: int = 2,
    max_landmarks: Optional[int] = None,
    pad_to: int = 8,
    max_depth: float = 100.0,
    max_init_resid: float = 8.0,
    stereo_base: float = 0.0,
) -> KeyframeProblem:
    """Compile accumulated tracks into a fixed-capacity BAProblem.

    Cameras = the keyframes (world = frame-0 camera). Landmarks = tracks
    observed in >= min_obs keyframes (longer tracks subsampled evenly to
    max_obs). Initial points: 2-view DLT from each track's first/last
    keyframe observation, same orthogonal-regression form as the in-window
    initializer (parallel/ba.py problem_from_recon). The landmark axis is
    padded to a multiple of `pad_to` so it shards evenly over a mesh.
    """
    import jax.numpy as jnp

    from ..ops.linalg import smallest_right_singular_vector

    f, cu, cv = float(intr[0]), float(intr[1]), float(intr[2])
    tid, frame, u, v, ur, vr = acc.observations()

    # keyframe filter + camera renumbering
    kf_of_frame = np.full(int(frame.max() + 1) if len(frame) else 1, -1,
                          np.int64)
    kf_of_frame[kf] = np.arange(len(kf))
    sel = (frame < len(kf_of_frame)) & (kf_of_frame[np.clip(
        frame, 0, len(kf_of_frame) - 1)] >= 0)
    tid, frame, u, v = tid[sel], frame[sel], u[sel], v[sel]
    ur, vr = ur[sel], vr[sel]
    cam = kf_of_frame[frame]

    # dedup (tid, cam) — a track observed twice in one keyframe keeps the
    # first observation
    order = np.lexsort((cam, tid))
    tid, cam, u, v = tid[order], cam[order], u[order], v[order]
    ur, vr = ur[order], vr[order]
    first = np.ones(len(tid), bool)
    first[1:] = (tid[1:] != tid[:-1]) | (cam[1:] != cam[:-1])
    tid, cam, u, v = tid[first], cam[first], u[first], v[first]
    ur, vr = ur[first], vr[first]

    # tracks with enough keyframe support
    utid, start, count = np.unique(tid, return_index=True,
                                   return_counts=True)
    good = count >= min_obs
    utid, start, count = utid[good], start[good], count[good]
    if max_landmarks is not None and len(utid) > max_landmarks:
        keep = np.argsort(-count, kind="stable")[:max_landmarks]
        keep.sort()
        utid, start, count = utid[keep], start[keep], count[keep]
    Nl = len(utid)
    Nc = len(kf)

    # fixed-capacity observation table, even subsample beyond the budget.
    # With a stereo baseline each selected keyframe contributes TWO
    # residual rows (left, and right at a rigid x-offset of `stereo_base`)
    # when the right-image pairing exists, so the keyframe budget halves.
    stereo = stereo_base > 0.0
    kf_budget = max_obs // 2 if stereo else max_obs
    obs_uv = np.zeros((Nl, max_obs, 2), np.float32)
    obs_cam = np.zeros((Nl, max_obs), np.int32)
    obs_mask = np.zeros((Nl, max_obs), bool)
    obs_base = np.zeros((Nl, max_obs), np.float32)
    left_cnt = np.zeros(Nl, np.int64)
    for l in range(Nl):
        s, c = start[l], count[l]
        idx = s + (np.round(np.linspace(0, c - 1, min(c, kf_budget)))
                   .astype(np.int64) if c > kf_budget
                   else np.arange(c))
        k = len(idx)
        left_cnt[l] = k
        obs_uv[l, :k, 0] = u[idx]
        obs_uv[l, :k, 1] = v[idx]
        obs_cam[l, :k] = cam[idx]
        obs_mask[l, :k] = True
        if stereo:
            rsel = np.isfinite(ur[idx]) & np.isfinite(vr[idx])
            kr = int(rsel.sum())
            if kr:
                obs_uv[l, k:k + kr, 0] = ur[idx][rsel]
                obs_uv[l, k:k + kr, 1] = vr[idx][rsel]
                obs_cam[l, k:k + kr] = cam[idx][rsel]
                obs_base[l, k:k + kr] = stereo_base
                obs_mask[l, k:k + kr] = True

    # initial cameras (world->cam) from the VO pose chain, re-rooted at kf0
    base = poses_c2w[kf[0]]
    cam_tr = np.stack([_world_to_cam_tr(
        np.linalg.inv(base) @ poses_c2w[i]) for i in kf])

    # 2-view DLT from first/last observation
    import jax

    T_wc = np.linalg.inv(np.einsum("ij,njk->nik",
                                   np.linalg.inv(base),
                                   poses_c2w[kf]))  # world->cam per kf
    K = np.asarray([[f, 0, cu], [0, f, cv], [0, 0, 1.0]])
    proj = np.einsum("ij,njk->nik", K, T_wc[:, :3, :])  # [Nc,3,4]
    # DLT from the first/last LEFT observation (right obs sit after the
    # left prefix when stereo)
    li = np.maximum(left_cnt - 1, 0)
    c1 = obs_cam[np.arange(Nl), 0] if Nl else np.zeros(0, np.int32)
    c2 = obs_cam[np.arange(Nl), li] if Nl else np.zeros(0, np.int32)
    P1, P2 = proj[c1], proj[c2]
    u1, v1 = obs_uv[:, 0, 0], obs_uv[:, 0, 1]
    u2 = obs_uv[np.arange(Nl), li, 0] if Nl else np.zeros(0)
    v2 = obs_uv[np.arange(Nl), li, 1] if Nl else np.zeros(0)
    J0 = np.stack([
        P1[:, 2, :] * u1[:, None] - P1[:, 0, :],
        P1[:, 2, :] * v1[:, None] - P1[:, 1, :],
        P2[:, 2, :] * u2[:, None] - P2[:, 0, :],
        P2[:, 2, :] * v2[:, None] - P2[:, 1, :],
    ], axis=1) if Nl else np.zeros((0, 4, 4))
    Xh = np.asarray(smallest_right_singular_vector(
        jnp.asarray(J0, jnp.float32)))
    w = Xh[:, 3]
    ok_w = np.abs(w) >= 1e-10
    pts = Xh[:, :3] / np.where(ok_w, w, 1.0)[:, None]
    # map hygiene gates on the init: chirality/finiteness, bounded depth
    # (distant low-parallax points have near-singular V blocks and blow up
    # the landmark back-substitution), and bounded initial reprojection
    # error (wrong associations must not enter the problem as outliers —
    # the reference applies the same max-distance idea per point,
    # reconstruction.cpp:204-211)
    zc = np.einsum("nij,nj->ni", T_wc[c1][:, :3, :3], pts) \
        + T_wc[c1][:, :3, 3]
    valid = ok_w & np.isfinite(pts).all(1) & (zc[:, 2] > 0.1) \
        & (np.linalg.norm(pts, axis=1) < max_depth)
    if Nl:
        xc_all = np.einsum("lkij,lj->lki", T_wc[obs_cam][:, :, :3, :3],
                           pts) + T_wc[obs_cam][:, :, :3, 3]
        xc_all = xc_all - np.stack(
            [obs_base, np.zeros_like(obs_base), np.zeros_like(obs_base)],
            -1)
        z_all = np.where(np.abs(xc_all[..., 2]) > 1e-6, xc_all[..., 2],
                         1e-6)
        pred = np.stack([f * xc_all[..., 0] / z_all + cu,
                         f * xc_all[..., 1] / z_all + cv], -1)
        resid = np.linalg.norm(pred - obs_uv, axis=-1)
        resid = np.where(obs_mask, resid, 0.0)
        max_resid = resid.max(1)
        valid &= max_resid < max_init_resid
        valid &= ((xc_all[..., 2] > 0.1) | ~obs_mask).all(1)

    # pad the landmark axis for even mesh sharding
    Np = -(-max(Nl, 1) // pad_to) * pad_to
    pad = Np - Nl

    def padl(a, fill=0):
        if pad == 0:
            return a
        shape = (pad,) + a.shape[1:]
        return np.concatenate([a, np.full(shape, fill, a.dtype)])

    prob = BAProblem(
        cam_tr=jnp.asarray(cam_tr, jnp.float32),
        points=jnp.asarray(padl(np.where(valid[:, None], pts, 0.0)
                                .astype(np.float32))),
        obs_uv=jnp.asarray(padl(obs_uv)),
        obs_cam=jnp.asarray(padl(obs_cam)),
        obs_mask=jnp.asarray(padl(obs_mask)),
        point_valid=jnp.asarray(padl(valid)),
        obs_base=jnp.asarray(padl(obs_base)),
    )
    return KeyframeProblem(problem=prob, kf_frames=kf, n_landmarks=Nl)


def refine_keyframes(kfp: KeyframeProblem, intr, iters: int = 15,
                     damping: float = 1e-2, n_fixed: int = 2,
                     mesh=None, axis: str = "data"):
    """Adaptive-damping (Levenberg-Marquardt) Schur BA over the keyframe
    problem: a trial step that increases chi2 is rejected and retried with
    10x damping, an accepted step decays damping — the fixed-damping GN of
    run_ba diverges on real long-horizon problems (distant low-parallax
    landmarks). One step = one device dispatch; with a mesh each dispatch
    psums one reduced [Nc*6]^2 camera system (parallel/ba.py).

    Returns (poses_c2w [Nc,4,4] refined, points [Nl,3], point_valid [Nl],
    chi2_final).
    """
    from ..parallel.ba import make_ba_step

    step = make_ba_step(intr, damping=damping, n_fixed=n_fixed, mesh=mesh,
                        axis=axis)
    lam = damping
    cur = kfp.problem
    # chi2 returned by a step is evaluated at its INPUT state
    trial, chi2_cur = step(cur, lam)
    chi2_cur = float(chi2_cur)
    for _ in range(iters):
        trial2, chi2_trial = step(trial, lam)
        if float(chi2_trial) <= chi2_cur:
            cur, chi2_cur = trial, float(chi2_trial)
            lam = max(lam * 0.5, 1e-5)
            trial = trial2
        else:
            lam = min(lam * 10.0, 1e6)
            trial, _ = step(cur, lam)
    poses = cam_tr_to_pose(cur.cam_tr)
    Nl = kfp.n_landmarks
    return (poses, np.asarray(cur.points)[:Nl],
            np.asarray(cur.point_valid)[:Nl], chi2_cur)
