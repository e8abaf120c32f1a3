"""Multi-frame sparse 3D reconstruction (mapping).

TPU-native Reconstruction (reference viso/reconstruction.{h,cpp}): feature
tracks keyed by match indices, per-frame pose deque re-expressed in the
current camera, and — when a track is lost — 2-view triangulation init,
road-model classification, 3-dof Gauss-Newton refinement over all track
observations, and distance/angle gates.

Redesign: the std::list<track> becomes a fixed-capacity track table; the
whole per-frame update (pose shift, match association, spawn/extend,
finalize+triangulate+refine) is ONE jitted program over masked arrays.
Finished points stream back to a host-side list (they are outputs, not
state).

Note on pose pairing: the reference associates each track pixel with the
camera pose of the FRAME AFTER its observation (a new track stores the
previous-frame pixel u1p but points first_frame at frames.back(), which is
the current frame — reconstruction.cpp:90-95 with :264-265). We pair each
pixel with its actual frame by default; set `reference_pose_offset=True` for
the reference's off-by-one behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ReconstructionParams
from ..ops.linalg import smallest_right_singular_vector
from ..ops.matching import Matches

FRAME_CAP = 8          # poses indexed by frames_ago (0 = current)
TRACK_LEN = 6          # default max_track_length (reference reconstruction.h:118);
                       # ReconstructionParams.max_track_length overrides via
                       # init_state(track_len=...) — the table column count IS
                       # the window, recon_update reads it from the state shape


class ReconState(NamedTuple):
    px_u: jnp.ndarray      # [T, L] pixel u per observation
    px_v: jnp.ndarray      # [T, L]
    length: jnp.ndarray    # [T] observations in track
    last_idx: jnp.ndarray  # [T] feature index of latest obs (i1c)
    first_ago: jnp.ndarray # [T] frames_ago of the first observation's pose
    active: jnp.ndarray    # [T] bool
    fwd: jnp.ndarray       # [F, 4, 4]: frame k camera -> current camera


def init_state(max_tracks: int, dtype=jnp.float32,
               track_len: int = TRACK_LEN) -> ReconState:
    if track_len > FRAME_CAP:
        # recon_update clips every pose-ring index to FRAME_CAP-1; a longer
        # track window would silently triangulate old observations against
        # the clamped (wrong) pose instead of the true one.
        raise ValueError(
            f"track_len={track_len} exceeds the pose ring (FRAME_CAP="
            f"{FRAME_CAP}); observations older than the ring would pair "
            f"with clamped poses and corrupt triangulated points")
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (FRAME_CAP, 4, 4))
    return ReconState(
        px_u=jnp.zeros((max_tracks, track_len), dtype),
        px_v=jnp.zeros((max_tracks, track_len), dtype),
        length=jnp.zeros((max_tracks,), jnp.int32),
        last_idx=jnp.full((max_tracks,), -1, jnp.int32),
        first_ago=jnp.zeros((max_tracks,), jnp.int32),
        active=jnp.zeros((max_tracks,), bool),
        fwd=eye,
    )


def _se3_inv(T):
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.einsum("...ij,...j->...i", Rt, t)[..., None]], -1)
    bot = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype),
                           T.shape[:-2] + (4,))[..., None, :]
    return jnp.concatenate([top, bot], -2)


@functools.partial(jax.jit, static_argnames=(
    "feat_cap", "point_type", "min_track_length", "ref_pose_offset"))
def recon_update(
    state: ReconState,
    m: Matches,
    rev_tr: jnp.ndarray,       # 4x4 Tr_delta (prev -> current camera)
    K: jnp.ndarray,            # 3x3 intrinsics
    tr_cam_road: jnp.ndarray,  # 4x4 camera -> road frame
    max_dist: jnp.ndarray,
    min_angle: jnp.ndarray,
    *,
    feat_cap: int,
    point_type: int,
    min_track_length: int,
    ref_pose_offset: bool = False,
):
    """One reconstruction update (reconstruction.cpp:50-146).

    Returns (new_state, points [T,3], point_valid [T]): finished 3D points in
    current-camera coordinates."""
    T_cap = state.active.shape[0]
    L = state.px_u.shape[1]  # track window = ReconstructionParams.max_track_length

    # --- shift pose ring: everything one frame older, new eye at slot 0 ---
    shifted = jnp.einsum("ij,fjk->fik", rev_tr, state.fwd)
    fwd = jnp.concatenate([jnp.eye(4, dtype=shifted.dtype)[None],
                           shifted[:-1]], axis=0)
    inv = _se3_inv(fwd)
    proj = jnp.einsum("ij,fjk->fik", K, inv[:, :3, :])  # [F, 3, 4]
    first_ago = jnp.where(state.active, state.first_ago + 1, state.first_ago)

    # --- associate matches to tracks (reconstruction.cpp:71-104) ---
    track_map = jnp.full((feat_cap + 1,), -1, jnp.int32)
    key = jnp.where(state.active & (state.last_idx >= 0),
                    state.last_idx, feat_cap)
    track_map = track_map.at[key].set(
        jnp.arange(T_cap, dtype=jnp.int32), mode="drop")
    track_map = track_map.at[feat_cap].set(-1)

    i1p = jnp.clip(m.i1p, -1, feat_cap - 1)
    tslot = jnp.where(m.valid & (i1p >= 0), track_map[i1p], -1)

    # first match per track extends; later ones (refreshed) spawn new tracks
    n_m = m.valid.shape[0]
    match_ar = jnp.arange(n_m, dtype=jnp.int32)
    winner = jnp.full((T_cap + 1,), n_m, jnp.int32)
    winner = winner.at[jnp.where(tslot >= 0, tslot, T_cap)].min(match_ar)
    is_winner = (tslot >= 0) & (winner[jnp.clip(tslot, 0, T_cap)] == match_ar)
    can_extend = is_winner & (state.length[jnp.clip(tslot, 0, T_cap - 1)] < L)
    extend = m.valid & can_extend
    # a matched-but-full track neither extends nor spawns — it is finalized
    # below as not-refreshed (reconstruction.cpp:97-103)
    spawn = m.valid & ((tslot < 0) | ((tslot >= 0) & ~is_winner))

    # extensions
    et = jnp.where(extend, tslot, T_cap)  # overflow row dropped
    elen = state.length[jnp.clip(et, 0, T_cap - 1)]
    px_u = jnp.concatenate([state.px_u, jnp.zeros((1, L), state.px_u.dtype)], 0)
    px_v = jnp.concatenate([state.px_v, jnp.zeros((1, L), state.px_v.dtype)], 0)
    px_u = px_u.at[et, jnp.clip(elen, 0, L - 1)].set(m.u1c, mode="drop")[:T_cap]
    px_v = px_v.at[et, jnp.clip(elen, 0, L - 1)].set(m.v1c, mode="drop")[:T_cap]
    length = (jnp.concatenate([state.length, jnp.zeros((1,), jnp.int32)])
              .at[et].add(jnp.where(extend, 1, 0), mode="drop")[:T_cap])
    last_idx = (jnp.concatenate([state.last_idx, jnp.zeros((1,), jnp.int32)])
                .at[et].set(m.i1c, mode="drop")[:T_cap])
    refreshed = jnp.zeros((T_cap + 1,), bool).at[et].set(True, mode="drop")[:T_cap]

    # --- finalize lost tracks BEFORE spawning into freed slots ---
    lost = state.active & ~refreshed
    fin_len = length  # lengths unchanged for lost tracks
    emit = lost & (fin_len >= min_track_length)

    # per-track pose index of each observation
    base_off = 0 if ref_pose_offset else 1
    obs_j = jnp.arange(L, dtype=jnp.int32)[None, :]               # [1, L]
    obs_ago = jnp.clip(first_ago[:, None] - obs_j, 0, FRAME_CAP - 1)
    obs_mask = obs_j < fin_len[:, None]                            # [T, L]
    last_ago = jnp.clip(first_ago - (fin_len - 1), 0, FRAME_CAP - 1)

    P_first = proj[jnp.clip(first_ago, 0, FRAME_CAP - 1)]  # [T, 3, 4]
    P_last = proj[last_ago]

    # initPoint: 2-view orthogonal-regression triangulation
    # (reconstruction.cpp:148-177)
    u1 = px_u[:, 0]
    v1 = px_v[:, 0]
    li = jnp.clip(fin_len - 1, 0, L - 1)
    u2 = jnp.take_along_axis(px_u, li[:, None], 1)[:, 0]
    v2 = jnp.take_along_axis(px_v, li[:, None], 1)[:, 0]
    J0 = jnp.stack([
        P_first[:, 2, :] * u1[:, None] - P_first[:, 0, :],
        P_first[:, 2, :] * v1[:, None] - P_first[:, 1, :],
        P_last[:, 2, :] * u2[:, None] - P_last[:, 0, :],
        P_last[:, 2, :] * v2[:, None] - P_last[:, 1, :],
    ], axis=1)  # [T, 4, 4]
    Xh = smallest_right_singular_vector(J0)  # [T, 4]
    w = Xh[:, 3]
    ok_w = jnp.abs(w) >= 1e-10
    p0 = Xh[:, :3] / jnp.where(ok_w, w, 1.0)[:, None]

    # pointType (reconstruction.cpp:231-253)
    inv_first = inv[jnp.clip(first_ago, 0, FRAME_CAP - 1)]
    inv_last = inv[last_ago]

    def affine(T, p):
        return jnp.einsum("tij,tj->ti", T[:, :3, :3], p) + T[:, :3, 3]

    x1c = affine(inv_first, p0)
    x2c = affine(inv_last, p0)
    x2r = (jnp.einsum("ij,tj->ti", tr_cam_road[:3, :3], x2c)
           + tr_cam_road[:3, 3])
    ptype = jnp.where((x1c[:, 2] <= 1) | (x2c[:, 2] <= 1), -1,
                      jnp.where(x2r[:, 1] > 0.5, 0,
                                jnp.where(x2r[:, 1] > -1, 1, 2)))
    ok_type = ptype >= point_type

    # refinePoint: 3-dof GN over all observations (reconstruction.cpp:179-299)
    P_obs = proj[obs_ago]  # [T, L, 3, 4]

    def gn_iter(carry):
        it, p, done, failed = carry
        ph = jnp.concatenate([p, jnp.ones_like(p[:, :1])], 1)  # [T, 4]
        a = jnp.einsum("tlj,tj->tl", P_obs[:, :, 0, :], ph)
        b = jnp.einsum("tlj,tj->tl", P_obs[:, :, 1, :], ph)
        c = jnp.einsum("tlj,tj->tl", P_obs[:, :, 2, :], ph)
        cc = c * c
        sing = jnp.any((cc < 1e-10) & obs_mask, axis=1)
        cc = jnp.maximum(cc, 1e-10)
        Ju = (P_obs[:, :, 0, :3] * c[..., None] - P_obs[:, :, 2, :3] * a[..., None]) / cc[..., None]
        Jv = (P_obs[:, :, 1, :3] * c[..., None] - P_obs[:, :, 2, :3] * b[..., None]) / cc[..., None]
        ru = px_u - a / c
        rv = px_v - b / c
        mask = obs_mask[..., None]
        Ju = jnp.where(mask, Ju, 0.0)
        Jv = jnp.where(mask, Jv, 0.0)
        ru = jnp.where(obs_mask, ru, 0.0)
        rv = jnp.where(obs_mask, rv, 0.0)
        A = (jnp.einsum("tli,tlj->tij", Ju, Ju)
             + jnp.einsum("tli,tlj->tij", Jv, Jv))
        g = (jnp.einsum("tli,tl->ti", Ju, ru)
             + jnp.einsum("tli,tl->ti", Jv, rv))
        from ..ops.linalg import solve_spd_small

        step, solve_ok = solve_spd_small(A, g)
        conv = jnp.all(jnp.abs(step) < 1e-5, axis=1)
        upd = ~done & ~failed & solve_ok & ~sing
        p = jnp.where(upd[:, None], p + step, p)
        done = done | (upd & conv)
        failed = failed | (~done & ~failed & (~solve_ok | sing))
        return it + 1, p, done, failed

    def gn_cond(carry):
        it, _, done, failed = carry
        return (it < 21) & jnp.any(emit & ~done & ~failed)

    done0 = jnp.zeros((T_cap,), bool)
    _, p_ref, converged, gn_failed = jax.lax.while_loop(
        gn_cond, gn_iter, (jnp.int32(0), p0, done0, done0))
    ok_gn = converged & ~gn_failed

    # pointDistance / rayAngle gates (reconstruction.cpp:204-229)
    mid_ago = jnp.clip((first_ago + last_ago + 1) // 2, 0, FRAME_CAP - 1)
    cam_mid = fwd[mid_ago][:, :3, 3]
    dist = jnp.linalg.norm(cam_mid - p_ref, axis=1)
    c1 = fwd[jnp.clip(first_ago, 0, FRAME_CAP - 1)][:, :3, 3]
    c2 = fwd[last_ago][:, :3, 3]
    v1r = c1 - p_ref
    v2r = c2 - p_ref
    n1 = jnp.linalg.norm(v1r, axis=1)
    n2 = jnp.linalg.norm(v2r, axis=1)
    cosang = jnp.abs(jnp.sum(v1r * v2r, axis=1) / jnp.maximum(n1 * n2, 1e-20))
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    ang = jnp.where((n1 < 1e-10) | (n2 < 1e-10), 1000.0, ang)

    point_valid = (emit & ok_w & ok_type & ok_gn & (dist < max_dist)
                   & (ang > min_angle) & jnp.all(jnp.isfinite(p_ref), axis=1))

    # --- spawn new tracks into slots freed by finalization ---
    active_after = state.active & ~lost | refreshed  # extended stay active
    free = ~active_after
    free_pos = jnp.cumsum(free.astype(jnp.int32)) - 1   # rank among free slots
    slot_of_rank = (jnp.full((T_cap + 1,), -1, jnp.int32)
                    .at[jnp.where(free, free_pos, T_cap)]
                    .set(jnp.arange(T_cap, dtype=jnp.int32), mode="drop"))[:T_cap]
    spawn_rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    sslot = jnp.where(spawn & (spawn_rank < T_cap),
                      slot_of_rank[jnp.clip(spawn_rank, 0, T_cap - 1)], -1)
    sslot = jnp.where(sslot >= 0, sslot, T_cap)  # drop overflow

    def sset(arr, col, vals):
        ext = jnp.concatenate([arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)], 0)
        if col is None:
            return ext.at[sslot].set(vals, mode="drop")[:T_cap]
        return ext.at[sslot, col].set(vals, mode="drop")[:T_cap]

    px_u = sset(px_u, 0, m.u1p)
    px_u = sset(px_u, 1, m.u1c)
    px_v = sset(px_v, 0, m.v1p)
    px_v = sset(px_v, 1, m.v1c)
    length = sset(length, None, jnp.full((n_m,), 2, jnp.int32))
    last_idx = sset(last_idx, None, m.i1c)
    first_ago = sset(first_ago, None,
                     jnp.full((n_m,), base_off, jnp.int32))
    spawned = (jnp.zeros((T_cap + 1,), bool)
               .at[sslot].set(True, mode="drop")[:T_cap])
    active = (active_after | spawned) & (length > 0)

    new_state = ReconState(px_u=px_u, px_v=px_v, length=length,
                           last_idx=last_idx, first_ago=first_ago,
                           active=active, fwd=fwd)
    return new_state, p_ref, point_valid


class Reconstruction:
    """Host driver matching the reference API (reconstruction.h:38-120)."""

    def __init__(self, params: ReconstructionParams = ReconstructionParams(),
                 engine: Optional[EngineConfig] = None):
        self.p = params
        self.e = engine or EngineConfig()
        self.K = np.eye(3)
        self._state = init_state(self.e.max_tracks,
                                 track_len=self.p.max_track_length)
        self._points: list[np.ndarray] = []  # finished points, current-cam coords
        self._tr_cam_road = np.eye(4)

    def set_calibration(self, f: float, cu: float, cv: float):
        """reconstruction.cpp:34-48 (road model from params, not hardcoded)."""
        self.K = np.array([[f, 0, cu], [0, f, cv], [0, 0, 1.0]])
        cp = np.cos(self.p.cam_pitch)
        sp = np.sin(self.p.cam_pitch)
        T = np.eye(4)
        T[1, 1], T[1, 2] = cp, -sp
        T[2, 1], T[2, 2] = sp, cp
        T[1, 3] = -self.p.cam_height
        self._tr_cam_road = T

    def update(self, matches: Matches, tr: np.ndarray,
               point_type: Optional[int] = None,
               min_track_length: Optional[int] = None,
               max_dist: Optional[float] = None,
               min_angle: Optional[float] = None):
        pt = self.p.point_type if point_type is None else point_type
        mtl = self.p.min_track_length if min_track_length is None else min_track_length
        md = self.p.max_dist if max_dist is None else max_dist
        ma = self.p.min_angle if min_angle is None else min_angle

        # re-express stored points in the new camera (reconstruction.cpp:52-55)
        rev = np.asarray(tr, np.float64)
        for i, p in enumerate(self._points):
            self._points[i] = rev[:3, :3] @ p + rev[:3, 3]

        self._state, pts, valid = recon_update(
            self._state, matches, jnp.asarray(rev, jnp.float32),
            jnp.asarray(self.K, jnp.float32),
            jnp.asarray(self._tr_cam_road, jnp.float32),
            jnp.float32(md), jnp.float32(ma),
            feat_cap=self.e.max_features_dense, point_type=pt,
            min_track_length=mtl)
        vmask = np.asarray(valid)
        if vmask.any():
            for p in np.asarray(pts)[vmask]:
                self._points.append(p.astype(np.float64))

    def get_points(self) -> np.ndarray:
        if not self._points:
            return np.zeros((0, 3))
        return np.stack(self._points)

    def refine_map(self, iters: int = 5, damping: float = 1e-3,
                   mesh=None, axis: str = "data"):
        """Windowed bundle adjustment over the ACTIVE tracks and the recent
        pose ring (capability beyond the reference, which only refines
        points with cameras frozen, reconstruction.cpp:179-299).

        Returns (points [T,3], point_valid [T], cam_tr [F,6], chi2): jointly
        refined landmarks (current-camera coords) and window poses. Pass a
        jax Mesh to shard landmarks and psum-reduce the camera system
        (parallel/ba.py)."""
        from ..parallel.ba import problem_from_recon, run_ba

        prob = problem_from_recon(self._state, jnp.asarray(self.K, jnp.float32))
        intr = (float(self.K[0, 0]), float(self.K[0, 2]), float(self.K[1, 2]))
        refined, chi2 = run_ba(prob, intr, iters=iters, damping=damping,
                               mesh=mesh, axis=axis)
        return (np.asarray(refined.points), np.asarray(refined.point_valid),
                np.asarray(refined.cam_tr), float(chi2))

    @property
    def n_active_tracks(self) -> int:
        return int(np.asarray(self._state.active).sum())
