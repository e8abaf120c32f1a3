"""Distributed bundle adjustment with Schur-complement elimination.

The reference refines each 3-D point independently with the cameras frozen
(reconstruction.cpp:179-299) — there is no joint optimization anywhere in it.
This module is the missing capability the TPU framework adds (BASELINE.json
configs[4]): windowed/global BA over keyframes + landmarks where

  * landmarks (and their observations) are SHARDED across the device mesh,
  * each device reduces its landmarks into partial camera-system blocks
    (the Schur complement S = U - W V^-1 W^T and its rhs),
  * partials are summed with jax.lax.psum over the mesh axis (ICI within a
    slice, DCN across hosts),
  * the small camera system is solved replicated, and landmark updates
    back-substitute locally (no communication).

Camera convention matches the engine: world->cam, params [rx ry rz tx ty tz]
with the reference Euler composition (viso.cpp:59-84).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.stereo_gn import rotation_and_derivatives


class BAProblem(NamedTuple):
    cam_tr: jnp.ndarray       # [Nc, 6] camera params (world->cam)
    points: jnp.ndarray       # [Nl, 3] world points
    obs_uv: jnp.ndarray       # [Nl, K, 2] pixel observations
    obs_cam: jnp.ndarray      # [Nl, K] int32 camera index
    obs_mask: jnp.ndarray     # [Nl, K] bool
    point_valid: jnp.ndarray  # [Nl] bool
    # per-observation rigid stereo-baseline offset along camera x (0 = the
    # anchor/left camera, `base` = the rectified right camera of the same
    # keyframe). Lets one camera index carry BOTH images of a stereo rig
    # without doubling the camera system: x_cam -> x_cam - obs_base before
    # projection; all Jacobians are unchanged (the shift is constant).
    obs_base: jnp.ndarray = None


def _with_obs_base(problem: BAProblem) -> BAProblem:
    """Normalize obs_base to a zeros array (mono problems may omit it).
    numpy (not jnp) so multi-controller pjit accepts it as
    process-replicated input alongside global arrays."""
    if problem.obs_base is None:
        return problem._replace(
            obs_base=np.zeros(problem.obs_cam.shape, np.float32))
    return problem


def _project_and_jacobians(cam_tr, points, obs_cam, obs_mask, intr,
                           obs_base):
    """Per-observation residual pieces.

    Returns (r [Nl,K,2], Jc [Nl,K,2,6], Jx [Nl,K,2,3]) with masked rows
    zeroed. intr = [f, cu, cv].
    """
    f, cu, cv = intr[0], intr[1], intr[2]
    R, Rdx, Rdy, Rdz = rotation_and_derivatives(cam_tr)  # [Nc,3,3] each
    Nc = cam_tr.shape[0]
    c = jnp.clip(obs_cam, 0, Nc - 1)
    Rc = R[c]            # [Nl,K,3,3]
    tc = cam_tr[c, 3:6]  # [Nl,K,3]
    X = points[:, None, :]                                   # [Nl,1,3]
    xc = jnp.einsum("lkij,lkj->lki", Rc, jnp.broadcast_to(X, Rc.shape[:2] + (3,))) + tc
    # rigid stereo-baseline shift (right camera at x - b); constant wrt the
    # parameters, so all Jacobians below are untouched
    xc = xc - jnp.stack([obs_base, jnp.zeros_like(obs_base),
                         jnp.zeros_like(obs_base)], -1)
    x, y, z = xc[..., 0], xc[..., 1], xc[..., 2]
    z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)

    # image jacobian wrt camera-frame point: [Nl,K,2,3]
    zi = 1.0 / z
    du_dxc = jnp.stack([f * zi, jnp.zeros_like(z), -f * x * zi * zi], -1)
    dv_dxc = jnp.stack([jnp.zeros_like(z), f * zi, -f * y * zi * zi], -1)
    Jimg = jnp.stack([du_dxc, dv_dxc], -2)

    # camera-frame point derivative wrt the 6 camera params: [Nl,K,3,6]
    Xb = jnp.broadcast_to(X, Rc.shape[:2] + (3,))
    d_rot = jnp.stack([
        jnp.einsum("lkij,lkj->lki", Rdx[c], Xb),
        jnp.einsum("lkij,lkj->lki", Rdy[c], Xb),
        jnp.einsum("lkij,lkj->lki", Rdz[c], Xb),
    ], -1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cam_tr.dtype),
                           d_rot.shape[:-2] + (3, 3))
    dxc = jnp.concatenate([d_rot, eye], -1)  # [Nl,K,3,6]

    Jc = jnp.einsum("lkai,lkij->lkaj", Jimg, dxc)   # [Nl,K,2,6]
    Jx = jnp.einsum("lkai,lkij->lkaj", Jimg, Rc)    # [Nl,K,2,3]

    return Jc, Jx, xc


def _residuals(obs_uv, xc, intr):
    f, cu, cv = intr[0], intr[1], intr[2]
    z = jnp.where(jnp.abs(xc[..., 2]) > 1e-6, xc[..., 2], 1e-6)
    pred = jnp.stack([f * xc[..., 0] / z + cu, f * xc[..., 1] / z + cv], -1)
    return obs_uv - pred


def _local_schur(cam_tr, points, obs_uv, obs_cam, obs_mask, point_valid,
                 intr, damping, obs_base):
    """Per-shard Schur pieces. Returns (S [Nc,6,Nc,6], rhs [Nc,6],
    Vinv [Nl,3,3], bl [Nl,3], W [Nl,K,6,3], chi2)."""
    Nc = cam_tr.shape[0]
    mask = obs_mask & point_valid[:, None]
    mf = mask[..., None, None].astype(cam_tr.dtype)

    Jc, Jx, xc = _project_and_jacobians(cam_tr, points, obs_cam, obs_mask,
                                        intr, obs_base)
    r = _residuals(obs_uv, xc, intr) * mask[..., None]
    Jc = Jc * mf
    Jx = Jx * mf

    chi2 = jnp.sum(r * r)

    U_blocks = jnp.einsum("lkai,lkaj->lkij", Jc, Jc)      # [Nl,K,6,6]
    V = jnp.einsum("lkai,lkaj->lij", Jx, Jx)               # [Nl,3,3]
    W = jnp.einsum("lkai,lkaj->lkij", Jc, Jx)              # [Nl,K,6,3]
    bc_obs = jnp.einsum("lkai,lka->lki", Jc, r)            # [Nl,K,6]
    bl = jnp.einsum("lkai,lka->li", Jx, r)                 # [Nl,3]

    from ..ops.linalg import inv3

    V = V + damping * jnp.broadcast_to(jnp.eye(3, dtype=V.dtype), V.shape)
    Vinv = inv3(V)

    # camera-block scatter (U and bc)
    c = jnp.clip(obs_cam, 0, Nc - 1).reshape(-1)
    U_cam = (jnp.zeros((Nc, 6, 6), cam_tr.dtype)
             .at[c].add(U_blocks.reshape(-1, 6, 6)))
    b_cam = jnp.zeros((Nc, 6), cam_tr.dtype).at[c].add(bc_obs.reshape(-1, 6))

    # Schur cross terms: for each landmark, all (k, k') camera pairs
    WV = jnp.einsum("lkij,ljm->lkim", W, Vinv)             # [Nl,K,6,3]
    cross = jnp.einsum("lkim,lqjm->lkqij", WV, W)          # [Nl,K,K,6,6]
    ck = jnp.broadcast_to(jnp.clip(obs_cam, 0, Nc - 1)[:, :, None],
                          cross.shape[:3]).reshape(-1)
    cq = jnp.broadcast_to(jnp.clip(obs_cam, 0, Nc - 1)[:, None, :],
                          cross.shape[:3]).reshape(-1)
    S = (jnp.zeros((Nc, Nc, 6, 6), cam_tr.dtype)
         .at[ck, cq].add(cross.reshape(-1, 6, 6)))
    rhs_corr = jnp.einsum("lkim,lm->lki", WV, bl)           # [Nl,K,6]
    rhs = b_cam - (jnp.zeros((Nc, 6), cam_tr.dtype)
                   .at[c].add(rhs_corr.reshape(-1, 6)))

    S_full = (_blockdiag(U_cam) - S.transpose(0, 2, 1, 3))
    return S_full, rhs, Vinv, bl, W, chi2


def _blockdiag(U_cam):
    Nc = U_cam.shape[0]
    out = jnp.zeros((Nc, 6, Nc, 6), U_cam.dtype)
    idx = jnp.arange(Nc)
    return out.at[idx, :, idx, :].set(U_cam)


def _solve_cameras(S, rhs, damping, n_fixed: int):
    """Solve the reduced camera system with the first n_fixed cameras pinned
    (gauge freedom)."""
    Nc = S.shape[0]
    A = S.reshape(Nc * 6, Nc * 6)
    A = A + damping * jnp.eye(Nc * 6, dtype=A.dtype)
    b = rhs.reshape(Nc * 6)
    fixed = (jnp.arange(Nc * 6) < n_fixed * 6)
    A = jnp.where(fixed[:, None] | fixed[None, :],
                  jnp.eye(Nc * 6, dtype=A.dtype), A)
    b = jnp.where(fixed, 0.0, b)
    dc = jnp.linalg.solve(A, b)
    return dc.reshape(Nc, 6)


def ba_step_local(problem: BAProblem, intr, damping, n_fixed: int = 1,
                  axis_name: str | None = None):
    """One Gauss-Newton/LM step. If axis_name is given, landmark arrays are
    assumed sharded along it and partial camera systems are psum-reduced."""
    problem = _with_obs_base(problem)
    S, rhs, Vinv, bl, W, chi2 = _local_schur(
        problem.cam_tr, problem.points, problem.obs_uv, problem.obs_cam,
        problem.obs_mask, problem.point_valid, intr, damping,
        problem.obs_base)
    if axis_name is not None:
        S = jax.lax.psum(S, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)
        chi2 = jax.lax.psum(chi2, axis_name)
    dc = _solve_cameras(S, rhs, damping, n_fixed)

    # landmark back-substitution: dx = Vinv (bl - sum_k W_k^T dc_{cam_k})
    Nc = problem.cam_tr.shape[0]
    dck = dc[jnp.clip(problem.obs_cam, 0, Nc - 1)]          # [Nl,K,6]
    corr = jnp.einsum("lkim,lki->lm", W, dck)                # [Nl,3]
    dx = jnp.einsum("lij,lj->li", Vinv, bl - corr)
    dx = jnp.where(problem.point_valid[:, None], dx, 0.0)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    dc = jnp.where(jnp.isfinite(dc), dc, 0.0)

    new = problem._replace(cam_tr=problem.cam_tr + dc,
                           points=problem.points + dx)
    return new, chi2


def make_distributed_ba_step(mesh: Mesh, intr, damping: float = 1e-3,
                             n_fixed: int = 1, axis: str = "data"):
    """Build a pjit-ed BA step with landmarks sharded over `axis`.

    Landmark-indexed arrays use PartitionSpec(axis); camera arrays are
    replicated. Collectives: one psum of [Nc,6,Nc,6] + [Nc,6] partials per
    step (rides ICI).
    """
    intr = jnp.asarray(intr, jnp.float32)

    lspec = P(axis)
    in_specs = BAProblem(cam_tr=P(), points=lspec, obs_uv=lspec,
                         obs_cam=lspec, obs_mask=lspec, point_valid=lspec,
                         obs_base=lspec)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs, P()),
        out_specs=(in_specs, P()), check_vma=False)
    def step(problem, damp):
        new, chi2 = ba_step_local(problem, intr, damp[0],
                                  n_fixed=n_fixed, axis_name=axis)
        return new, chi2

    jitted = jax.jit(step)

    def call(problem, damp=None):
        # per-call damping (traced, no recompile) for adaptive LM loops;
        # defaults to the constructor value. Plain numpy so multi-process
        # meshes treat it as process-replicated input.
        d = np.full((1,), damping if damp is None else damp, np.float32)
        return jitted(_with_obs_base(problem), d)

    return call


def run_ba(problem: BAProblem, intr, iters: int = 10, damping: float = 1e-3,
           n_fixed: int = 1, mesh: Mesh | None = None, axis: str = "data"):
    """Iterate BA steps; single-device when mesh is None."""
    step = make_ba_step(intr, damping=damping, n_fixed=n_fixed, mesh=mesh,
                        axis=axis)
    chi = None
    for _ in range(iters):
        problem, chi = step(problem)
    return problem, chi


def make_ba_step(intr, damping: float = 1e-3, n_fixed: int = 1,
                 mesh: Mesh | None = None, axis: str = "data"):
    """Uniform step factory: (problem, damp=None) -> (new_problem, chi2),
    local when mesh is None, landmark-sharded otherwise. `damp` is a traced
    per-call damping override (adaptive LM re-invokes without recompiling).
    The returned chi2 is evaluated at the INPUT state (before the update)."""
    if mesh is not None:
        return make_distributed_ba_step(mesh, intr, damping, n_fixed, axis)
    intrj = jnp.asarray(intr, jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def jitted(pr, d):
        return ba_step_local(pr, intrj, d, n_fixed=n_fixed)

    def call(problem, damp=None):
        return jitted(problem,
                      jnp.float32(damping if damp is None else damp))

    return call


@jax.jit
def problem_from_recon(state, K: jnp.ndarray) -> BAProblem:
    """Windowed BA problem over the reconstruction's ACTIVE tracks.

    Cameras are the recent pose ring (frames_ago 0..FRAME_CAP-1, world frame
    = current camera, world->cam_k = fwd_k^-1); landmarks are active tracks
    with >= 2 observations, initialized by the same 2-view orthogonal-
    regression triangulation the reference's initPoint uses
    (reconstruction.cpp:148-177). Wire the result through run_ba /
    make_distributed_ba_step (landmarks sharded, camera system psum-reduced)
    and write back with apply_refined_points.
    """
    from ..models.reconstruction import FRAME_CAP, _se3_inv
    from ..ops.linalg import smallest_right_singular_vector
    from ..ops.se3 import rotation_angles

    fwd = state.fwd                       # [F,4,4] cam_k -> current camera
    inv = _se3_inv(fwd)                   # world(current cam) -> cam_k
    proj = jnp.einsum("ij,fjk->fik", K, inv[:, :3, :])  # [F,3,4]

    def to_tr(T):
        rx, ry, rz = rotation_angles(T)
        return jnp.stack([rx, ry, rz, T[0, 3], T[1, 3], T[2, 3]])

    cam_tr = jax.vmap(to_tr)(inv)         # [F,6]

    L = state.px_u.shape[1]
    obs_j = jnp.arange(L, dtype=jnp.int32)[None, :]
    obs_ago = jnp.clip(state.first_ago[:, None] - obs_j, 0, FRAME_CAP - 1)
    obs_mask = (obs_j < state.length[:, None]) & state.active[:, None]

    # 2-view triangulation from first/last observation
    first_ago = jnp.clip(state.first_ago, 0, FRAME_CAP - 1)
    last_ago = jnp.clip(state.first_ago - (state.length - 1), 0,
                        FRAME_CAP - 1)
    P1 = proj[first_ago]
    P2 = proj[last_ago]
    u1, v1 = state.px_u[:, 0], state.px_v[:, 0]
    li = jnp.clip(state.length - 1, 0, L - 1)
    u2 = jnp.take_along_axis(state.px_u, li[:, None], 1)[:, 0]
    v2 = jnp.take_along_axis(state.px_v, li[:, None], 1)[:, 0]
    J0 = jnp.stack([
        P1[:, 2, :] * u1[:, None] - P1[:, 0, :],
        P1[:, 2, :] * v1[:, None] - P1[:, 1, :],
        P2[:, 2, :] * u2[:, None] - P2[:, 0, :],
        P2[:, 2, :] * v2[:, None] - P2[:, 1, :],
    ], axis=1)
    Xh = smallest_right_singular_vector(J0)
    w = Xh[:, 3]
    ok_w = jnp.abs(w) >= 1e-10
    pts = Xh[:, :3] / jnp.where(ok_w, w, 1.0)[:, None]

    valid = (state.active & (state.length >= 2) & ok_w
             & jnp.all(jnp.isfinite(pts), axis=1))
    return BAProblem(
        cam_tr=cam_tr,
        points=jnp.where(valid[:, None], pts, 0.0),
        obs_uv=jnp.stack([state.px_u, state.px_v], -1),
        obs_cam=obs_ago,
        obs_mask=obs_mask,
        point_valid=valid,
    )


def synthetic_problem(n_cams: int, n_pts: int, k_obs: int, seed: int = 0,
                      noise: float = 0.5, intr=(500.0, 320.0, 160.0)):
    """Random well-conditioned BA problem with ground truth (for tests)."""
    rng = np.random.RandomState(seed)
    f, cu, cv = intr
    # cameras along a line, looking +z
    gt_tr = np.zeros((n_cams, 6))
    gt_tr[:, 5] = -np.arange(n_cams) * 1.0  # t_z = -i -> camera at z=+i
    pts = np.stack([rng.uniform(-10, 10, n_pts),
                    rng.uniform(-5, 5, n_pts),
                    rng.uniform(n_cams + 5, n_cams + 40, n_pts)], 1)
    obs_cam = np.stack([rng.choice(n_cams, k_obs, replace=False)
                        for _ in range(n_pts)])
    xc = pts[:, None, :] + np.concatenate(
        [np.zeros((n_pts, k_obs, 2)), gt_tr[obs_cam][..., 5:6]], -1)
    uv = np.stack([f * xc[..., 0] / xc[..., 2] + cu,
                   f * xc[..., 1] / xc[..., 2] + cv], -1)
    uv += rng.randn(*uv.shape) * noise
    prob = BAProblem(
        cam_tr=jnp.asarray(gt_tr + rng.randn(n_cams, 6) * 0.01, jnp.float32),
        points=jnp.asarray(pts + rng.randn(n_pts, 3) * 0.3, jnp.float32),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_mask=jnp.ones((n_pts, k_obs), bool),
        point_valid=jnp.ones((n_pts,), bool),
    )
    return prob, np.asarray(gt_tr), pts
