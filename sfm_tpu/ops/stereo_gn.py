"""Stereo egomotion Gauss-Newton: batched residuals, Jacobians and solves.

Reference (viso/viso_stereo.cpp): RANSAC draws 3 stereo correspondences,
runs <=21 damped-free GN iterations on the 6-dof motion minimizing the 4-D
stereo reprojection error with the analytic Euler-derivative Jacobian
(computeResidualsAndJacobian, viso_stereo.cpp:225-315), counts 4-D
reprojection inliers (<2 px, getInlier :147-165), then refines on all
inliers (<=101 iterations, eps 1e-8).

TPU shape: the 200 hypotheses are a batch axis; each GN iteration is a
batched [B,3]-point Jacobian build + [B,6,6] solve. The final refinement is
the same code with one hypothesis and a weighted mask over all matches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# GN status codes (reference enum UPDATED/FAILED/CONVERGED)
UPDATED, FAILED, CONVERGED = 0, 1, 2


def rotation_and_derivatives(tr: jnp.ndarray):
    """R(rx,ry,rz) and dR/drx, dR/dry, dR/drz exactly as written out in
    viso_stereo.cpp:236-246. tr: [..., 6]."""
    rx, ry, rz = tr[..., 0], tr[..., 1], tr[..., 2]
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    z = jnp.zeros_like(rx)

    def mat(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    R = mat([[cy * cz, -cy * sz, sy],
             [sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy],
             [-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy]])
    Rdx = mat([[z, z, z],
               [cx * sy * cz - sx * sz, -cx * sy * sz - sx * cz, -cx * cy],
               [sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy]])
    Rdy = mat([[-sy * cz, sy * sz, cy],
               [sx * cy * cz, -sx * cy * sz, sx * sy],
               [-cx * cy * cz, cx * cy * sz, -cx * sy]])
    Rdz = mat([[-cy * sz, -cy * cz, z],
               [-sx * sy * sz + cx * cz, -sx * sy * cz - cx * sz, z],
               [cx * sy * sz + sx * cz, cx * sy * cz - sx * sz, z]])
    return R, Rdx, Rdy, Rdz


def residuals_and_jacobian(tr, pts, obs, wmask, calib, reweighting=True):
    """tr [...,6]; pts [...,M,3] previous-frame 3D; obs [...,M,4]
    (u1c,v1c,u2c,v2c); wmask [...,M] 0/1 row mask; calib [f,cu,cv,base].

    Returns (J [...,M,4,6], resid [...,M,4], pred [...,M,4]); J and resid are
    multiplied by the reference's reweighting factor x row mask."""
    f, cu, cv, base = calib[0], calib[1], calib[2], calib[3]
    R, Rdx, Rdy, Rdz = rotation_and_derivatives(tr)
    t = tr[..., None, 3:6]  # [...,1,3]

    Xc = jnp.einsum("...ij,...mj->...mi", R, pts) + t  # [...,M,3]
    X1c, Y1c, Z1c = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    X2c = X1c - base
    Z2 = Z1c * Z1c

    # reweighting 1/(|u1c-cu|/|cu| + 0.05), weight=1 when disabled
    # (viso_stereo.cpp:265-269, toggle viso_stereo.h:41)
    if reweighting:
        weight = 1.0 / (jnp.abs(obs[..., 0] - cu) / jnp.abs(cu) + 0.05)
        weight = weight * wmask
    else:
        weight = wmask * jnp.ones_like(obs[..., 0])

    # derivative of Xc wrt the 6 params: rotations act on pts, translations
    # are unit vectors (viso_stereo.cpp:278-294)
    dX_rot = jnp.stack([
        jnp.einsum("...ij,...mj->...mi", Rdx, pts).at[..., 0].set(0.0),
        jnp.einsum("...ij,...mj->...mi", Rdy, pts),
        jnp.einsum("...ij,...mj->...mi", Rdz, pts),
    ], axis=-1)  # [...,M,3,3(param)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tr.dtype), dX_rot.shape[:-2] + (3, 3))
    dXc = jnp.concatenate([dX_rot, eye], axis=-1)  # [...,M,3,6]
    X1cd = dXc[..., 0, :]
    Y1cd = dXc[..., 1, :]
    Z1cd = dXc[..., 2, :]

    w = (weight * f)[..., None]
    Ju1 = w * (X1cd * Z1c[..., None] - X1c[..., None] * Z1cd) / Z2[..., None]
    Jv1 = w * (Y1cd * Z1c[..., None] - Y1c[..., None] * Z1cd) / Z2[..., None]
    Ju2 = w * (X1cd * Z1c[..., None] - X2c[..., None] * Z1cd) / Z2[..., None]
    J = jnp.stack([Ju1, Jv1, Ju2, Jv1], axis=-2)  # [...,M,4,6]; right v' == left v'

    pred = jnp.stack([
        f * X1c / Z1c + cu,
        f * Y1c / Z1c + cv,
        f * X2c / Z1c + cu,
        f * Y1c / Z1c + cv,
    ], axis=-1)
    resid = weight[..., None] * (obs - pred)
    return J, resid, pred


def predict_observations(tr, pts, calib):
    """Predictions only (for inlier counting)."""
    f, cu, cv, base = calib[0], calib[1], calib[2], calib[3]
    R, _, _, _ = rotation_and_derivatives(tr)
    Xc = jnp.einsum("...ij,...mj->...mi", R, pts) + tr[..., None, 3:6]
    X1c, Y1c, Z1c = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    return jnp.stack([
        f * X1c / Z1c + cu,
        f * Y1c / Z1c + cv,
        f * (X1c - base) / Z1c + cu,
        f * Y1c / Z1c + cv,
    ], axis=-1)


def gn_solve(tr, pts, obs, wmask, calib, iters: int, eps: float,
             reweighting: bool = True):
    """Run the reference's iterate-until-converged loop with a static bound.

    Returns (tr, status [...]) where status follows the reference enum:
    CONVERGED only if the last solve's step was < eps everywhere
    (viso_stereo.cpp:96-102 / 115-131 semantics).

    Implemented as a while_loop that exits as soon as every batch element has
    converged or failed — typical GN needs ~5-10 of the allowed iterations,
    and each sequential iteration costs fixed device latency, so early exit
    is a large win over a fixed-length scan."""

    def one_iter(state):
        it, tr, status = state
        J, resid, _ = residuals_and_jacobian(tr, pts, obs, wmask, calib,
                                             reweighting)
        Jf = J.reshape(J.shape[:-3] + (-1, 6))
        rf = resid.reshape(resid.shape[:-2] + (-1,))
        A = jnp.einsum("...ki,...kj->...ij", Jf, Jf)
        b = jnp.einsum("...ki,...k->...i", Jf, rf)
        from .linalg import solve_spd_small

        x, solve_ok = solve_spd_small(A, b)
        active = status == UPDATED
        step_small = jnp.all(jnp.abs(x) <= eps, axis=-1)
        new_tr = jnp.where((active & solve_ok)[..., None], tr + x, tr)
        new_status = jnp.where(
            active,
            jnp.where(solve_ok,
                      jnp.where(step_small, CONVERGED, UPDATED),
                      FAILED),
            status)
        return it + 1, new_tr, new_status

    def cond(state):
        it, _, status = state
        return (it < iters) & jnp.any(status == UPDATED)

    def body(state):
        # unroll 3 GN iterations per while step: each sequential device step
        # costs fixed latency and non-UPDATED elements are no-ops, so
        # unrolling is semantically free and ~3x fewer round trips.
        # (Unroll 6 benched WORSE — the average overshoot past convergence
        # costs more than the saved cond trips, BASELINE.md round-4 ledger.)
        state = one_iter(state)
        state = one_iter(state)
        return one_iter(state)

    status0 = jnp.zeros(tr.shape[:-1], jnp.int32)  # UPDATED
    _, tr, status = jax.lax.while_loop(cond, body,
                                       (jnp.int32(0), tr, status0))
    return tr, status
