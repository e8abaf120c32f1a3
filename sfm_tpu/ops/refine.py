"""Match coordinate refinement on full-resolution gradients.

Pixel mode (refinement=1): re-locate the target coordinate at the SAD minimum
of a 5x5 neighborhood of 16-byte small descriptors (matcher.cpp:1456-1496
relocateMinimum). Subpixel mode (refinement=2): 7x7 SAD cost surface +
least-squares paraboloid fit (matcher.cpp:1379-1454 parabolicFitting);
failures drop the match.

TPU formulation: instead of gathering a 16-byte descriptor at each of the
25/49 candidate positions (25*16 scattered loads per match), each match
gathers ONE gradient patch covering the whole search window per channel, and
the cost surface is assembled from 16 static shifted slices of the patch —
~3x fewer gathered elements and all remaining work is dense VPU math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .descriptors import (SMALL_DU_OFFSETS, SMALL_DV_OFFSETS,
                          compute_small_descriptors)

MARGIN = 6

# (channel, dx, dy) for all 16 small-descriptor samples; summation order is
# irrelevant for the SAD (matcher.cpp:490-505)
_SAMPLES = tuple((0, dx, dy) for dx, dy in SMALL_DU_OFFSETS) + tuple(
    (1, dx, dy) for dx, dy in SMALL_DV_OFFSETS)


def _patches(img, u0, v0, r: int):
    """[M, 2r+1, 2r+1] float32 patches centered at integer (u0, v0).

    (A one-hot matmul over an im2col patch table was tried and is SLOWER
    than the plain gather here: the [H*W, k*k] table costs ~150 MB of HBM
    traffic per channel. A Pallas VMEM-resident kernel is the planned fix —
    see ROADMAP.md.)"""
    H, W = img.shape
    k = 2 * r + 1
    rng = jnp.arange(-r, r + 1, dtype=jnp.int32)
    idx = ((v0[:, None, None] + rng[None, :, None]) * W
           + (u0[:, None, None] + rng[None, None, :]))
    idx = jnp.clip(idx, 0, H * W - 1)
    return jnp.take(img.reshape(-1), idx, axis=0).astype(jnp.float32)


def small_ref_descriptors(du1, dv1, u1, v1, count=None):
    """[16, M] f32 small descriptor (SAMPLE-MAJOR) at integer (u1, v1).

    TPU path: one Pallas patch extraction, transposed to [win, win, M] so
    the 16 static picks are full-lane row reads (picking [M] vectors from a
    [M, 16, 16] layout lowers to strided relayouts costing ~ms). The
    transposed layout is also what _cost_surface_T consumes directly.
    `count` (traced): valid prefix length — the kernel skips blocks beyond
    it."""
    iu1 = u1.astype(jnp.int32)
    iv1 = v1.astype(jnp.int32)
    if jax.default_backend() == "tpu":
        from .pallas_kernels import extract_patches_pallas

        pdu, pdv = extract_patches_pallas(du1, dv1, iu1 - 2, iv1 - 2, count)
        Pt = (jnp.transpose(pdu, (1, 2, 0)), jnp.transpose(pdv, (1, 2, 0)))
        return jnp.stack(
            [Pt[ch][dy + 2, dx + 2, :] for ch, dx, dy in _SAMPLES], axis=0)
    return compute_small_descriptors(du1, dv1, iu1, iv1).astype(
        jnp.float32).T


def _cost_surface_T(du1, dv1, du2, dv2, u1, v1, u2, v2, g: int, ref=None,
                    count=None):
    """[(2g+1)^2, M] SAD cost of the small descriptor at (u1,v1) in image 1
    vs positions (u2+du, v2+dv), |du|,|dv| <= g, in image 2.

    Candidate-major (rows ordered dv-major like the reference loops) with
    matches on the MINOR axis: a [M, n, n] layout puts the 5/7-wide
    candidate axes on the 128-lane dimension and wastes 24/25 of every
    vector op; transposing the patches once makes all 16 accumulation ops
    full-lane [n, n, M] work (~10x less device time at M=2048)."""
    iu2 = u2.astype(jnp.int32)
    iv2 = v2.astype(jnp.int32)
    if ref is None:
        ref = small_ref_descriptors(du1, dv1, u1, v1, count)
    r = g + 2  # descriptor samples reach +-2 around each candidate
    if jax.default_backend() == "tpu":
        from .pallas_kernels import extract_patches_pallas

        # fixed 16x16 window with top-left (v2-r, u2-r); sample (dy, dx) of
        # candidate (dv, du) sits at [dv+dy+r, du+dx+r] relative to top-left
        pdu, pdv = extract_patches_pallas(du2, dv2, iu2 - r, iv2 - r, count)
        P = [pdu, pdv]
        base = r - g  # == 2 for both window sizes
    else:
        P = [_patches(du2, iu2, iv2, r), _patches(dv2, iu2, iv2, r)]
        base = r - g
    return _surface_T_from_patches(P, ref, g, base)


def _surface_T_from_patches(P, ref, g: int, base: int):
    """[(2g+1)^2, M] SAD surface from pre-extracted window patches
    P = (pdu, pdv) [M, win, win] and sample-major ref [16, M]."""
    M = ref.shape[1]
    n = 2 * g + 1
    Pt = [jnp.transpose(x, (1, 2, 0)) for x in P]  # [win, win, M]
    cost = jnp.zeros((n, n, M), jnp.float32)
    for k, (ch, dx, dy) in enumerate(_SAMPLES):
        s = Pt[ch][base + dy: base + dy + n, base + dx: base + dx + n, :]
        cost = cost + jnp.abs(s - ref[k][None, None, :])
    return cost.reshape(n * n, M)


@jax.jit
def relocate_minimum(
    du1, dv1, du2, dv2,
    u1, v1, u2, v2,
    w2: jnp.ndarray, h2: jnp.ndarray,
    ref=None, count=None,
):
    """Vectorized relocateMinimum. Returns updated (u2, v2).

    Out-of-margin targets are left unchanged (matcher.cpp:1464-1465).
    `ref` optionally supplies precomputed small_ref_descriptors(du1, dv1,
    u1, v1) so callers refining several targets share one extraction;
    `count` is the valid-prefix length for kernel block skipping."""
    m = jnp.float32(MARGIN)
    feasible = ((u2 - 2 >= m) & (u2 + 2 <= w2 - 1 - m) &
                (v2 - 2 >= m) & (v2 + 2 <= h2 - 1 - m))
    costT = _cost_surface_T(du1, dv1, du2, dv2, u1, v1, u2, v2, 2, ref,
                            count)  # [25, M], dv-major rows
    best = jnp.argmin(costT, axis=0).astype(jnp.float32)  # first-min
    du_off = jnp.mod(best, 5.0) - 2.0
    dv_off = jnp.floor(best / 5.0) - 2.0
    return (jnp.where(feasible, u2 + du_off, u2),
            jnp.where(feasible, v2 + dv_off, v2))


def relocate_minimum_prefix(du1, dv1, du2, dv2, u1, v1, u2, v2, w2, h2,
                            window: int | None = None, ref=None, count=None):
    """relocate_minimum on the first `window` (compacted) matches only; the
    tail passes through unrefined. The patch gathers are the most
    gather-bound op in the frame, and valid matches live in a prefix."""
    n = u1.shape[0]
    if window is None or window >= n:
        return relocate_minimum(du1, dv1, du2, dv2, u1, v1, u2, v2, w2, h2,
                                ref, count)
    un, vn = relocate_minimum(du1, dv1, du2, dv2, u1[:window], v1[:window],
                              u2[:window], v2[:window], w2, h2, ref, count)
    return (jnp.concatenate([un, u2[window:]]),
            jnp.concatenate([vn, v2[window:]]))


def parabolic_fitting_prefix(du1, dv1, du2, dv2, u1, v1, u2, v2, w2, h2,
                             window: int | None = None, ref=None, count=None):
    """parabolic_fitting on the first `window` (compacted) matches; the tail
    passes through unrefined with ok=True (valid matches live in a prefix,
    see relocate_minimum_prefix)."""
    n = u1.shape[0]
    if window is None or window >= n:
        return parabolic_fitting(du1, dv1, du2, dv2, u1, v1, u2, v2, w2, h2,
                                 ref, count)
    un, vn, ok = parabolic_fitting(du1, dv1, du2, dv2, u1[:window],
                                   v1[:window], u2[:window], v2[:window],
                                   w2, h2, ref, count)
    pad_ok = jnp.ones((n - window,), bool)
    return (jnp.concatenate([un, u2[window:]]),
            jnp.concatenate([vn, v2[window:]]),
            jnp.concatenate([ok, pad_ok]))


def _fit_matrix() -> np.ndarray:
    """(A^T A)^-1 A^T for the 9-point paraboloid LS fit (matcher.cpp:1508-1519)."""
    rows = []
    for i in (-1, 0, 1):      # dv
        for j in (-1, 0, 1):  # du
            rows.append([j * j, i * i, i * j, j, i, 1])
    A = np.array(rows, np.float64)
    return np.linalg.solve(A.T @ A, A.T)  # [6, 9]


_FIT = jnp.asarray(_fit_matrix(), jnp.float32)


@jax.jit
def parabolic_fitting(
    du1, dv1, du2, dv2,
    u1, v1, u2, v2,
    w2: jnp.ndarray, h2: jnp.ndarray,
    ref=None, count=None,
):
    """Vectorized parabolicFitting. Returns (u2', v2', ok).

    ok=False matches must be dropped (matcher.cpp:1546-1548). Out-of-margin
    targets fail outright (matcher.cpp:1388-1389). `ref` optionally supplies
    precomputed small_ref_descriptors(du1, dv1, u1, v1)."""
    m = jnp.float32(MARGIN)
    feasible = ((u2 - 3 >= m) & (u2 + 3 <= w2 - 1 - m) &
                (v2 - 3 >= m) & (v2 + 3 <= h2 - 1 - m))
    costT = _cost_surface_T(du1, dv1, du2, dv2, u1, v1, u2, v2, 3, ref,
                            count)  # [49, M], dv-major rows
    best = jnp.argmin(costT, axis=0).astype(jnp.int32)
    bu = best % 7
    bv = best // 7
    interior = (bu > 0) & (bu < 6) & (bv > 0) & (bv < 6)

    # 3x3 cost patch around the minimum, row-major in (i=dv, j=du)
    ii = jax.lax.broadcasted_iota(jnp.int32, (9,), 0) // 3 - 1
    jj = jax.lax.broadcasted_iota(jnp.int32, (9,), 0) % 3 - 1
    safe_bu = jnp.clip(bu, 1, 5)
    safe_bv = jnp.clip(bv, 1, 5)
    patch_idx = ((safe_bv[None, :] + ii[:, None]) * 7
                 + (safe_bu[None, :] + jj[:, None]))     # [9, M]
    c = jnp.take_along_axis(costT, patch_idx, axis=0)    # [9, M]
    b = _FIT @ c                                         # [6, M]
    b0, b1, b2, b3, b4 = b[0], b[1], b[2], b[3], b[4]
    divisor = b2 * b2 - 4.0 * b0 * b1
    ok_div = (jnp.abs(divisor) >= 1e-8) & (jnp.abs(b2) >= 1e-8)
    ddv = (2.0 * b0 * b4 - b2 * b3) / jnp.where(ok_div, divisor, 1.0)
    ddu = -(b4 + 2.0 * b1 * ddv) / jnp.where(ok_div, b2, 1.0)
    ok_step = (jnp.abs(ddu) < 1.0) & (jnp.abs(ddv) < 1.0)
    ok = feasible & interior & ok_div & ok_step
    u_new = u2 + safe_bu.astype(jnp.float32) - 3.0 + ddu
    v_new = v2 + safe_bv.astype(jnp.float32) - 3.0 + ddv
    return (jnp.where(ok, u_new, u2), jnp.where(ok, v_new, v2), ok)
