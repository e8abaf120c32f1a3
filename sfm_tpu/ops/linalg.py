"""Batched small-matrix numerics.

The reference does its linear algebra with a scalar double-precision Matrix
class: Golub-Reinsch SVD (matrix.cpp:586-831) and Gauss-Jordan solves
(matrix.cpp:424-512), invoked thousands of times per frame inside RANSAC and
triangulation loops. On TPU those loops become batch axes, so what we need is
*batched tiny* decompositions. XLA's generic eigh/svd lowers to expensive
algorithms, so we use a fixed-sweep cyclic Jacobi eigensolver: pure VPU ops,
identical control flow for every batch element, fully unrolled at trace time
(d <= 9 -> at most 36 rotations x sweeps).

All routines work in float32 (or whatever dtype comes in) and are
differentiable-free utility code (no custom VJP needed: nothing here is
trained).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def jacobi_eigh(A: jnp.ndarray, sweeps: int = 10):
    """Symmetric eigendecomposition via cyclic Jacobi.

    A: [..., d, d] symmetric. Returns (w, V): eigenvalues ascending and
    eigenvectors as columns, A ~= V @ diag(w) @ V.T.
    """
    d = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(d, dtype=A.dtype), A.shape)
    V = eye

    def rotate(A, V, p, q):
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # robust Jacobi rotation (Golub & Van Loan alg. 8.4.1)
        small = jnp.abs(apq) <= 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        c_ = c[..., None]
        s_ = s[..., None]
        # rows
        Ap = A[..., p, :]
        Aq = A[..., q, :]
        A = A.at[..., p, :].set(c_ * Ap - s_ * Aq)
        A = A.at[..., q, :].set(s_ * Ap + c_ * Aq)
        # cols
        Ap = A[..., :, p]
        Aq = A[..., :, q]
        A = A.at[..., :, p].set(c_ * Ap - s_ * Aq)
        A = A.at[..., :, q].set(s_ * Ap + c_ * Aq)
        # accumulate eigenvectors
        Vp = V[..., :, p]
        Vq = V[..., :, q]
        V = V.at[..., :, p].set(c_ * Vp - s_ * Vq)
        V = V.at[..., :, q].set(s_ * Vp + c_ * Vq)
        return A, V

    def sweep(_, AV):
        A, V = AV
        for p in range(d - 1):
            for q in range(p + 1, d):
                A, V = rotate(A, V, p, q)
        return A, V

    # loop over sweeps (not unrolled: keeps the compiled graph ~sweeps x
    # smaller; the d*(d-1)/2 rotations inside stay static)
    A, V = jax.lax.fori_loop(0, sweeps, sweep, (A, V))

    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def smallest_right_singular_vector(A: jnp.ndarray, sweeps: int = 10) -> jnp.ndarray:
    """v minimizing ||A v|| for A [..., m, n]: smallest eigenvector of A^T A.

    Replaces the reference's per-sample SVD null-space extraction
    (viso_mono.cpp:285-290, :417-418)."""
    AtA = jnp.einsum("...mi,...mj->...ij", A, A)
    _, V = jacobi_eigh(AtA, sweeps)
    return V[..., :, 0]


def rank2_project(F: jnp.ndarray, sweeps: int = 10) -> jnp.ndarray:
    """Zero the smallest singular value: F' = F (I - v3 v3^T)
    (equivalent to viso_mono.cpp:293-295 without forming U)."""
    v3 = smallest_right_singular_vector(F, sweeps)
    eye = jnp.eye(F.shape[-1], dtype=F.dtype)
    P = eye - v3[..., :, None] * v3[..., None, :]
    return F @ P


def svd3(E: jnp.ndarray, sweeps: int = 12):
    """Full 3x3 SVD of a (near) rank-2 matrix: E = U diag(s) V^T.

    s descending; the third left/right singular vectors are completed by
    cross products so U, V are proper even when s3 = 0 (needed by EtoRt,
    viso_mono.cpp:355-366)."""
    w, V = jacobi_eigh(jnp.einsum("...mi,...mj->...ij", E, E), sweeps)
    # ascending -> descending
    w = w[..., ::-1]
    V = V[..., :, ::-1]
    s = jnp.sqrt(jnp.maximum(w, 0.0))
    u0 = jnp.einsum("...ij,...j->...i", E, V[..., :, 0]) / jnp.maximum(s[..., 0:1], 1e-20)
    u1 = jnp.einsum("...ij,...j->...i", E, V[..., :, 1]) / jnp.maximum(s[..., 1:2], 1e-20)
    u2 = jnp.cross(u0, u1)
    v2 = jnp.cross(V[..., :, 0], V[..., :, 1], axis=-1)
    V = V.at[..., :, 2].set(v2)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, V


def solve_spd_small(A: jnp.ndarray, b: jnp.ndarray):
    """Batched solve for small SPD systems (n <= ~8) via fully unrolled
    Cholesky — pure VPU arithmetic.

    jnp.linalg.solve lowers to an XLA custom-call (host round trip on some
    runtimes, serialization on all), which dominated the GN inner loops; the
    unrolled form is branch-free elementwise math. Returns (x, ok) where
    ok=False marks non-SPD systems (the reference's Gauss-Jordan tiny-pivot
    FAILED signal, matrix.cpp:424-512).
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    ok = None
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        okj = s > 1e-20
        ok = okj if ok is None else ok & okj
        Ljj = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = Ljj
        for i in range(j + 1, n):
            t = A[..., i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t / Ljj
    y = [None] * n
    for i in range(n):
        t = b[..., i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * x[k]
        x[i] = t / L[i][i]
    xs = jnp.stack(x, axis=-1)
    ok = ok & jnp.all(jnp.isfinite(xs), axis=-1)
    return xs, ok


def inv3(M: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) > eps, det, eps)
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1),
    ], -2)
    return adj / det[..., None, None]


def det3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 determinant (avoids the linalg custom-call)."""
    return (M[..., 0, 0] * (M[..., 1, 1] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 1])
            - M[..., 0, 1] * (M[..., 1, 0] * M[..., 2, 2] - M[..., 1, 2] * M[..., 2, 0])
            + M[..., 0, 2] * (M[..., 1, 0] * M[..., 2, 1] - M[..., 1, 1] * M[..., 2, 0]))


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """median = sorted(x[mask])[count // 2] (viso_mono.cpp:192-207 picks the
    element at index n/2 of the ascending order)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big))
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.clip(count // 2, 0, x.shape[0] - 1)
    return xs[idx]


# ---------------------------------------------------------------------------
# General small rectangular systems (the reference Matrix library surface)
# ---------------------------------------------------------------------------
# The reference ships a general-N dense library: Gauss-Jordan solve with full
# pivoting (matrix.cpp:424-512), Crout LU (matrix.cpp:521-581) and
# Golub-Reinsch SVD (matrix.cpp:586-831). The pipeline above only ever needs
# the fixed tiny shapes covered by the Jacobi/Cholesky routines, but future
# components (rectangular least squares, rank-revealing factorization) get
# their home here: a batched fixed-shape Householder QR + least-squares,
# fully unrolled at trace time like everything else in this module (columns
# are static, every batch element runs identical control flow on the VPU).


def householder_qr(A: jnp.ndarray):
    """Batched thin Householder QR for [..., m, n] with m >= n (static).

    Returns (Q [..., m, n], R [..., n, n]) with A ~= Q @ R, Q orthonormal
    columns. Column count is a trace-time constant -> n unrolled
    reflections, each a rank-1 batched update (VPU-friendly; no pivoting —
    use lstsq's damping for near-singular systems).
    """
    m, n = A.shape[-2], A.shape[-1]
    assert m >= n, (m, n)
    dt = A.dtype
    R = A
    vs = []
    for k in range(n):
        x = R[..., k:, k]                          # [..., m-k]
        normx = jnp.sqrt(jnp.sum(x * x, -1))
        sign = jnp.where(x[..., 0] >= 0, 1.0, -1.0).astype(dt)
        e0 = jnp.zeros_like(x).at[..., 0].set(1.0)
        v = x + (sign * normx)[..., None] * e0
        vnorm = jnp.sqrt(jnp.sum(v * v, -1))
        v = v / jnp.where(vnorm > 1e-30, vnorm, 1.0)[..., None]
        # apply I - 2 v v^T to the trailing block
        tail = R[..., k:, :]
        tail = tail - 2.0 * v[..., :, None] * jnp.sum(
            v[..., :, None] * tail, axis=-2, keepdims=True)
        R = jnp.concatenate([R[..., :k, :], tail], axis=-2)
        vs.append((k, v))
    # accumulate Q = H_0 ... H_{n-1} @ I_{m x n}
    Q = jnp.broadcast_to(jnp.eye(m, n, dtype=dt), A.shape[:-2] + (m, n))
    for k, v in reversed(vs):
        tail = Q[..., k:, :]
        tail = tail - 2.0 * v[..., :, None] * jnp.sum(
            v[..., :, None] * tail, axis=-2, keepdims=True)
        Q = jnp.concatenate([Q[..., :k, :], tail], axis=-2)
    return Q, jnp.triu(R[..., :n, :])


def solve_triu(R: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-30):
    """Back-substitution for upper-triangular [..., n, n] (unrolled)."""
    n = R.shape[-1]
    xs = [None] * n
    for i in range(n - 1, -1, -1):
        acc = b[..., i]
        for j in range(i + 1, n):
            acc = acc - R[..., i, j] * xs[j]
        d = R[..., i, i]
        xs[i] = acc / jnp.where(jnp.abs(d) > eps, d, eps)
    return jnp.stack(xs, axis=-1)


def lstsq_qr(A: jnp.ndarray, b: jnp.ndarray):
    """Batched least-squares min ||A x - b|| via thin QR.

    A: [..., m, n] (m >= n static), b: [..., m]. Returns x [..., n] — the
    TPU slot of the reference's Matrix::solve on rectangular systems."""
    Q, R = householder_qr(A)
    qtb = jnp.sum(Q * b[..., :, None], axis=-2)
    return solve_triu(R, qtb)
