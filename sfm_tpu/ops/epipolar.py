"""Essential-matrix decomposition and chirality triangulation.

EtoRt (viso_mono.cpp:347-392): E = U diag S V^T; T = U Z U^T gives t, the two
rotation candidates are U W V^T and U W^T V^T (dets forced positive); the
(R, t) pair with the most points in front of both cameras wins. Each
candidate's points come from orthogonal-regression triangulation: the
smallest right singular vector of a per-match 4x4 system
(triangulateChieral, viso_mono.cpp:394-431).

Here all N matches x 4 candidates triangulate in one batched Jacobi pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import smallest_right_singular_vector, svd3

_W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
_Z = jnp.array([[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])


def triangulate_linear(P1: jnp.ndarray, P2: jnp.ndarray,
                       u1, v1, u2, v2) -> jnp.ndarray:
    """Orthogonal-regression triangulation for point batches.

    P1, P2: [..., 3, 4] projections; u/v: [N]. Returns X [..., N, 4]
    homogeneous (unit-norm singular vectors, like the reference's V column).
    """
    def rows(P, u, v):
        # J[0,:] = P[2]*u - P[0]; J[1,:] = P[2]*v - P[1]
        r0 = P[..., None, 2, :] * u[:, None] - P[..., None, 0, :]
        r1 = P[..., None, 2, :] * v[:, None] - P[..., None, 1, :]
        return r0, r1

    a0, a1 = rows(P1, u1, v1)
    b0, b1 = rows(P2, u2, v2)
    a0, a1, b0, b1 = jnp.broadcast_arrays(a0, a1, b0, b1)
    J = jnp.stack([a0, a1, b0, b1], axis=-2)  # [..., N, 4, 4]
    # extra sweeps: the triangulated depths feed the ground-plane density
    # estimate, where f32 eigenvector noise directly biases the mono scale
    return smallest_right_singular_vector(J, sweeps=16)


def e_to_rt(E: jnp.ndarray, K: jnp.ndarray, u1p, v1p, u1c, v1c, valid):
    """Returns (X [N,4], R [3,3], t [3], n_chieral_inliers).

    X is normalized so w=1 is NOT applied here (caller divides, matching
    viso_mono.cpp:140)."""
    U, S, V = svd3(E)
    T = U @ _Z @ U.T
    t = jnp.stack([T[2, 1], T[0, 2], T[1, 0]])
    from .linalg import det3

    Ra = U @ _W @ V.T
    Rb = U @ _W.T @ V.T
    Ra = jnp.where(det3(Ra) < 0, -Ra, Ra)
    Rb = jnp.where(det3(Rb) < 0, -Rb, Rb)

    R4 = jnp.stack([Ra, Ra, Rb, Rb])            # [4,3,3]
    t4 = jnp.stack([t, -t, t, -t])              # [4,3]

    P1 = jnp.concatenate([K, jnp.zeros((3, 1), K.dtype)], axis=1)  # [3,4]
    P2 = K @ jnp.concatenate([R4, t4[:, :, None]], axis=2)         # [4,3,4]

    X = triangulate_linear(P1[None], P2, u1p, v1p, u1c, v1c)  # [4,N,4]

    AX = jnp.einsum("ij,cnj->cni", P1, X)   # [4,N,3]
    BX = jnp.einsum("cij,cnj->cni", P2, X)
    front = (AX[..., 2] * X[..., 3] > 0) & (BX[..., 2] * X[..., 3] > 0)
    counts = jnp.sum((front & valid[None, :]).astype(jnp.int32), axis=1)
    # strict > keeps the first candidate on ties (viso_mono.cpp:383-391)
    best = jnp.argmax(counts)
    return X[best], R4[best], t4[best], counts[best]
