"""SE(3) helpers matching the reference's Euler convention.

transformationVectorToMatrix (viso.cpp:59-84): Tr = [R(rx,ry,rz) | t] with the
exact element layout the reference uses (R = Rx(rx)^T-ish composition written
out literally); rotation_angles inverts it (viso_mono.cpp:176-178).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transformation_vector_to_matrix(tr: jnp.ndarray) -> jnp.ndarray:
    """tr = [rx, ry, rz, tx, ty, tz] -> 4x4 homogeneous matrix (viso.cpp:59-84)."""
    rx, ry, rz, tx, ty, tz = tr[0], tr[1], tr[2], tr[3], tr[4], tr[5]
    sx, cx = jnp.sin(rx), jnp.cos(rx)
    sy, cy = jnp.sin(ry), jnp.cos(ry)
    sz, cz = jnp.sin(rz), jnp.cos(rz)
    row0 = jnp.stack([cy * cz, -cy * sz, sy, tx])
    row1 = jnp.stack([sx * sy * cz + cx * sz, -sx * sy * sz + cx * cz, -sx * cy, ty])
    row2 = jnp.stack([-cx * sy * cz + sx * sz, cx * sy * sz + sx * cz, cx * cy, tz])
    row3 = jnp.array([0.0, 0.0, 0.0, 1.0], tr.dtype)
    return jnp.stack([row0, row1, row2, row3])


def rotation_angles(R: jnp.ndarray):
    """Recover (rx, ry, rz) from the rotation above (viso_mono.cpp:176-178)."""
    ry = jnp.arcsin(jnp.clip(R[0, 2], -1.0, 1.0))
    cy = jnp.cos(ry)
    rx = jnp.arcsin(jnp.clip(-R[1, 2] / cy, -1.0, 1.0))
    rz = jnp.arcsin(jnp.clip(-R[0, 1] / cy, -1.0, 1.0))
    return rx, ry, rz


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Rigid-transform inverse (replaces Matrix::inv in sfm.hh:57)."""
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti
