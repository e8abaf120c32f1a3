"""Feature descriptor gathers.

32-byte descriptor: Sobel du/dv samples at 16 fixed offsets around the feature
(reference matcher.cpp:433-477 computeDescriptor); 16-byte "small" ELAS
descriptor used by match refinement (matcher.cpp:479-506).

Implemented as vectorized flat gathers over the gradient images — one
[N, 16]-index gather per gradient channel. Descriptors are stored interleaved
(du, dv, du, dv, ...) in the exact reference byte order so SAD costs are
directly comparable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# (dx, dy) sample positions, in reference byte order for the large descriptor
# pairs; each position contributes a du byte then a dv byte
# (matcher.cpp:445-476: addr_m1=(u,v-1), m3=(u,v-3), m5=(u,v-5), p*=below).
DESC_OFFSETS = (
    (-3, -1), (-3, +1), (-1, -1), (-1, +1),
    (+3, -1), (+3, +1), (+1, -1), (+1, +1),
    (-1, -5), (-1, +5), (+1, -5), (+1, +5),
    (-5, -3), (-5, +3), (+5, -3), (+5, +3),
)

# small (ELAS) descriptor: 12 du samples then 4 dv samples
# (matcher.cpp:490-505; note du[addr2]=(0,0) appears twice).
SMALL_DU_OFFSETS = (
    (0, -2), (-2, -1), (0, -1), (+2, -1), (-1, 0), (0, 0), (0, 0), (+1, 0),
    (-2, +1), (0, +1), (+2, +1), (0, +2),
)
SMALL_DV_OFFSETS = ((0, -1), (-1, 0), (+1, 0), (0, +1))


def _flat_gather(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, offsets):
    """img[v+dy, u+dx] for each offset -> [N, len(offsets)] (clipped indices)."""
    H, W = img.shape
    flat = img.reshape(-1)
    dx = jnp.array([o[0] for o in offsets], jnp.int32)
    dy = jnp.array([o[1] for o in offsets], jnp.int32)
    idx = (v[:, None] + dy[None, :]) * W + (u[:, None] + dx[None, :])
    idx = jnp.clip(idx, 0, H * W - 1)
    return jnp.take(flat, idx, axis=0)


def row_gather_onehot(table: jnp.ndarray, idx: jnp.ndarray,
                      block: int = 128) -> jnp.ndarray:
    """table[idx] as a two-level one-hot selection (MXU + VPU).

    XLA lowers row gathers to sequential SMEM loops on TPU. For tables whose
    values are bf16-exact (u8 image samples), one-hot selection is exact and
    runs at MXU speed. Factorizing idx = q*block + r turns the selection into
    ONE well-shaped [N, M/block] x [M/block, block*C] matmul (row-block
    select) plus a cheap within-block masked reduce — versus a scan of M/8192
    giant [N, 8192] one-hot constructions, whose VPU one-hot building
    dominated. table [M, C], idx [N] -> [N, C] f32."""
    M, C = table.shape
    N = idx.shape[0]
    nq = -(-M // block)
    tpad = jnp.pad(table.astype(jnp.bfloat16),
                   ((0, nq * block - M), (0, 0))).reshape(nq, block * C)
    idx = jnp.clip(idx, 0, M - 1)
    q = idx // block
    r = idx - q * block
    ohq = (q[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, nq), 1)).astype(jnp.bfloat16)          # [N, nq]
    t1 = jnp.einsum("nq,qk->nk", ohq, tpad,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)       # [N, block*C]
    t1 = t1.reshape(N, block, C)
    ohr = (r[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, block), 1)).astype(jnp.float32)         # [N, block]
    return jnp.einsum("nbc,nb->nc", t1, ohr)


@jax.jit
def compute_descriptors(du: jnp.ndarray, dv: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """32-byte descriptors for features at (u, v). Returns [N, 32] uint8
    values (f32 container on TPU).

    TPU path: pre-roll the 32 sample channels into a dense [H*W, 32] stack
    (one vector op per channel) so the per-feature lookup becomes a single
    row gather, executed as a one-hot matmul."""
    if jax.default_backend() == "tpu":
        H, W = du.shape
        chans = []
        for dx, dy in DESC_OFFSETS:
            chans.append(jnp.roll(du, (-dy, -dx), (0, 1)))
            chans.append(jnp.roll(dv, (-dy, -dx), (0, 1)))
        D = jnp.stack(chans, axis=-1).reshape(H * W, 32)
        idx = jnp.clip(v * W + u, 0, H * W - 1)
        return row_gather_onehot(D, idx)
    a = _flat_gather(du, u, v, DESC_OFFSETS)  # [N, 16]
    b = _flat_gather(dv, u, v, DESC_OFFSETS)  # [N, 16]
    return jnp.stack([a, b], axis=-1).reshape(a.shape[0], 32)


@jax.jit
def compute_small_descriptors(du: jnp.ndarray, dv: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """16-byte ELAS descriptors at integer (u, v). Returns [N, 16] uint8."""
    a = _flat_gather(du, u, v, SMALL_DU_OFFSETS)  # [N, 12]
    b = _flat_gather(dv, u, v, SMALL_DV_OFFSETS)  # [N, 4]
    return jnp.concatenate([a, b], axis=-1)
