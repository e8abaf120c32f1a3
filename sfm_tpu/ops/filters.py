"""Image filter kernels (TPU-native equivalents of reference viso/filter.{h,cpp}).

The reference implements 5x5 Sobel, 5x5 blob and 5x5 checkerboard filters with
SSE/NEON intrinsics over `uint8` images, producing:
  * Sobel gradients as uint8: ``sat((response >> 7) + 128)``
    (filter.cpp:71-127: scale 1/128, bias +128, unsigned saturation),
  * blob / checkerboard responses as int16 (filter.cpp:331-365).

We reproduce the integer semantics exactly (arithmetic shift = floor division,
saturating u8 pack) with centered windows — which matches the reference SIMD
path exactly: in `convolve_cols_5x5` (filter.cpp:195-196) the `+w_chunk*4`
result offset is in 16-byte `array_8xint16_t` units = 2 rows of int16, which
centers the 5-tap column window. Our outputs are bit-identical to the
`-DUSE_SIMD` reference binary (tests/test_reference_parity.py exact-equality
filter tests, and the on-device kernel gate).

Everything here is pure jnp on int32 (exact), fully fused by XLA on the VPU;
filters are memory-bound so no Pallas kernel is needed — XLA emits a single
fused loop over the image.

Borders: outputs are full-size; values within 2 px of the border are invalid
(the feature extractor never reads closer than ``margin = 6`` from the border,
matcher.cpp:56,344-345).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SMOOTH5 = (1, 4, 6, 4, 1)      # 14641 smoothing tap (filter.cpp:71)
DERIV5 = (1, 2, 0, -2, -1)     # 12021 derivative tap (filter.cpp:105)
CHECKER5 = (1, 1, 0, -1, -1)   # checkerboard tap (filter.cpp:235,260)
SMOOTH3 = (1, 2, 1)
DERIV3 = (1, 0, -1)


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[y, x] = in[y + dy, x + dx]; borders wrap (invalid, inside margin)."""
    return jnp.roll(x, shift=(-dy, -dx), axis=(0, 1))


def _sep_pass(x: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """Apply a centered 1-D tap along `axis` (0=y, 1=x) via shifted adds."""
    r = len(taps) // 2
    out = None
    for i, c in enumerate(taps):
        if c == 0:
            continue
        d = i - r
        s = _shift(x, d, 0) if axis == 0 else _shift(x, 0, d)
        term = s if c == 1 else (-s if c == -1 else c * s)
        out = term if out is None else out + term
    return out


def _pack_u8(acc: jnp.ndarray, shift_amount: int) -> jnp.ndarray:
    """(acc >> s) + 128, saturate to [0, 255] (filter.cpp:94-98 semantics)."""
    v = jnp.right_shift(acc, shift_amount) + 128
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


@jax.jit
def sobel5x5(img: jnp.ndarray):
    """5x5 Sobel. Returns (I_du, I_dv) uint8.

    I_du = x-derivative (column-smoothed), I_dv = y-derivative (row-smoothed);
    matches reference filter::sobel5x5 output ordering (filter.cpp:316-324)
    where out_v is the image called I_du by the matcher (matcher.cpp:663).
    Sign convention follows the reference taps: +1 weight on the -2 side.
    """
    x = img.astype(jnp.int32)
    tv = _sep_pass(x, SMOOTH5, axis=0)   # column smoothing
    th = _sep_pass(x, DERIV5, axis=0)    # column derivative
    du = _sep_pass(tv, DERIV5, axis=1)   # row derivative
    dv = _sep_pass(th, SMOOTH5, axis=1)  # row smoothing
    return _pack_u8(du, 7), _pack_u8(dv, 7)


@jax.jit
def sobel3x3(img: jnp.ndarray):
    """3x3 Sobel, uint8 outputs with >>2 scaling (filter.cpp:306-314)."""
    x = img.astype(jnp.int32)
    tv = _sep_pass(x, SMOOTH3, axis=0)
    th = _sep_pass(x, DERIV3, axis=0)
    du = _sep_pass(tv, DERIV3, axis=1)
    dv = _sep_pass(th, SMOOTH3, axis=1)
    return _pack_u8(du, 2), _pack_u8(dv, 2)


@jax.jit
def blob5x5(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 blob filter, int16 response (filter.cpp:338-365).

    Kernel: -1 on the 5x5 ring, +1 on the 3x3 ring, +8 center, computed as
    ``-(5x5 box) + 2*(3x3 box) + 7*center`` exactly like the reference's
    integral-image formulation (filter.cpp:357-362).
    """
    x = img.astype(jnp.int32)
    ones5 = (1, 1, 1, 1, 1)
    ones3 = (1, 1, 1)
    box5 = _sep_pass(_sep_pass(x, ones5, 0), ones5, 1)
    box3 = _sep_pass(_sep_pass(x, ones3, 0), ones3, 1)
    acc = -box5 + 2 * box3 + 7 * x
    return acc.astype(jnp.int16)


@jax.jit
def checkerboard5x5(img: jnp.ndarray) -> jnp.ndarray:
    """5x5 checkerboard filter, int16 response (filter.cpp:326-336).

    Separable [1,1,0,-1,-1] x [1,1,0,-1,-1] (quadrant contrast)."""
    x = img.astype(jnp.int32)
    t = _sep_pass(x, CHECKER5, axis=0)
    acc = _sep_pass(t, CHECKER5, axis=1)
    return acc.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def half_resolution(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """2x2 box downsample with floor division (matcher.cpp:636-647).

    reduce_window is the native TPU pooling path; lane-strided slices lower
    to serialized gathers plus full-image staging copies (was ~40% of the
    fused stereo frame step)."""
    x = img[: 2 * out_h, : 2 * out_w].astype(jnp.int32)
    s = jax.lax.reduce_window(x, 0, jax.lax.add, (2, 2), (2, 2), "VALID")
    return (s // 4).astype(jnp.uint8)


@jax.jit
def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 2-D prefix sum, int32 (filter.cpp:48-65)."""
    x = img.astype(jnp.int32)
    return jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)
