"""Non-maximum/minimum suppression feature detector.

TPU-native implementation of the reference's Neubeck/Van Gool block NMS
(matcher.cpp:330-431, "Efficient Non-Maximum Suppression", ICPR'06 alg. 4):

  * the image area ``[n+margin, dim-n-margin)`` is tiled by non-overlapping
    (n+1)x(n+1) blocks;
  * per block, the running min and max of the blob (f1) and checkerboard (f2)
    responses are found; ties keep the first element in the reference's
    scan order (x outer, y inner; matcher.cpp:356-380 uses strict
    comparisons);
  * each candidate is verified against the full (2n+1)^2 window clamped at
    ``dim-1-margin`` on the high side (matcher.cpp:383-389): it survives iff
    no strictly better value exists in the window. Because all in-block values
    are never strictly better than the block extremum, checking the whole
    window is equivalent to the reference's outside-the-block check;
  * minima must satisfy ``val <= -tau``, maxima ``val >= tau``
    (matcher.cpp:390,402) and are assigned classes 0..3:
    f1-min, f1-max, f2-min, f2-max (matcher.cpp:391-427).

Instead of dynamic vectors, candidates land in fixed-capacity arrays with a
validity mask, compacted in the reference's emission order (x-block major).

The whole thing is data-parallel jnp: block extrema via reshape+reduce with
packed (value, tie-index) integer keys, window verification via two separable
1-D min/max reduce_windows. XLA fuses this into a handful of VPU passes; a
Pallas kernel buys nothing extra here because every step is a dense map.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

MARGIN = 6  # descriptor + sobel margin (matcher.cpp:56)
_INF16 = np.int32(32767)


class FeatureSet(NamedTuple):
    """Fixed-capacity feature arrays (coordinates in matching resolution)."""

    u: jnp.ndarray      # [cap] int32 x-coordinate
    v: jnp.ndarray      # [cap] int32 y-coordinate
    val: jnp.ndarray    # [cap] int32 filter response at the extremum
    cls: jnp.ndarray    # [cap] int32 class 0..3
    valid: jnp.ndarray  # [cap] bool
    count: jnp.ndarray  # [] int32, number of valid features (<= cap)
    desc: jnp.ndarray   # [cap, 32] uint8 descriptor (zeros until computed)


def empty_feature_set(cap: int) -> FeatureSet:
    z = jnp.zeros((cap,), jnp.int32)
    return FeatureSet(
        u=z, v=z, val=z, cls=z,
        valid=jnp.zeros((cap,), bool),
        count=jnp.zeros((), jnp.int32),
        desc=jnp.zeros((cap, 32), jnp.uint8),
    )


def _block_extrema(region: jnp.ndarray, nby: int, nbx: int, bs: int, mode: str):
    """Per-block (value, y, x) extrema with reference tie-breaking.

    region: [nby*bs, nbx*bs] int32. Tie order: x within block outer, y inner
    (matcher.cpp:356-357), first occurrence wins under strict comparison.
    """
    r = region.reshape(nby, bs, nbx, bs)  # [by, dy, bx, dx]
    dy = jax.lax.broadcasted_iota(jnp.int32, (nby, bs, nbx, bs), 1)
    dx = jax.lax.broadcasted_iota(jnp.int32, (nby, bs, nbx, bs), 3)
    t = dx * bs + dy  # scan order index, < bs*bs <= 121 < 128
    if mode == "min":
        key = r * 128 + t
        k = jnp.min(key, axis=(1, 3))
        val = jnp.right_shift(k, 7)
        tt = jnp.bitwise_and(k, 127)
    else:
        key = r * 128 + (127 - t)
        k = jnp.max(key, axis=(1, 3))
        val = jnp.right_shift(k, 7)
        tt = 127 - jnp.bitwise_and(k, 127)
    return val, tt % bs, tt // bs  # val, dy, dx per block [nby, nbx]


def _window_extreme(img: jnp.ndarray, n: int, w: int, h: int, margin: int, mode: str):
    """Separable (2n+1)-window min/max with high-side clamping at dim-1-margin."""
    pad = _INF16 if mode == "min" else -_INF16
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    masked = jnp.where((ys > h - 1 - margin) | (xs > w - 1 - margin), pad, img)
    op = jax.lax.min if mode == "min" else jax.lax.max
    t = jax.lax.reduce_window(masked, pad, op, (2 * n + 1, 1), (1, 1), "SAME")
    return jax.lax.reduce_window(t, pad, op, (1, 2 * n + 1), (1, 1), "SAME")


@functools.partial(jax.jit, static_argnames=("w", "h", "n", "margin", "cap"))
def nms_features(
    f1: jnp.ndarray,
    f2: jnp.ndarray,
    *,
    w: int,
    h: int,
    n: int,
    tau: int,
    margin: int = MARGIN,
    cap: int = 4096,
) -> FeatureSet:
    """Extract interest points from blob (f1) / checkerboard (f2) responses.

    Arrays may be padded beyond (h, w); logical dims are static ints.
    """
    start = n + margin
    bs = n + 1
    nbx = (w - 2 * n - 2 * margin - 1) // bs + 1
    nby = (h - 2 * n - 2 * margin - 1) // bs + 1
    if nbx <= 0 or nby <= 0:
        return empty_feature_set(cap)

    f1i = f1.astype(jnp.int32)
    f2i = f2.astype(jnp.int32)

    cand_u, cand_v, cand_val, cand_cls, cand_ok = [], [], [], [], []
    for cls, (img, mode) in enumerate(
        [(f1i, "min"), (f1i, "max"), (f2i, "min"), (f2i, "max")]
    ):
        region = jax.lax.dynamic_slice(img, (start, start), (nby * bs, nbx * bs))
        val, dy, dx = _block_extrema(region, nby, nbx, bs, mode)
        by = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 0)
        bx = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 1)
        v = start + by * bs + dy
        u = start + bx * bs + dx
        wext = _window_extreme(img, n, w, h, margin, mode)
        # candidate positions lie inside their own block, so the per-block
        # lookup is a masked in-block reduction (an [nby, nbx] fancy-index
        # gather serializes on TPU and staged the whole filter image)
        wreg = jax.lax.dynamic_slice(
            wext, (start, start), (nby * bs, nbx * bs)
        ).reshape(nby, bs, nbx, bs)
        dyi = jax.lax.broadcasted_iota(jnp.int32, (1, bs, 1, 1), 1)
        dxi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, bs), 3)
        sel = ((dyi == dy[:, None, :, None]) & (dxi == dx[:, None, :, None]))
        at_cand = jnp.sum(jnp.where(sel, wreg, 0), axis=(1, 3))
        if mode == "min":
            ok = (at_cand >= val) & (val <= -tau)
        else:
            ok = (at_cand <= val) & (val >= tau)
        cand_u.append(u)
        cand_v.append(v)
        cand_val.append(val)
        cand_cls.append(jnp.full((nby, nbx), cls, jnp.int32))
        cand_ok.append(ok)

    # emission order: x-block major, y-block, then the 4 classes
    # (matcher.cpp:344-428 pushes f1min,f1max,f2min,f2max per (i,j) with the
    # i (x) loop outermost)
    def _order(stack):  # [4, nby, nbx] -> [nbx*nby*4]
        return jnp.stack(stack).transpose(2, 1, 0).reshape(-1)

    u_f = _order(cand_u)
    v_f = _order(cand_v)
    val_f = _order(cand_val)
    cls_f = _order(cand_cls)
    ok_f = _order(cand_ok)

    # gather-side compaction (scatter packing serializes on TPU)
    from .matching import compaction_gather_indices

    src, count = compaction_gather_indices(ok_f, cap)
    slots = jnp.arange(cap, dtype=jnp.int32)
    live = slots < count

    def _take(x):
        return jnp.where(live, x[src], 0)

    return FeatureSet(
        u=_take(u_f),
        v=_take(v_f),
        val=_take(val_f),
        cls=_take(cls_f),
        valid=live,
        count=count,
        desc=jnp.zeros((cap, 32), jnp.uint8),
    )


def sparse_nms_n(nms_n: int) -> int:
    """1st-pass (sparse) NMS neighborhood (matcher.cpp:685-687)."""
    n = nms_n * 3
    if n > 10:
        n = max(nms_n, 10)
    return n
