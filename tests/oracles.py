"""NumPy oracles implementing the reference semantics directly (scalar math,
no JAX). These play the role the scalar std::array backend plays for the
reference's SIMD test (reference test/simd.cpp:49-136): an independent,
obviously-correct implementation every accelerated kernel is diffed against.

All filters are centered, exactly like the reference SIMD path (the
`+w_chunk*4` offset in filter.cpp:195-196 is 2 rows of int16 — it centers the
5-tap window; see sfm_tpu/ops/filters.py docstring).
"""

import numpy as np

MARGIN = 6

SMOOTH5 = [1, 4, 6, 4, 1]
DERIV5 = [1, 2, 0, -2, -1]
CHECKER5 = [1, 1, 0, -1, -1]


def conv2_centered(img, ktaps_y, ktaps_x):
    """Separable centered integer convolution; borders invalid (zeros)."""
    x = img.astype(np.int64)
    H, W = x.shape
    ry, rx = len(ktaps_y) // 2, len(ktaps_x) // 2
    t = np.zeros_like(x)
    for i, c in enumerate(ktaps_y):
        d = i - ry
        if c == 0:
            continue
        src = np.zeros_like(x)
        if d >= 0:
            src[: H - d or None, :] = x[d:, :]
        else:
            src[-d:, :] = x[: H + d, :]
        t += c * src
    out = np.zeros_like(x)
    for i, c in enumerate(ktaps_x):
        d = i - rx
        if c == 0:
            continue
        src = np.zeros_like(t)
        if d >= 0:
            src[:, : W - d or None] = t[:, d:]
        else:
            src[:, -d:] = t[:, : W + d]
        out += c * src
    return out


def pack_u8(acc, shift):
    v = (acc >> shift) + 128  # arithmetic shift (floor) like int16 >> in C
    return np.clip(v, 0, 255).astype(np.uint8)


def sobel5x5(img):
    du = pack_u8(conv2_centered(img, SMOOTH5, DERIV5), 7)
    dv = pack_u8(conv2_centered(img, DERIV5, SMOOTH5), 7)
    return du, dv


def blob5x5(img):
    ones5, ones3 = [1] * 5, [1] * 3
    acc = (
        -conv2_centered(img, ones5, ones5)
        + 2 * conv2_centered(img, ones3, ones3)
        + 7 * img.astype(np.int64)
    )
    return acc.astype(np.int16)


def checkerboard5x5(img):
    return conv2_centered(img, CHECKER5, CHECKER5).astype(np.int16)


def half_resolution(img):
    H, W = img.shape
    h, w = H // 2, W // 2
    x = img.astype(np.int64)
    out = (x[0 : 2 * h : 2, 0 : 2 * w : 2] + x[0 : 2 * h : 2, 1 : 2 * w : 2]
           + x[1 : 2 * h : 2, 0 : 2 * w : 2] + x[1 : 2 * h : 2, 1 : 2 * w : 2]) // 4
    return out.astype(np.uint8)


def nms(f1, f2, w, h, n, tau, margin=MARGIN):
    """Literal translation of the reference NMS loops (matcher.cpp:330-431).

    Returns list of (u, v, val, cls) in reference emission order.
    """
    out = []
    f = [np.asarray(f1, np.int64), np.asarray(f2, np.int64)]
    for i in range(n + margin, w - n - margin, n + 1):
        for j in range(n + margin, h - n - margin, n + 1):
            # block extrema with first-occurrence tie-break, x outer / y inner
            mins = [[i, j, f[0][j, i]], [i, j, f[1][j, i]]]
            maxs = [[i, j, f[0][j, i]], [i, j, f[1][j, i]]]
            for i2 in range(i, i + n + 1):
                for j2 in range(j, j + n + 1):
                    for c in range(2):
                        cur = f[c][j2, i2]
                        if cur < mins[c][2]:
                            mins[c] = [i2, j2, cur]
                        elif cur > maxs[c][2]:
                            maxs[c] = [i2, j2, cur]

            def verify(ci, mi, mj, mval, mode):
                for i2 in range(mi - n, min(mi + n, w - 1 - margin) + 1):
                    for j2 in range(mj - n, min(mj + n, h - 1 - margin) + 1):
                        cur = f[ci][j2, i2]
                        inside = i <= i2 <= i + n and j <= j2 <= j + n
                        if not inside:
                            if mode == "min" and cur < mval:
                                return False
                            if mode == "max" and cur > mval:
                                return False
                return True

            for c in range(2):
                mi, mj, mval = mins[c]
                if verify(c, mi, mj, mval, "min") and mval <= -tau:
                    out.append((mi, mj, int(mval), 2 * c + 0))
                mi, mj, mval = maxs[c]
                if verify(c, mi, mj, mval, "max") and mval >= tau:
                    out.append((mi, mj, int(mval), 2 * c + 1))
    return out


DESC_OFFSETS = [
    (-3, -1), (-3, +1), (-1, -1), (-1, +1),
    (+3, -1), (+3, +1), (+1, -1), (+1, +1),
    (-1, -5), (-1, +5), (+1, -5), (+1, +5),
    (-5, -3), (-5, +3), (+5, -3), (+5, +3),
]


def descriptor(du, dv, u, v):
    out = []
    for dx, dy in DESC_OFFSETS:
        out.append(du[v + dy, u + dx])
        out.append(dv[v + dy, u + dx])
    return np.array(out, np.uint8)


def small_descriptor(du, dv, u, v):
    du_off = [(0, -2), (-2, -1), (0, -1), (+2, -1), (-1, 0), (0, 0), (0, 0),
              (+1, 0), (-2, +1), (0, +1), (+2, +1), (0, +2)]
    dv_off = [(0, -1), (-1, 0), (+1, 0), (0, +1)]
    out = [du[v + dy, u + dx] for dx, dy in du_off]
    out += [dv[v + dy, u + dx] for dx, dy in dv_off]
    return np.array(out, np.uint8)


def sad(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).sum())
