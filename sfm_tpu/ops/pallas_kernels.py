"""Pallas TPU kernels for the matcher/RANSAC hot loops.

These are the TPU equivalents of the reference's hand-written accelerated
code paths:

  * ``sad_argmin``: the per-feature SIMD SAD candidate scan
    (matcher.cpp:892-963 + simd.hh:413-445) as a tiled cost/argmin kernel.
    Instead of materializing the [N1, N2] cost matrix in HBM (what the pure
    jnp path does), each grid step keeps a [TM, TN] tile in VMEM, applies the
    class/range/prior masks, and folds a running (min cost, argmin) per row —
    one pass over HBM for descriptors only.
  * ``plane_sums``: the O(N^2) kernel-density ground-plane scoring
    (viso_mono.cpp:74-98, plane_and_inliers.cl:142-162) as a tiled
    exp-accumulation kernel.

Both have jnp reference implementations (ops/matching.py, ops/plane.py) that
the tests diff against; `interpret=True` is used automatically off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_COST_INIT = 10000000.0  # matcher.cpp:899
BIG = 1e9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# SAD cost + argmin
# ---------------------------------------------------------------------------

def _sad_kernel(cnt_ref, row_lo_ref, row_hi_ref, col_lo_ref, col_hi_ref,
                d1_ref, m1_ref, d2t_ref, m2_ref, cost_ref, idx_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    TM_ = d1_ref.shape[0]
    TN = d2t_ref.shape[1]

    @pl.when(j == 0)
    def _():
        cost_ref[:] = jnp.full_like(cost_ref, MIN_COST_INIT)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # tile skip: features are emitted in ascending-u order (nms.py emission),
    # so each candidate tile spans a narrow u band; compare it against the
    # row tile's aggregate search window and skip disjoint tiles (the analog
    # of the reference's bin-restricted candidate scan, matcher.cpp:931-940).
    # Count gating: feature tables are compacted, so row tiles wholly beyond
    # the source count and candidate tiles wholly beyond the target count
    # hold only invalid entries — skip them (outputs for such rows keep the
    # j==0 init = the "no match" cost, which is their contract anyway)
    overlap = ((col_lo_ref[0, j] <= row_hi_ref[i, 0])
               & (col_hi_ref[0, j] >= row_lo_ref[i, 0])
               & (i * TM_ < cnt_ref[0]) & (j * TN < cnt_ref[1]))

    @pl.when(overlap)
    def _():
        # f32 abs-diff accumulation. Lower precisions were tried and lost:
        # Mosaic lacks i16 vector abs/max (the exact u8/i16 analog of the
        # reference SIMD SAD, simd.hh:384-445, fails to legalize), and bf16
        # operands with f32 accumulation benched ~1% slower than plain f32
        # (BASELINE.md round-4 ledger)
        d1 = d1_ref[:]          # [TM, 32]
        d2t = d2t_ref[:]        # [32, TN]
        TM = d1.shape[0]

        acc = jnp.zeros((TM, TN), jnp.float32)
        for k in range(32):
            acc = acc + jnp.abs(d1[:, k][:, None] - d2t[k, :][None, :])

        c1 = m1_ref[:, 0][:, None]
        u_min = m1_ref[:, 1][:, None]
        u_max = m1_ref[:, 2][:, None]
        v_min = m1_ref[:, 3][:, None]
        v_max = m1_ref[:, 4][:, None]
        t_u = m1_ref[:, 5][:, None]
        t_v = m1_ref[:, 6][:, None]
        u2 = m2_ref[0, :][None, :]
        v2 = m2_ref[1, :][None, :]
        c2 = m2_ref[2, :][None, :]
        valid2 = m2_ref[3, :][None, :]

        use_t = (t_u >= 0) & (t_v >= 0)
        dist = jnp.sqrt((u2 - t_u) ** 2 + (v2 - t_v) ** 2)
        acc = acc + jnp.where(use_t, 4.0 * dist, 0.0)

        mask = ((valid2 > 0.5) & (c2 == c1)
                & (u2 >= u_min) & (u2 <= u_max)
                & (v2 >= v_min) & (v2 <= v_max))
        acc = jnp.where(mask, acc, BIG)

        tile_min = jnp.min(acc, axis=1)
        # explicit first-index tie-break (Mosaic's argmin lowering does not
        # guarantee first-occurrence like jnp.argmin does)
        lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        tile_arg = jnp.min(
            jnp.where(acc == tile_min[:, None], lane, TN), axis=1) + j * TN
        better = tile_min < cost_ref[:, 0]
        cost_ref[:, 0] = jnp.where(better, tile_min, cost_ref[:, 0])
        idx_ref[:, 0] = jnp.where(better, tile_arg, idx_ref[:, 0])


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def sad_argmin_pallas(
    d1, c1, u_min, u_max, v_min, v_max, t_u, t_v,
    d2, u2, v2, c2, valid2,
    valid1=None, count1=None, count2=None,
    tm: int = 256, tn: int = 512,
):
    """Drop-in for ops.matching.sad_argmin_pass (same semantics/returns).

    valid1 (optional row mask) only sharpens tile-skip bounds; results for
    invalid rows are unspecified either way. count1/count2 (traced i32):
    valid-prefix lengths of the source/candidate tables — tiles wholly
    beyond them are skipped (tables are compacted; rows beyond count1 keep
    the no-match init, candidates beyond count2 are invalid by mask)."""
    N1 = d1.shape[0]
    N2 = d2.shape[0]
    tm = min(tm, N1)
    tn = min(tn, N2)
    if valid1 is None:
        valid1 = jnp.ones((N1,), bool)
    # auto-pad non-divisible capacities (odd EngineConfig sizes) instead of
    # asserting: padded rows carry class -1 / empty windows so they can never
    # match (cost keeps the no-match init and is sliced off below); padded
    # candidates are invalid by mask
    big = jnp.float32(3e38)
    pad1 = -N1 % tm
    pad2 = -N2 % tn
    if pad1:
        z1 = jnp.zeros((pad1,), jnp.float32)
        d1 = jnp.concatenate([d1, jnp.zeros((pad1, d1.shape[1]), d1.dtype)])
        c1 = jnp.concatenate([c1, jnp.full((pad1,), -1, c1.dtype)])
        u_min = jnp.concatenate([u_min, jnp.full((pad1,), big)])
        u_max = jnp.concatenate([u_max, jnp.full((pad1,), -big)])
        v_min = jnp.concatenate([v_min, z1])
        v_max = jnp.concatenate([v_max, z1])
        t_u = jnp.concatenate([t_u, z1 - 1.0])
        t_v = jnp.concatenate([t_v, z1 - 1.0])
        valid1 = jnp.concatenate([valid1, jnp.zeros((pad1,), bool)])
    if pad2:
        d2 = jnp.concatenate([d2, jnp.zeros((pad2, d2.shape[1]), d2.dtype)])
        u2 = jnp.concatenate([u2, jnp.zeros((pad2,), u2.dtype)])
        v2 = jnp.concatenate([v2, jnp.zeros((pad2,), v2.dtype)])
        c2 = jnp.concatenate([c2, jnp.full((pad2,), -1, c2.dtype)])
        valid2 = jnp.concatenate([valid2, jnp.zeros((pad2,), valid2.dtype)])
    N1p, N2p = N1 + pad1, N2 + pad2
    I = N1p // tm
    J = N2p // tn
    cnt = jnp.stack([
        jnp.minimum(jnp.asarray(N1 if count1 is None else count1, jnp.int32),
                    N1),
        jnp.minimum(jnp.asarray(N2 if count2 is None else count2, jnp.int32),
                    N2)])

    m1 = jnp.stack([c1.astype(jnp.float32), u_min, u_max, v_min, v_max,
                    t_u, t_v, jnp.zeros_like(u_min)], axis=1)  # [N1p, 8]
    m2 = jnp.stack([u2.astype(jnp.float32), v2.astype(jnp.float32),
                    c2.astype(jnp.float32), valid2.astype(jnp.float32),
                    jnp.zeros_like(u2, dtype=jnp.float32),
                    jnp.zeros_like(u2, dtype=jnp.float32),
                    jnp.zeros_like(u2, dtype=jnp.float32),
                    jnp.zeros_like(u2, dtype=jnp.float32)], axis=0)  # [8, N2p]
    d2t = d2.astype(jnp.float32).T  # [32, N2p]

    # aggregate u-windows per tile for the skip test
    row_lo = jnp.min(jnp.where(valid1, u_min, big).reshape(I, tm),
                     axis=1, keepdims=True)
    row_hi = jnp.max(jnp.where(valid1, u_max, -big).reshape(I, tm),
                     axis=1, keepdims=True)
    u2f = u2.astype(jnp.float32)
    col_lo = jnp.min(jnp.where(valid2, u2f, big).reshape(J, tn),
                     axis=1, keepdims=True).T  # [1, J]
    col_hi = jnp.max(jnp.where(valid2, u2f, -big).reshape(J, tn),
                     axis=1, keepdims=True).T

    grid = (I, J)
    cost, idx = pl.pallas_call(
        _sad_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tm, 32), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((32, tn), lambda i, j: (0, j)),
            pl.BlockSpec((8, tn), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1p, 1), jnp.float32),
            jax.ShapeDtypeStruct((N1p, 1), jnp.int32),
        ],
        interpret=_interpret(),
    )(cnt, row_lo, row_hi, col_lo, col_hi, d1.astype(jnp.float32), m1, d2t,
      m2)
    cost = cost[:N1, 0]
    idx = idx[:N1, 0]
    idx = jnp.where(cost < MIN_COST_INIT, idx, 0)
    return idx, cost


# ---------------------------------------------------------------------------
# Patch extraction (match refinement windows)
# ---------------------------------------------------------------------------

PATCH = 16  # fixed window size; covers the 9x9 (pixel) / 13x13 (subpixel) need


def _patch_kernel(cnt_ref, u_ref, v_ref, du_ref, dv_ref, pdu_ref, pdv_ref, *,
                  unroll: int):
    """Per grid step: extract PATCH x PATCH windows of du/dv for a block of
    matches. Row window via dynamic sublane slice; column window via a
    128-aligned lane slice followed by a one-hot lane-extraction matmul
    (XLA lowers per-match patch gathers to ~8 ns/element scalar loops).

    Blocks wholly beyond the valid-match count (tables are compacted, so
    valid rows are a prefix) write zeros and skip the per-match work — the
    static table capacity stops costing for the invalid tail."""
    B = pdu_ref.shape[0]
    i = pl.program_id(0)
    active = i * B < cnt_ref[0]

    @pl.when(jnp.logical_not(active))
    def _():
        pdu_ref[:] = jnp.zeros_like(pdu_ref)
        pdv_ref[:] = jnp.zeros_like(pdv_ref)
    # vector loads need 8-aligned sublane and 128-aligned lane starts; the
    # residual offsets are folded into the two one-hot selection matmuls.
    # bf16 selections/operands are exact for u8 pixel values; accumulation
    # is f32 and each output receives exactly one input
    rr = jax.lax.broadcasted_iota(jnp.int32, (PATCH, 24), 0)
    rs = jax.lax.broadcasted_iota(jnp.int32, (PATCH, 24), 1)
    cw = jax.lax.broadcasted_iota(jnp.int32, (256, PATCH), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (256, PATCH), 1)

    def one(j):
        u0 = u_ref[i * B + j]
        v0 = v_ref[i * B + j]
        ubase = pl.multiple_of((u0 // 128) * 128, 128)
        vbase = pl.multiple_of((v0 // 8) * 8, 8)
        win_du = du_ref[pl.ds(vbase, 24), pl.ds(ubase, 256)]
        win_dv = dv_ref[pl.ds(vbase, 24), pl.ds(ubase, 256)]
        rsel = (rs == rr + (v0 - vbase)).astype(jnp.bfloat16)  # [PATCH, 24]
        csel = (cw == cc + (u0 - ubase)).astype(jnp.bfloat16)  # [256, PATCH]
        # precision pinned to DEFAULT: the session-wide "highest" default
        # would request an fp32 contraction on bf16 operands, which Mosaic
        # rejects (and one-hot selection is exact in bf16 anyway)
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        a = dot(rsel, win_du).astype(jnp.bfloat16)
        b = dot(rsel, win_dv).astype(jnp.bfloat16)
        pdu_ref[j] = dot(a, csel)
        pdv_ref[j] = dot(b, csel)

    def body(jj, _):
        # unrolled so consecutive matches' loads/matmuls pipeline on the MXU
        for k in range(unroll):
            one(jj * unroll + k)
        return ()

    @pl.when(active)
    def _():
        jax.lax.fori_loop(0, B // unroll, body, ())


@functools.partial(jax.jit, static_argnames=("block", "unroll"))
def extract_patches_pallas(du, dv, u0, v0, count=None, block: int = 256,
                           unroll: int = 8):
    """[M, PATCH, PATCH] f32 windows of du/dv with top-left (v0, u0) per match.

    du, dv: [H, W] (any real dtype; u8-range values assumed, staged as bf16).
    u0/v0 are clipped so the window stays in-bounds (callers mask
    out-of-margin matches anyway). `count` (traced i32, default M): number of
    valid rows in the (compacted) match prefix — blocks wholly beyond it
    write zeros instead of gathering, so capacity padding costs ~nothing.
    """
    H, W = du.shape
    M = u0.shape[0]
    if count is None:
        count = jnp.int32(M)
    cnt = jnp.reshape(jnp.minimum(jnp.asarray(count, jnp.int32), M), (1,))
    # pad so every 128-aligned lane base has 256 readable lanes and every
    # row start has PATCH readable rows; reads past (H, W) hit zeros but
    # only land in the unused tail of the fixed-size window, so in-bounds
    # sample positions are never shifted by clipping
    Wp = (-(-(W) // 128)) * 128 + 128
    Hp = -(-H // 8) * 8 + PATCH
    duf = jnp.pad(du.astype(jnp.bfloat16), ((0, Hp - H), (0, Wp - W)))
    dvf = jnp.pad(dv.astype(jnp.bfloat16), ((0, Hp - H), (0, Wp - W)))
    uc = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    vc = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    block = min(block, M)
    # auto-pad odd match capacities to a whole number of blocks; the pad rows
    # sit beyond `count`, so fully-padded blocks are skipped by the count gate
    # and partially-padded ones just gather the (0,0) window harmlessly
    padm = -M % block
    if padm:
        uc = jnp.concatenate([uc, jnp.zeros((padm,), jnp.int32)])
        vc = jnp.concatenate([vc, jnp.zeros((padm,), jnp.int32)])
    Mp = M + padm
    while block % unroll:
        unroll //= 2
    grid = (Mp // block,)
    pdu, pdv = pl.pallas_call(
        functools.partial(_patch_kernel, unroll=unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((Hp, Wp), lambda i: (0, 0)),
            pl.BlockSpec((Hp, Wp), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, PATCH, PATCH), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, PATCH, PATCH), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, PATCH, PATCH), jnp.float32),
            jax.ShapeDtypeStruct((Mp, PATCH, PATCH), jnp.float32),
        ],
        interpret=_interpret(),
    )(cnt, uc, vc, duf, dvf)
    return pdu[:M], pdv[:M]


# ---------------------------------------------------------------------------
# Fused detect filters (sobel5x5 + blob5x5 + checkerboard5x5 in one pass)
# ---------------------------------------------------------------------------

_SMOOTH5 = (1, 4, 6, 4, 1)      # filter.cpp:71
_DERIV5 = (1, 2, 0, -2, -1)     # filter.cpp:105
_CHECKER5 = (1, 1, 0, -1, -1)   # filter.cpp:235,260


def _kshift(a, d, axis):
    """out[y, x] = in[y + d] along axis, wrapping (borders are invalid by
    contract, ops/filters.py margin note)."""
    if d == 0:
        return a
    if not _interpret():
        return pltpu.roll(a, (-d) % a.shape[axis], axis)  # native rotate
    n = a.shape[axis]
    lo = jax.lax.slice_in_dim(a, (d % n), n, axis=axis)
    hi = jax.lax.slice_in_dim(a, 0, (d % n), axis=axis)
    return jax.lax.concatenate([lo, hi], axis)


def _ksep(a, taps, axis):
    r = len(taps) // 2
    out = None
    for i, c in enumerate(taps):
        if c == 0:
            continue
        s = _kshift(a, i - r, axis)
        term = s if c == 1 else (-s if c == -1 else c * s)
        out = term if out is None else out + term
    return out


def _detect_filters_kernel(img_ref, du_ref, dv_ref, blob_ref, chk_ref):
    x = img_ref[:].astype(jnp.int32)
    tv = _ksep(x, _SMOOTH5, 0)
    th = _ksep(x, _DERIV5, 0)
    du = _ksep(tv, _DERIV5, 1)
    dv = _ksep(th, _SMOOTH5, 1)
    du_ref[:] = jnp.clip(jnp.right_shift(du, 7) + 128, 0, 255).astype(
        jnp.uint8)
    dv_ref[:] = jnp.clip(jnp.right_shift(dv, 7) + 128, 0, 255).astype(
        jnp.uint8)
    ones5 = (1, 1, 1, 1, 1)
    ones3 = (1, 1, 1)
    box5 = _ksep(_ksep(x, ones5, 0), ones5, 1)
    box3 = _ksep(_ksep(x, ones3, 0), ones3, 1)
    blob_ref[:] = (-box5 + 2 * box3 + 7 * x).astype(jnp.int16)
    chk = _ksep(_ksep(x, _CHECKER5, 0), _CHECKER5, 1)
    chk_ref[:] = chk.astype(jnp.int16)


def _sobel_only_kernel(img_ref, du_ref, dv_ref):
    x = img_ref[:].astype(jnp.int32)
    tv = _ksep(x, _SMOOTH5, 0)
    th = _ksep(x, _DERIV5, 0)
    du = _ksep(tv, _DERIV5, 1)
    dv = _ksep(th, _SMOOTH5, 1)
    du_ref[:] = jnp.clip(jnp.right_shift(du, 7) + 128, 0, 255).astype(
        jnp.uint8)
    dv_ref[:] = jnp.clip(jnp.right_shift(dv, 7) + 128, 0, 255).astype(
        jnp.uint8)


@functools.partial(jax.jit, static_argnames=("with_blob_checker",))
def detect_filters_pallas(img, with_blob_checker: bool = True):
    """One VMEM pass producing every detect-stage filter response with the
    exact integer semantics of ops/filters.py (sobel5x5 u8 pack, blob /
    checkerboard i16 — reference filter.cpp:316-365).

    The jnp formulation is a chain of jnp.roll shifted-adds that XLA lowers
    with lane-relayout copies (~1.3 ms/frame for the detect stage); here the
    whole image lives in VMEM once and the ~20 shifted adds are pure vector
    ops (~0.2 ms). Returns (du, dv[, blob, checker]).

    The kernel holds the image + i32 temporaries in VMEM as ONE block (no
    grid), which bounds the supported image size; images beyond the bound
    fall back to the bit-identical jnp filters."""
    H, W = img.shape
    # ~8 i32 live temporaries per pixel must fit the 48 MB VMEM limit; KITTI
    # (376x1241 = 0.47 MP) uses ~20 MB. Fall back above ~1.2 MP.
    if H * W > 1_200_000:
        from . import filters

        du, dv = filters.sobel5x5(img)
        if not with_blob_checker:
            return du, dv
        return du, dv, filters.blob5x5(img), filters.checkerboard5x5(img)
    outs = [jax.ShapeDtypeStruct((H, W), jnp.uint8),
            jax.ShapeDtypeStruct((H, W), jnp.uint8)]
    if with_blob_checker:
        outs += [jax.ShapeDtypeStruct((H, W), jnp.int16),
                 jax.ShapeDtypeStruct((H, W), jnp.int16)]
    kernel = (_detect_filters_kernel if with_blob_checker
              else _sobel_only_kernel)
    # whole image + i32 temporaries live in VMEM (~20 MB at KITTI size);
    # raise Mosaic's 16 MB default scoped limit
    return pl.pallas_call(
        kernel,
        out_shape=outs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=_interpret(),
    )(img)


# ---------------------------------------------------------------------------
# Plane density scoring
# ---------------------------------------------------------------------------

def _plane_kernel(di_ref, dj_ref, w_ref, sums_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sums_ref[:] = jnp.zeros_like(sums_ref)

    di = di_ref[:, 0][:, None]     # [TM, 1]
    dj = dj_ref[0, :][None, :]     # [1, TN]
    vj = dj_ref[1, :][None, :]
    w = w_ref[0, 0]
    diff = di - dj
    k = jnp.exp(-diff * diff * w) * vj
    sums_ref[:, 0] += jnp.sum(k, axis=1)


@functools.partial(jax.jit, static_argnames=("tm", "tn"))
def plane_sums_pallas(d, valid, weight, tm: int = 512, tn: int = 512):
    """sums[i] = sum_j valid_j * exp(-(d_i - d_j)^2 * weight)."""
    N = d.shape[0]
    tm = min(tm, N)
    tn = min(tn, N)
    # auto-pad odd capacities: pad candidates carry valid=0 (contribute 0),
    # pad rows are sliced off the result
    padn = int(-N % np.lcm(tm, tn))
    if padn:
        d = jnp.concatenate([d, jnp.zeros((padn,), d.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((padn,), valid.dtype)])
    Np = N + padn
    dj = jnp.stack([d, valid.astype(jnp.float32)], axis=0)  # [2, Np]
    w = jnp.full((1, 1), weight, jnp.float32)
    sums = pl.pallas_call(
        _plane_kernel,
        grid=(Np // tm, Np // tn),
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((2, tn), lambda i, j: (0, j)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        interpret=_interpret(),
    )(d[:, None].astype(jnp.float32), dj, w)
    return sums[:N, 0]
