"""Pallas TPU kernels: batch-affine pairwise tree folds for the MSM.

The Jacobian fold kernels (ops/pallas_fold.py) pay 23 field muls per
full add (13M+10S, add-2007-bl + masked dbl path). With an AFFINE
representation and a per-block batched inversion the unified affine
add/double costs ~5 muls of point math plus ~6 for the shared-inverse
machinery — ~2.1x less VPU work per fold lane. This is the standard
batch-affine trick (cf. the reference's batch_normalize use,
/root/reference/groth16/src/generator.rs:293) applied to every fold
level, not just the final normalization.

Element layout (RAFF, W) u32, RAFF = pad8(2C+1): rows [0,C) x, [C,2C) y
(sign-applied), row 2C a nonempty flag. This is exactly the gather
("prep") layout of ops/msm3.py, so the SAME kernel implements level-0
(affine+affine from the gather) and every later level (the fold output
is again affine): out[l] = in[l] + in[l + W/2].

A fold level is three dispatches (all inside one jit):
  K1  cases + per-block denominator tree:
        lanes viewed (SUB, 128) = full VPU tiles; per 2048-lane block:
        pair products via a sublane roll (16 -> 8 rows), an XOR-
        butterfly over the 8 sublanes (column products + all-but-self),
        a 128-lane XOR-butterfly for the block root + lane all-but-self.
        Writes per-leaf all-but-self products and the (root, lane-
        allbut) aux block.
  K2  one parallel Fermat inversion of the nb block roots
        (reuses ops/pallas_affine.ba_invert_roots) + a lazy multiply
        producing per-column inverses (colinv = lane_allbut * root_inv).
  K3  dinv = colinv * allbut_col, then the unified affine add/double
        with all special cases (double, cancel, one-side-empty) selected
        per lane.

All field muls run LAZY in [0, 2p) (ops/pallas_affine._LazyFieldOps,
conv+REDC for w<=13 limbs); zero tests compare against 0 and p.
Denominators of inactive lanes are 1, so the product tree never sees 0.

Cost per fold lane (Fq, w=13/L=32): K1 ~5.9 muls (1 pair + 3 butterfly8
+ ~0.9 lane butterfly + 1 allbut_col), K3 ~5.1 muls (dinv, x1^2, lam,
lam^2, y3) -> ~11 muls + ~16 adds vs 23 muls + 28 adds Jacobian.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs
from .curve import CurveOps
from .kernel_ops import _C
from .pallas_affine import (
    _LazyFieldOps,
    _lazy_ops,
    _raw_limbs,
    ba_invert_roots,
    mul_lazy,
    tree_batch_inv,
)

TILE = 2048
SUB = TILE // 128          # 16 sublane blocks per kernel tile
HSUB = SUB // 2


def _pad8(r: int) -> int:
    return -(-r // 8) * 8


def rows_aff(ops: CurveOps) -> int:
    return _pad8(2 * _C(ops) + 1)


def _consts(ops: CurveOps):
    spec = ops.f.spec
    return (
        spec,
        jnp.asarray(spec.p_limbs.reshape(spec.L, 1)),
        jnp.asarray(_raw_limbs(spec, 2 * spec.p)),
        jnp.asarray(spec.one_mont.reshape(spec.L, 1)),
    )


# ---------------------------------------------------------------------------
# Shared case analysis (fold form: both sides carry just a nonempty flag)
# ---------------------------------------------------------------------------


def _fold_cases(f, x1, y1, f1, x2, y2, f2):
    """Per-lane case masks + batched denominator for out = P1 + P2.

    Returns (dy, normal, dbl, only1, only2, den)."""
    dx = f.sub(x2, x1)
    dy = f.sub(y2, y1)
    eqx = f.is_zero(dx)
    eqy = f.is_zero(dy)
    both = f1 & f2
    normal = both & ~eqx
    dbl = both & eqx & eqy
    only1 = f1 & ~f2
    only2 = f2 & ~f1
    batch = f1.shape
    den = f.select(normal, dx, f.select(dbl, f.add(y1, y1), f.one(batch)))
    return dy, normal, dbl, only1, only2, den


def _split_aff(f, C, ref, shape):
    cs = f.coeff_shape
    v = ref[0:C].reshape(cs + shape)
    y = ref[C : 2 * C].reshape(cs + shape)
    flag = ref[2 * C] != 0
    return v, y, flag


def _xor_butterfly(f, x, steps, axis, size):
    """XOR-butterfly along ``axis`` (length ``size``): returns
    (prod_rep, allbut) where prod_rep = product of all entries
    (replicated) and allbut[i] = product of all entries but i."""

    def partner(v, s):
        d = 1 << s
        ii = jax.lax.broadcasted_iota(
            jnp.int32, (1,) * axis + (size,) + (1,) * (v.ndim - axis - 1),
            axis,
        )
        bit = ((ii >> s) & 1) != 0
        return jnp.where(
            bit,
            pltpu.roll(v, d, axis=axis),
            pltpu.roll(v, size - d, axis=axis),
        )

    allbut = None
    cur = x
    for s in range(steps):
        p = partner(cur, s)
        allbut = p if allbut is None else f.mul(allbut, p)
        cur = f.mul(cur, p)
    return cur, allbut


# ---------------------------------------------------------------------------
# K1: cases + per-block inverse tree (full-tile lanes)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 2))
def afold_tree(ops: CurveOps, arr, interpret: bool = False):
    """arr (RAFF, W) -> (allbut_col (C, W/2), aux (C, nb*256)).

    Per output block of TILE lanes: allbut_col[l] = prod of the other 15
    denominators in lane l's column x the partner pair-denominator; aux
    holds [lane_allbut (128) | root_rep (128)]."""
    spec, p_arr, p2_arr, one_arr = _consts(ops)
    C = _C(ops)
    RAFF = rows_aff(ops)
    W = arr.shape[-1]
    M = W // 2
    assert M % TILE == 0, (W, TILE)
    nb = M // TILE
    arr3 = arr.reshape(RAFF, W // 128, 128)

    def kernel(p_ref, p2_ref, one_ref, a_ref, b_ref, col_ref, aux_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], one_ref[:])
        sh = (SUB, 128)
        x1, y1, f1 = _split_aff(f, C, a_ref, sh)
        x2, y2, f2 = _split_aff(f, C, b_ref, sh)
        _, _, _, _, _, den = _fold_cases(f, x1, y1, f1, x2, y2, f2)
        ax = den.ndim - 2  # sublane-block axis

        # pair products: m1[i] = den[i] * den[i+8], rows [0, 8)
        m1 = f.mul(den, pltpu.roll(den, HSUB, axis=ax))
        m1 = jax.lax.slice_in_dim(m1, 0, HSUB, axis=ax)
        # column products + all-but-self over the 8 pair rows
        colp, ab8 = _xor_butterfly(f, m1, 3, ax, HSUB)
        # block root + lane all-but-self over 128 lanes (single row)
        col1 = jax.lax.slice_in_dim(colp, 0, 1, axis=ax)
        root_rep, ab_lane = _xor_butterfly(f, col1, 7, ax + 1, 128)

        # per-leaf all-but-self within the column:
        #   leaf i<8:  ab8[i] * den[i+8] ; leaf i>=8: ab8[i-8] * den[i-8]
        ab16 = jnp.concatenate([ab8, ab8], axis=ax)
        abcol = f.mul(ab16, pltpu.roll(den, HSUB, axis=ax))

        col_ref[:] = abcol.reshape(C, SUB, 128)
        aux_ref[:] = jnp.concatenate(
            [ab_lane.reshape(C, 128), root_rep.reshape(C, 128)], axis=-1
        )

    abcol, aux = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C, M // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((C, nb * 256), jnp.uint32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RAFF, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((RAFF, SUB, 128), lambda i: (0, i + nb, 0)),
        ],
        out_specs=(
            pl.BlockSpec((C, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((C, 256), lambda i: (0, i)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, one_arr, arr3, arr3)
    return abcol.reshape(C, M), aux


# ---------------------------------------------------------------------------
# K3: down-sweep + unified affine add/double
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 4))
def afold_apply(ops: CurveOps, arr, abcol, colinv, interpret: bool = False):
    """arr (RAFF, W), abcol (C, W/2), colinv (C, (W/2)/16) -> (RAFF, W/2)."""
    spec, p_arr, p2_arr, one_arr = _consts(ops)
    C = _C(ops)
    RAFF = rows_aff(ops)
    W = arr.shape[-1]
    M = W // 2
    assert M % TILE == 0
    nb = M // TILE
    arr3 = arr.reshape(RAFF, W // 128, 128)
    abcol3 = abcol.reshape(C, M // 128, 128)

    def kernel(p_ref, p2_ref, one_ref, a_ref, b_ref, col_ref, ci_ref,
               o_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], one_ref[:])
        cs = f.coeff_shape
        sh = (SUB, 128)
        x1, y1, f1 = _split_aff(f, C, a_ref, sh)
        x2, y2, f2 = _split_aff(f, C, b_ref, sh)
        dy, normal, dbl, only1, only2, den = _fold_cases(
            f, x1, y1, f1, x2, y2, f2
        )
        del den  # recomputed only for the case masks

        abcol_v = col_ref[:].reshape(cs + sh)
        ci = ci_ref[:].reshape(cs + (1, 128))
        ci = jnp.broadcast_to(ci, cs + sh)
        dinv = f.mul(ci, abcol_v)

        xx = f.sqr(x1)
        three_xx = f.add(f.add(xx, xx), xx)
        num = f.select(dbl, three_xx, dy)
        lam = f.mul(num, dinv)
        x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)

        active = normal | dbl
        nx = f.select(active, x3, f.select(only2, x2, x1))
        ny = f.select(active, y3, f.select(only2, y2, y1))
        nflag = (active | only1 | only2).astype(jnp.uint32)

        parts = [nx.reshape(C, SUB, 128), ny.reshape(C, SUB, 128),
                 nflag.reshape(1, SUB, 128)]
        pad = RAFF - 2 * C - 1
        if pad:
            parts.append(jnp.zeros((pad, SUB, 128), jnp.uint32))
        o_ref[:] = jnp.concatenate(parts, axis=0)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RAFF, M // 128, 128), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RAFF, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((RAFF, SUB, 128), lambda i: (0, i + nb, 0)),
            pl.BlockSpec((C, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((C, 128), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((RAFF, SUB, 128), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, one_arr, arr3, arr3, abcol3, colinv)
    return out.reshape(RAFF, M)


# ---------------------------------------------------------------------------
# Level driver
# ---------------------------------------------------------------------------


def afold(ops: CurveOps, arr, interpret: bool = False):
    """One fold level: (RAFF, W) -> (RAFF, W/2), out[l] = in[l]+in[l+M].

    K1 -> K2 (Fermat on block roots) -> colinv -> K3, all traceable
    under one jit."""
    C = _C(ops)
    M = arr.shape[-1] // 2
    nb = M // TILE
    abcol, aux = afold_tree(ops, arr, interpret)
    aux3 = aux.reshape(C, nb, 256)
    roots = aux3[:, :, 128]                          # (C, nb)
    ab_lane = aux3[:, :, :128].reshape(C, nb * 128)
    rinv = ba_invert_roots(ops, roots, interpret)    # (C, nb)
    rep = jnp.broadcast_to(
        rinv[:, :, None], (C, nb, 128)
    ).reshape(C, nb * 128)
    colinv = _mul_lazy_padded(ops, ab_lane, rep, interpret)
    return afold_apply(ops, arr, abcol, colinv, interpret)


def _mul_lazy_padded(ops: CurveOps, a, b, interpret: bool):
    """mul_lazy with lane padding to a legal tile multiple."""
    C, M = a.shape
    T = min(M, TILE)
    if M % T:
        pad = T - M % T
        one = jnp.asarray(ops.f.spec.one_mont)
        ap = jnp.concatenate(
            [a, jnp.broadcast_to(one.reshape(C, 1), (C, pad))], axis=1
        ) if C == ops.f.spec.L else jnp.concatenate(
            [a, jnp.zeros((C, pad), jnp.uint32)], axis=1
        )
        bp = jnp.concatenate([b, jnp.zeros((C, pad), jnp.uint32)], axis=1)
        return mul_lazy(ops, ap, bp, interpret)[:, :M]
    return mul_lazy(ops, a, b, interpret)


# ---------------------------------------------------------------------------
# jnp twin (CPU tests / CPU prover path): canonical representation
# ---------------------------------------------------------------------------


def afold_jnp(ops: CurveOps, arr):
    """Pure-jnp twin of afold (canonical representation)."""
    f = ops.f
    C = _C(ops)
    RAFF = rows_aff(ops)
    W = arr.shape[-1]
    M = W // 2
    cs = f.coeff_shape

    def split(lo, hi):
        x = arr[0:C, lo:hi].reshape(cs + (hi - lo,))
        y = arr[C : 2 * C, lo:hi].reshape(cs + (hi - lo,))
        return x, y, arr[2 * C, lo:hi] != 0

    x1, y1, f1 = split(0, M)
    x2, y2, f2 = split(M, W)
    dy, normal, dbl, only1, only2, den = _fold_cases(
        f, x1, y1, f1, x2, y2, f2
    )
    # tree_batch_inv needs a power-of-two width; pad with ones
    M2 = 1 << max(M - 1, 0).bit_length() if M > 1 else 1
    if M2 != M:
        den_p = jnp.concatenate(
            [den, f.one((M2 - M,))], axis=den.ndim - 1
        )
        dinv = tree_batch_inv(f, den_p)[..., :M]
    else:
        dinv = tree_batch_inv(f, den)
    xx = f.sqr(x1)
    three_xx = f.add(f.add(xx, xx), xx)
    num = f.select(dbl, three_xx, dy)
    lam = f.mul(num, dinv)
    x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
    active = normal | dbl
    nx = f.select(active, x3, f.select(only2, x2, x1))
    ny = f.select(active, y3, f.select(only2, y2, y1))
    nflag = (active | only1 | only2).astype(jnp.uint32)
    parts = [nx.reshape(C, M), ny.reshape(C, M), nflag[None]]
    pad = RAFF - 2 * C - 1
    if pad:
        parts.append(jnp.zeros((pad, M), jnp.uint32))
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Affine -> Jacobian batch (for the existing totals pass)
# ---------------------------------------------------------------------------


def aff_to_jac(ops: CurveOps, arr, rows_jac_out: int):
    """(RAFF, W) lazy affine -> (RJ, W) canonical Jacobian rows
    (Z = 1 for nonempty lanes, 0 for empty)."""
    spec = ops.f.spec
    C = _C(ops)
    W = arr.shape[-1]

    def canon(rows):
        out = []
        for b in range(C // spec.L):
            out.append(
                limbs._cond_sub_p(spec, rows[b * spec.L : (b + 1) * spec.L])
            )
        return jnp.concatenate(out, axis=0)

    x = canon(arr[0:C])
    y = canon(arr[C : 2 * C])
    flag = arr[2 * C] != 0
    one = jnp.asarray(spec.one_mont)  # (L, 1)
    z_unit = jnp.broadcast_to(one, (spec.L, W))
    z = jnp.where(flag[None], z_unit, 0)
    if C != spec.L:  # Fq2: Z = (1, 0) stacked rows
        z = jnp.concatenate(
            [z, jnp.zeros((C - spec.L, W), jnp.uint32)], axis=0
        )
    parts = [x, y, z]
    if rows_jac_out > 3 * C:
        parts.append(
            jnp.zeros((rows_jac_out - 3 * C, W), jnp.uint32)
        )
    return jnp.concatenate(parts, axis=0)
