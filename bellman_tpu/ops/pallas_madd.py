"""Pallas TPU kernel: masked mixed addition for the MSM accumulate rounds.

One round of the bucket-accumulate phase adds, for every active bucket
lane, the next affine point mapped to that bucket into a Jacobian
accumulator (ops/msm2.py builds the schedule). The reference's serial
scatter (/root/reference/src/multiexp.rs:242-265) becomes a full-width
vector operation: per lane a branchless mixed add (madd-2007-bl) with
the affine-doubling (mdbl-2007-bl) and identity/negation special cases
resolved by lane selects — 7M+4S for the add path plus 1M+5S for the
doubling path, versus ~20 muls for the general Jacobian add.

Layout: one (ROWS, W) uint32 array per curve —
  accumulator rows [0, 3C): Jacobian X, Y, Z coordinate limbs
  addend rows     [0, 2C): affine x, y limbs (a separate array)
  aux row 0: valid mask (0 => lane is a no-op this round)
  aux row 1: sign (1 => addend y is negated: signed-digit windows)
Rows are padded to sublane multiples of 8. The kernel grid walks lane
blocks; a block whose valid row is all-zero skips the arithmetic
entirely (tail rounds run at full width but only DMA), which keeps the
kernel shape-stable across rounds — one compile per curve.
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
from .kernel_ops import _kernel_curve_ops, _C

TILE = 2048


def _pad8(r: int) -> int:
    return -(-r // 8) * 8


def rows_acc(ops: CurveOps) -> int:
    return _pad8(3 * _C(ops))


def rows_add(ops: CurveOps) -> int:
    return _pad8(2 * _C(ops)) + 8  # x, y rows + one 8-row aux block


def _madd_lanes(kops, C, acc, x2, y2, valid, sign):
    """Branchless mixed add on (coeff.., T) coordinate arrays.

    acc: (X1, Y1, Z1) Jacobian; (x2, y2) affine addend; valid/sign (T,).
    Returns the new (X3, Y3, Z3).
    """
    f = kops.f
    X1, Y1, Z1 = acc
    # signed-digit negation: y2 <- p - y2 where sign set
    y2 = f.select(sign != 0, f.neg(y2), y2)

    acc_inf = f.is_zero(Z1)

    # madd-2007-bl (Z2 = 1)
    Z1Z1 = f.sqr(Z1)
    U2 = f.mul(x2, Z1Z1)
    S2 = f.mul(y2, f.mul(Z1, Z1Z1))
    H = f.sub(U2, X1)
    HH = f.sqr(H)
    I = f.add(HH, HH)
    I = f.add(I, I)
    J = f.mul(H, I)
    r2 = f.sub(S2, Y1)
    r2 = f.add(r2, r2)
    V = f.mul(X1, I)
    r2sq = f.sqr(r2)
    X3 = f.sub(r2sq, f.add(J, f.add(V, V)))
    Y1J = f.mul(Y1, J)
    Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.add(Y1J, Y1J))
    ZH = f.sqr(f.add(Z1, H))
    Z3 = f.sub(f.sub(ZH, Z1Z1), HH)

    # mdbl-2007-bl: double the affine addend (the acc == addend case)
    XX = f.sqr(x2)
    YY = f.sqr(y2)
    YYYY = f.sqr(YY)
    Sd = f.sqr(f.add(x2, YY))
    Sd = f.sub(f.sub(Sd, XX), YYYY)
    Sd = f.add(Sd, Sd)
    M = f.add(f.add(XX, XX), XX)
    T0 = f.sub(f.sqr(M), f.add(Sd, Sd))
    Y8 = f.add(YYYY, YYYY)
    Y8 = f.add(Y8, Y8)
    Y8 = f.add(Y8, Y8)
    Yd = f.sub(f.mul(M, f.sub(Sd, T0)), Y8)
    Zd = f.add(y2, y2)

    h0 = f.is_zero(H)
    r0 = f.is_zero(r2)
    batch = X1.shape[len(f.coeff_shape):]
    one = f.one(batch)
    zero = f.zeros(batch)

    def sel3(mask, p, q):
        return tuple(f.select(mask, a, b) for a, b in zip(p, q))

    res = (X3, Y3, Z3)
    res = sel3(~acc_inf & h0 & r0, (T0, Yd, Zd), res)       # P == Q
    res = sel3(~acc_inf & h0 & ~r0, (one, one, zero), res)  # P == -Q
    res = sel3(acc_inf, (x2, y2, one), res)                 # 0 + Q
    res = sel3(valid == 0, (X1, Y1, Z1), res)               # masked lane
    return res


def _split_coords(C, packed):
    """(2C_pad+8, T) addend block -> x, y coordinate arrays + aux rows."""
    x = packed[:C]
    y = packed[C : 2 * C]
    aux = packed[_pad8(2 * C) : _pad8(2 * C) + 8]
    return x, y, aux


@functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def madd_round(ops: CurveOps, acc, addend, interpret: bool = False):
    """One accumulate round over the full lane width.

    acc: (rows_acc, W); addend: (rows_add, W) — see module docstring.
    Lanes whose valid row is zero pass through; a lane block that is
    entirely invalid skips compute (tail rounds cost DMA only).
    """
    spec = ops.f.spec
    C = _C(ops)
    RA = rows_acc(ops)
    RD = rows_add(ops)
    W = acc.shape[-1]
    assert W % TILE == 0
    cs = ops.f.coeff_shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))

    def kernel(p_ref, one_ref, add_ref, acc_ref, o_ref):
        valid_row = add_ref[_pad8(2 * C)]

        @pl.when(jnp.any(valid_row != 0))
        def _():
            kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
            T = valid_row.shape[-1]
            a = acc_ref[:]
            d = add_ref[:]
            X1 = a[:C].reshape(cs + (T,))
            Y1 = a[C : 2 * C].reshape(cs + (T,))
            Z1 = a[2 * C : 3 * C].reshape(cs + (T,))
            x2 = d[:C].reshape(cs + (T,))
            y2 = d[C : 2 * C].reshape(cs + (T,))
            sign_row = d[_pad8(2 * C) + 1]
            X3, Y3, Z3 = _madd_lanes(
                kops, C, (X1, Y1, Z1), x2, y2, valid_row, sign_row
            )
            parts = [X3.reshape(C, T), Y3.reshape(C, T), Z3.reshape(C, T)]
            if RA > 3 * C:
                parts.append(jnp.zeros((RA - 3 * C, T), jnp.uint32))
            o_ref[:] = jnp.concatenate(parts, axis=0)

        @pl.when(jnp.logical_not(jnp.any(valid_row != 0)))
        def _():
            o_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RA, W), jnp.uint32),
        grid=(W // TILE,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RD, TILE), lambda i: (0, i)),
            pl.BlockSpec((RA, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((RA, TILE), lambda i: (0, i)),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, addend, acc)


def madd_round_jnp(ops: CurveOps, acc, addend):
    """Pure-jnp twin of madd_round (CPU tests / reference path)."""
    C = _C(ops)
    cs = ops.f.coeff_shape
    W = acc.shape[-1]
    X1 = acc[:C].reshape(cs + (W,))
    Y1 = acc[C : 2 * C].reshape(cs + (W,))
    Z1 = acc[2 * C : 3 * C].reshape(cs + (W,))
    x2 = addend[:C].reshape(cs + (W,))
    y2 = addend[C : 2 * C].reshape(cs + (W,))
    valid = addend[_pad8(2 * C)]
    sign = addend[_pad8(2 * C) + 1]
    X3, Y3, Z3 = _madd_lanes(ops, C, (X1, Y1, Z1), x2, y2, valid, sign)
    RA = rows_acc(ops)
    parts = [X3.reshape(C, W), Y3.reshape(C, W), Z3.reshape(C, W)]
    if RA > 3 * C:
        parts.append(jnp.zeros((RA - 3 * C, W), jnp.uint32))
    return jnp.concatenate(parts, axis=0)
