"""Pallas TPU kernels: pairwise tree-fold point reduction for msm3.

The retired v2 accumulate rounds (round-scheduled mixed adds)
pay one random point-gather per round — measured at ~60 M indices/s on
this chip, that gather IS the MSM runtime. msm3 gathers every point
exactly once into an occupancy-grouped rank-major layout and then
reduces each bucket with contiguous pairwise folds:

  fold j:   out[:, i] = in[:, i] + in[:, i + W/2]      (rank-major, so
            slot (rank r, lane l) combines with (r + cap/2, l))

Every fold is a full-width branchless Jacobian add (ops/curve.py
formulas via the kernel field ops of ops/kernel_ops.py); empty/padded
slots are encoded as Z = 0 and need no flag machinery — the add's
identity masking handles them. log2(cap) sequential levels replace the
occupancy-many sequential rounds of msm2 (/root/reference/src/
multiexp.rs:242-265 is the serial scatter both replace).

Kernels:
* ``level0_fold``  — (RP, W) gathered affine prep -> (3C, W/2) Jacobian:
  converts (x, y, valid) to points (z = valid ? 1 : 0) and adds pairs.
* ``pair_fold``    — (3C, W) Jacobian -> (3C, W/2).
* ``butterfly_reduce`` — (3C, 2048) -> (3C, 128) with every lane holding
  the total (roll-add doubling); finishes the per-lane heavy path.

Both halves of each input are passed as two BlockSpecs over the SAME
array (index maps offset by half the grid) — no XLA-side slicing copies.

Lane layout: the VPU is an 8x128 grid, so a (1, W) limb-row op uses one
sublane in eight. The fold kernels therefore view the W lanes as
(W/128, 128) and run every per-limb op on (SUB, 128) = full-tile
batches (SUB = 16 sublanes -> two native (8, 128) u32 tiles). External
signatures stay 2-D (R, W); the 3-D reshape lives inside the jitted
call, so adjacent levels' reshape pairs cancel under one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .curve import CurveOps
from .kernel_ops import _kernel_curve_ops, _C

TILE = 2048
SUB = TILE // 128  # sublane blocks per kernel tile (16, 128)


def _pad8(r: int) -> int:
    return (r + 7) & ~7


def rows_prep(ops: CurveOps) -> int:
    """Gathered-prep rows: x (C) + y (C) + valid flag, padded."""
    return _pad8(2 * _C(ops) + 1)


def rows_jac(ops: CurveOps) -> int:
    return 3 * _C(ops)  # 72 (G1) / 144 (G2), both multiples of 8


def _consts(ops: CurveOps):
    spec = ops.f.spec
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))
    return spec, p_arr, one_arr


def _read_point(ops: CurveOps, kops, C, ref):
    cs = ops.f.coeff_shape
    x = ref[0:C].reshape(cs + (SUB, 128))
    y = ref[C : 2 * C].reshape(cs + (SUB, 128))
    v = ref[2 * C]
    f = kops.f
    z = f.select(v != 0, f.one((SUB, 128)), f.zeros((SUB, 128)))
    return (x, y, z)


def _read_jac(ops: CurveOps, C, ref):
    cs = ops.f.coeff_shape
    return (
        ref[0:C].reshape(cs + (SUB, 128)),
        ref[C : 2 * C].reshape(cs + (SUB, 128)),
        ref[2 * C : 3 * C].reshape(cs + (SUB, 128)),
    )


def _write_jac(C, o_ref, r):
    o_ref[:] = jnp.concatenate([c.reshape(C, SUB, 128) for c in r], axis=0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def level0_fold(ops: CurveOps, prep, interpret: bool = False):
    """(RP, W) gathered affine prep -> (3C, W/2) Jacobian pair sums."""
    spec, p_arr, one_arr = _consts(ops)
    C = _C(ops)
    RP = rows_prep(ops)
    RJ = rows_jac(ops)
    W = prep.shape[-1]
    M = W // 2
    assert M % TILE == 0, (W, TILE)
    nb = M // TILE
    prep3 = prep.reshape(RP, W // 128, 128)

    def kernel(p_ref, one_ref, a_ref, b_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        r = kops.add(
            _read_point(ops, kops, C, a_ref), _read_point(ops, kops, C, b_ref)
        )
        _write_jac(C, o_ref, r)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RJ, M // 128, 128), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RP, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((RP, SUB, 128), lambda i: (0, i + nb, 0)),
        ],
        out_specs=pl.BlockSpec((RJ, SUB, 128), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, prep3, prep3)
    return out.reshape(RJ, M)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pair_fold(ops: CurveOps, jac, interpret: bool = False):
    """(3C, W) Jacobian -> (3C, W/2): out[i] = in[i] + in[i + W/2]."""
    spec, p_arr, one_arr = _consts(ops)
    C = _C(ops)
    RJ = rows_jac(ops)
    W = jac.shape[-1]
    M = W // 2
    assert M % TILE == 0, (W, TILE)
    nb = M // TILE
    jac3 = jac.reshape(RJ, W // 128, 128)

    def kernel(p_ref, one_ref, a_ref, b_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        r = kops.add(_read_jac(ops, C, a_ref), _read_jac(ops, C, b_ref))
        _write_jac(C, o_ref, r)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RJ, M // 128, 128), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RJ, SUB, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((RJ, SUB, 128), lambda i: (0, i + nb, 0)),
        ],
        out_specs=pl.BlockSpec((RJ, SUB, 128), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, jac3, jac3)
    return out.reshape(RJ, M)


@functools.partial(jax.jit, static_argnums=(0, 2))
def butterfly_reduce(ops: CurveOps, jac, interpret: bool = False):
    """(3C, 2048) Jacobian -> (3C, 128), every lane = sum of all lanes.

    Roll-add doubling: after step s every lane holds the sum of a
    2^(s+1)-lane window; 11 steps cover 2048."""
    spec, p_arr, one_arr = _consts(ops)
    C = _C(ops)
    RJ = rows_jac(ops)
    assert jac.shape[-1] == TILE

    def kernel(p_ref, one_ref, a_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        # 1-D lane view (NOT the (SUB, 128) full-tile view): the roll-
        # doubling below sums across the whole flat lane axis. This
        # kernel only serves rare heavy lanes, so the sublane
        # underutilization is acceptable.
        cs = ops.f.coeff_shape
        v = (
            a_ref[0:C].reshape(cs + (TILE,)),
            a_ref[C : 2 * C].reshape(cs + (TILE,)),
            a_ref[2 * C : 3 * C].reshape(cs + (TILE,)),
        )
        for s in range(11):
            rolled = tuple(
                pltpu.roll(c, 1 << s, axis=c.ndim - 1) for c in v
            )
            v = kops.add(v, rolled)
        o_ref[:] = jnp.concatenate(
            [c[..., :128].reshape(C, 128) for c in v], axis=0
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RJ, 128), jnp.uint32),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RJ, TILE), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((RJ, 128), lambda i: (0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, jac)


# ---------------------------------------------------------------------------
# jnp twins (CPU reference / tests)
# ---------------------------------------------------------------------------


def _split_prep(ops: CurveOps, prep):
    C = _C(ops)
    W = prep.shape[-1]
    cs = ops.f.coeff_shape + (W,)
    f = ops.f
    x = prep[0:C].reshape(cs)
    y = prep[C : 2 * C].reshape(cs)
    v = prep[2 * C]
    z = f.select(v != 0, f.one((W,)), f.zeros((W,)))
    return (x, y, z)


def level0_fold_jnp(ops: CurveOps, prep):
    C = _C(ops)
    W = prep.shape[-1]
    M = W // 2
    pt = _split_prep(ops, prep)
    a = tuple(c[..., :M] for c in pt)
    b = tuple(c[..., M:] for c in pt)
    r = ops.add(a, b)
    return jnp.concatenate([c.reshape(C, M) for c in r], axis=0)


def pair_fold_jnp(ops: CurveOps, jac):
    C = _C(ops)
    W = jac.shape[-1]
    M = W // 2
    cs = ops.f.coeff_shape + (M,)

    def part(lo, hi):
        return (
            jac[0:C, lo:hi].reshape(cs),
            jac[C : 2 * C, lo:hi].reshape(cs),
            jac[2 * C :, lo:hi].reshape(cs),
        )

    r = ops.add(part(0, M), part(M, W))
    return jnp.concatenate([c.reshape(C, M) for c in r], axis=0)


# ---------------------------------------------------------------------------
# 3D folds for the bit-weighted window-totals pass (msm3._totals_bits):
# array (K, 3C, W) of K independent b-major lane planes; fold the W axis.
# K leads so each block's trailing dims are (rows, lanes) — Mosaic
# requires the last two block dims divisible by (8, 128).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 2))
def pair_fold3(ops: CurveOps, jac, interpret: bool = False):
    """(K, 3C, W) -> (K, 3C, W/2): out[k, i] = in[k, i] + in[k, i+W/2]."""
    spec, p_arr, one_arr = _consts(ops)
    C = _C(ops)
    RJ = rows_jac(ops)
    K, W = jac.shape[0], jac.shape[2]
    M = W // 2
    BW = min(M, TILE)
    assert M % BW == 0 and BW % 128 == 0, (W, BW)
    nb = M // BW
    sb = BW // 128
    # Mosaic constraint: a block's last two dims must be divisible by
    # (8, 128) or equal the array dims. The 4-D full-tile layout needs
    # sb % 8 == 0 (or one block covering all lane-blocks); narrow late
    # fold levels (W <= 1024) take the 3-D (rows, lanes) layout, where
    # the (RJ, BW) trailing block dims are always legal.
    full_tile = sb % 8 == 0

    def rd_shaped(ref, shape):
        cs = ops.f.coeff_shape
        v = ref[:].reshape((RJ,) + shape)
        return (
            v[0:C].reshape(cs + shape),
            v[C : 2 * C].reshape(cs + shape),
            v[2 * C :].reshape(cs + shape),
        )

    if full_tile:
        jac4 = jac.reshape(K, RJ, W // 128, 128)

        def kernel(p_ref, one_ref, a_ref, b_ref, o_ref):
            kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
            r = kops.add(
                rd_shaped(a_ref, (sb, 128)), rd_shaped(b_ref, (sb, 128))
            )
            o_ref[:] = jnp.concatenate(
                [c.reshape(C, sb, 128) for c in r], axis=0
            ).reshape(1, RJ, sb, 128)

        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (K, RJ, M // 128, 128), jnp.uint32
            ),
            grid=(K, nb),
            in_specs=[
                pl.BlockSpec((spec.L, 1), lambda k, i: (0, 0)),
                pl.BlockSpec((spec.L, 1), lambda k, i: (0, 0)),
                pl.BlockSpec((1, RJ, sb, 128), lambda k, i: (k, 0, i, 0)),
                pl.BlockSpec(
                    (1, RJ, sb, 128), lambda k, i: (k, 0, i + nb, 0)
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, RJ, sb, 128), lambda k, i: (k, 0, i, 0)
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(p_arr, one_arr, jac4, jac4)
        return out.reshape(K, RJ, M)

    def kernel3(p_ref, one_ref, a_ref, b_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        r = kops.add(rd_shaped(a_ref, (BW,)), rd_shaped(b_ref, (BW,)))
        o_ref[:] = jnp.concatenate(
            [c.reshape(C, BW) for c in r], axis=0
        ).reshape(1, RJ, BW)

    return pl.pallas_call(
        kernel3,
        out_shape=jax.ShapeDtypeStruct((K, RJ, M), jnp.uint32),
        grid=(K, nb),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda k, i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda k, i: (0, 0)),
            pl.BlockSpec((1, RJ, BW), lambda k, i: (k, 0, i)),
            pl.BlockSpec((1, RJ, BW), lambda k, i: (k, 0, i + nb)),
        ],
        out_specs=pl.BlockSpec((1, RJ, BW), lambda k, i: (k, 0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, jac, jac)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def window_reduce(ops: CurveOps, jac, nw: int, interpret: bool = False):
    """(K, 3C, 128) b-major planes -> per-window sums in lanes [0, nw).

    Lane layout within a plane is (b_group * nw + w); roll-left strides
    nw, 2nw, ... accumulate all b groups onto the first nw lanes."""
    spec, p_arr, one_arr = _consts(ops)
    C = _C(ops)
    RJ = rows_jac(ops)
    K, W = jac.shape[0], jac.shape[2]
    assert W == 128 and 128 % nw == 0

    def kernel(p_ref, one_ref, a_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        cs = ops.f.coeff_shape
        v0 = a_ref[:].reshape(RJ, W)
        v = (
            v0[0:C].reshape(cs + (W,)),
            v0[C : 2 * C].reshape(cs + (W,)),
            v0[2 * C :].reshape(cs + (W,)),
        )
        stride = nw
        while stride < W:
            rolled = tuple(
                pltpu.roll(c, W - stride, axis=c.ndim - 1) for c in v
            )
            v = kops.add(v, rolled)
            stride *= 2
        o_ref[:] = jnp.concatenate(
            [c.reshape(C, W) for c in v], axis=0
        ).reshape(1, RJ, W)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K, RJ, W), jnp.uint32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((1, RJ, W), lambda k: (k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, RJ, W), lambda k: (k, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, jac)


def pair_fold3_jnp(ops: CurveOps, jac):
    """jnp twin on (3C, K, W) layout (limb rows leading, as ops.add
    expects; the CPU path has no block-tiling constraint)."""
    C = _C(ops)
    RJ, K, W = jac.shape
    M = W // 2
    cs = ops.f.coeff_shape + (K, M)

    def part(lo, hi):
        return (
            jac[0:C, :, lo:hi].reshape(cs),
            jac[C : 2 * C, :, lo:hi].reshape(cs),
            jac[2 * C :, :, lo:hi].reshape(cs),
        )

    r = ops.add(part(0, M), part(M, W))
    return jnp.concatenate([c.reshape(C, K, M) for c in r], axis=0)


def window_reduce_jnp(ops: CurveOps, jac, nw: int):
    """jnp twin on (3C, K, W) layout."""
    C = _C(ops)
    RJ, K, W = jac.shape
    cs = ops.f.coeff_shape + (K, W)
    v = (
        jac[0:C].reshape(cs),
        jac[C : 2 * C].reshape(cs),
        jac[2 * C :].reshape(cs),
    )
    stride = nw
    while stride < W:
        rolled = tuple(jnp.roll(c, -stride, axis=c.ndim - 1) for c in v)
        v = ops.add(v, rolled)
        stride *= 2
    return jnp.concatenate([c.reshape(C, K, W) for c in v], axis=0)
