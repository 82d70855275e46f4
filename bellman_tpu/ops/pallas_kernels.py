"""Pallas TPU kernels for fused limb-arithmetic hot paths.

XLA already fuses much of the elementwise Montgomery arithmetic; these
kernels exist for the chains XLA keeps in HBM: explicit VMEM tiling for
the h-pipeline's pointwise stage ((a*b - c) * 1/z — three Montgomery
passes fused into one read of each operand) and a general fused
elementwise Montgomery multiply.

The kernel BODIES reuse ops.limbs' raw lazy-carry CIOS (the math is
identical); Pallas contributes the memory schedule: (L, TILE_N) blocks
resident in VMEM across the whole chain. Layout: limb axis on sublanes
(L = 16 or 24, both sublane-aligned multiples of 8), batch on lanes.

Gated by ``enabled()``: on TPU backends the kernels compile natively;
elsewhere (CPU tests) callers use interpret mode or the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import limbs
from .limbs import FieldSpec

TILE_N = 512


def enabled() -> bool:
    try:
        plat = jax.default_backend()
    except Exception:  # noqa: BLE001
        return False
    return plat in ("tpu", "axon")


def _grid_for(n: int):
    assert n % TILE_N == 0, "pallas path requires TILE_N-aligned batches"
    return (n // TILE_N,)


@functools.partial(jax.jit, static_argnums=(0, 3))
def mont_mul(spec: FieldSpec, a, b, interpret: bool = False):
    """Elementwise Montgomery multiply as a Pallas kernel.

    a, b: (L, n) with n a multiple of TILE_N."""
    L, n = a.shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))

    def kernel(p_ref, a_ref, b_ref, o_ref):
        o_ref[:] = limbs.mont_mul_kernel(spec, a_ref[:], b_ref[:], p_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=_grid_for(n),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
        interpret=interpret,
    )(p_arr, a, b)


@functools.partial(jax.jit, static_argnums=(0, 4))
def h_pointwise(spec: FieldSpec, a, b, c, interpret: bool = False, *, zinv):
    """(a*b - c) * zinv fused in one VMEM pass (prover.rs:232-237's
    pointwise middle of the h-pipeline).

    a, b, c: (L, n); zinv: (L, 1) Montgomery constant."""
    L, n = a.shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))

    def kernel(p_ref, a_ref, b_ref, c_ref, z_ref, o_ref):
        p = p_ref[:]
        t = limbs.mont_mul_kernel(spec, a_ref[:], b_ref[:], p)
        t = limbs.sub_kernel(spec, t, c_ref[:], p)
        o_ref[:] = limbs.mont_mul_kernel(spec, t, z_ref[:], p)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        grid=_grid_for(n),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
        interpret=interpret,
    )(p_arr, a, b, c, zinv)


@functools.partial(jax.jit, static_argnums=(0, 4))
def butterfly(spec: FieldSpec, u, v, w, interpret: bool = False):
    """FFT butterfly stage, fused: returns (u + v*w, u - v*w).

    u, v, w: (L, M) Montgomery with M a multiple of TILE_N. One VMEM
    pass replaces a multiply and two carry chains that otherwise run as
    ~50 sequential while-loop steps each (PERF.md)."""
    L, M = u.shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))

    def kernel(p_ref, u_ref, v_ref, w_ref, add_ref, sub_ref):
        p = p_ref[:]
        t = limbs.mont_mul_kernel(spec, v_ref[:], w_ref[:], p)
        uu = u_ref[:]
        add_ref[:] = limbs.add_kernel(spec, uu, t, p)
        sub_ref[:] = limbs.sub_kernel(spec, uu, t, p)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, M), jnp.uint32),
            jax.ShapeDtypeStruct((L, M), jnp.uint32),
        ),
        grid=_grid_for(M),
        in_specs=[
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
            pl.BlockSpec((L, TILE_N), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(p_arr, u, v, w)
