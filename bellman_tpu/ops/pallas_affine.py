"""Shared batch-affine kernel infrastructure for the MSM fold family.

Lazy [0, 2p)-representation field ops (no trailing conditional
subtraction; zero tests compare against both 0 and p — the CIOS output
bound 4p²/R + p < 2p keeps the representation stable), the parallel
Fermat inversion of product-tree roots (K2 of the batched Montgomery
inversion trick, cf. the reference's batch_normalize,
/root/reference/groth16/src/generator.rs:293,419-422), the lazy
elementwise multiply, and the jnp-twin fold-in-half batch inversion.

Consumed by ops/pallas_afold.py (the batch-affine pairwise tree folds
that accumulate every MSM bucket, ops/msm3.py). The v2 round-scheduled
accumulate kernels that used to live here (affine_round / ba_tree_up /
ba_apply) were superseded by the tree folds and removed.
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


def rows_aff(ops: CurveOps) -> int:
    return _pad8(2 * _C(ops) + 1)


def _raw_limbs(spec, v: int) -> np.ndarray:
    """Unreduced little-endian limbs of v (to_limbs reduces mod p)."""
    return np.array(
        [(v >> (spec.w * i)) & spec.mask for i in range(spec.L)],
        dtype=np.uint32,
    ).reshape(spec.L, 1)


# ---------------------------------------------------------------------------
# Lazy field ops: [0, 2p) representation
# ---------------------------------------------------------------------------


def mont_mul_nsc(spec, a, b, p):
    """Montgomery multiply WITHOUT the trailing cond-sub.

    Inputs/outputs in [0, 2p). Dispatches to the conv+REDC form when
    the limb width admits it (w <= 13: ~2.4x fewer VPU ops at L=32
    than the lo/hi-splitting CIOS); w=16 limbs take the CIOS loop."""
    if spec.conv_ok:
        return limbs.mont_mul_conv_nsc(spec, a, b, p)
    L = spec.L
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (L,) + batch)
    ninv = np.uint32(spec.ninv)
    pu = p.reshape((L,) + (1,) * len(batch)).astype(jnp.uint32)
    t = jnp.zeros((L + 2,) + batch, dtype=jnp.uint32)

    def acc(t, vec):
        lo = t[:L] + (vec & spec.mask)
        mid = jnp.concatenate([lo[1:], t[L : L + 1]], axis=0) + (vec >> spec.w)
        return jnp.concatenate([lo[:1], mid, t[L + 1 :]], axis=0)

    for i in range(L):
        t = acc(t, a[i][None] * b)
        m = (t[0] * ninv) & spec.mask
        t = acc(t, m[None] * pu)
        carry = t[0] >> spec.w
        head = (t[1] + carry)[None]
        t = jnp.concatenate(
            [head, t[2:], jnp.zeros((1,) + batch, dtype=jnp.uint32)], axis=0
        )
    return limbs._propagate_unrolled(t, spec.w)[:L]


class _LazyFieldOps:
    """Field ops on [0, 2p): muls skip the cond-sub; add/sub reduce
    against 2p (one cond-sub keeps the range stable)."""

    def __init__(self, spec, p, p2, one):
        self.spec = spec
        self.p = p      # (L, 1) canonical modulus
        self.p2 = p2    # (L, 1) 2p
        self.one_arr = one
        self.coeff_shape = (spec.L,)

    def add(self, a, b):
        return limbs.add_kernel(self.spec, a, b, self.p2)

    def sub(self, a, b):
        return limbs.sub_kernel(self.spec, a, b, self.p2)

    def neg(self, a):
        return limbs.sub_kernel(self.spec, jnp.zeros_like(a), a, self.p2)

    def mul(self, a, b):
        return mont_mul_nsc(self.spec, a, b, self.p)

    def sqr(self, a):
        return mont_mul_nsc(self.spec, a, a, self.p)

    def is_zero(self, a):
        """Zero mod p: representative 0 or p."""
        pz = self.p.reshape((self.spec.L,) + (1,) * (a.ndim - 1))
        return jnp.all(a == 0, axis=0) | jnp.all(a == pz, axis=0)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def zeros(self, batch):
        return jnp.zeros(self.coeff_shape + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        one = self.one_arr.reshape(self.coeff_shape + (1,) * len(batch))
        return jnp.broadcast_to(one, self.coeff_shape + tuple(batch))


class _LazyFq2Ops(_LazyFieldOps):
    def __init__(self, spec, p, p2, one):
        super().__init__(spec, p, p2, one)
        self.coeff_shape = (2, spec.L)

    def add(self, a, b):
        s = super()
        return jnp.stack([s.add(a[0], b[0]), s.add(a[1], b[1])])

    def sub(self, a, b):
        s = super()
        return jnp.stack([s.sub(a[0], b[0]), s.sub(a[1], b[1])])

    def neg(self, a):
        s = super()
        return jnp.stack([s.neg(a[0]), s.neg(a[1])])

    def mul(self, a, b):
        s = super()
        t0 = s.mul(a[0], b[0])
        t1 = s.mul(a[1], b[1])
        t2 = s.mul(s.add(a[0], a[1]), s.add(b[0], b[1]))
        return jnp.stack([s.sub(t0, t1), s.sub(s.sub(t2, t0), t1)])

    def sqr(self, a):
        s = super()
        t0 = s.mul(s.add(a[0], a[1]), s.sub(a[0], a[1]))
        t1 = s.mul(a[0], a[1])
        return jnp.stack([t0, s.add(t1, t1)])

    def is_zero(self, a):
        s = super()
        return s.is_zero(a[0]) & s.is_zero(a[1])

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def zeros(self, batch):
        return jnp.zeros((2, self.spec.L) + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        s = self.spec
        c0 = self.one_arr.reshape((s.L,) + (1,) * len(batch))
        c0 = jnp.broadcast_to(c0, (s.L,) + tuple(batch))
        return jnp.stack([c0, jnp.zeros_like(c0)])


def _lazy_ops(ops: CurveOps, p, p2, one):
    spec = ops.f.spec
    if len(ops.f.coeff_shape) == 1:
        return _LazyFieldOps(spec, p, p2, one)
    return _LazyFq2Ops(spec, p, p2, one)


# ---------------------------------------------------------------------------
# K2: invert the block roots (parallel Fermat; Fq2 via conj/norm)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 2))
def ba_invert_roots(ops: CurveOps, roots, interpret: bool = False):
    """roots (C, nb) -> inverses (C, nb), lazy representation."""
    spec = ops.f.spec
    C = _C(ops)
    nb = roots.shape[-1]
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))
    ebits = limbs.exp_bits_host(spec.p - 2)  # MSB first
    nbits = len(ebits)
    bits = jnp.asarray(ebits.reshape(1, nbits))  # (1, nbits) in SMEM

    def kernel(bits_ref, p_ref, one_ref, r_ref, o_ref):
        p = p_ref[:]
        spec_ = spec

        def fq_pow(base):
            def body(i, acc):
                b = bits_ref[0, i]
                acc = limbs.mont_mul_kernel(spec_, acc, acc, p)
                am = limbs.mont_mul_kernel(spec_, acc, base, p)
                return jnp.where(b != 0, am, acc)

            acc0 = jnp.broadcast_to(
                one_ref[:].reshape((spec_.L, 1)), base.shape
            )
            return jax.lax.fori_loop(0, nbits, body, acc0)

        if len(ops.f.coeff_shape) == 1:
            o_ref[:] = fq_pow(r_ref[:])
        else:
            # Fq2: x^-1 = conj(x) / norm(x), norm = a0^2 + a1^2 in Fq
            x = r_ref[:].reshape((2, spec_.L, nb))
            a0, a1 = x[0], x[1]
            n0 = limbs.mont_mul_kernel(spec_, a0, a0, p)
            n1 = limbs.mont_mul_kernel(spec_, a1, a1, p)
            norm = limbs.add_kernel(spec_, n0, n1, p)
            ninv = fq_pow(norm)
            c0 = limbs.mont_mul_kernel(spec_, a0, ninv, p)
            c1m = limbs.mont_mul_kernel(spec_, a1, ninv, p)
            c1 = limbs.sub_kernel(spec_, jnp.zeros_like(c1m), c1m, p)
            o_ref[:] = jnp.concatenate([c0, c1], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, nb), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((spec.L, 1), lambda i, b: (0, 0)),
                pl.BlockSpec((spec.L, 1), lambda i, b: (0, 0)),
                pl.BlockSpec((C, nb), lambda i, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, nb), lambda i, b: (0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(bits, p_arr, one_arr, roots)


# ---------------------------------------------------------------------------
# K2c: lazy elementwise Montgomery multiply (semi_inv = allbut * root_inv)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 3))
def mul_lazy(ops: CurveOps, a, b, interpret: bool = False):
    """Elementwise lazy Montgomery multiply, (C, M) coefficient slabs."""
    spec = ops.f.spec
    C, M = a.shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))

    T = min(M, TILE)
    assert M % T == 0
    grid = (M // T,)

    def kernel(p_ref, p2_ref, a_ref, b_ref, o_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], None)
        cs = ops.f.coeff_shape
        r = f.mul(
            a_ref[:].reshape(cs + (T,)), b_ref[:].reshape(cs + (T,))
        )
        o_ref[:] = r.reshape(C, T)

    p2_arr = jnp.asarray(_raw_limbs(spec, 2 * spec.p))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, M), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((C, T), lambda i: (0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, a, b)


# ---------------------------------------------------------------------------
# jnp twin (CPU tests): same semantics via limbs.batch_inv
# ---------------------------------------------------------------------------


def _field_inv(f, x):
    """Single-element field inverse (Fermat; Fq2 via conj/norm)."""
    spec = f.spec
    if len(f.coeff_shape) == 1:
        return limbs.inv_r(spec, x)
    n0 = limbs.mont_mul_r(spec, x[0], x[0])
    n1 = limbs.mont_mul_r(spec, x[1], x[1])
    ninv = limbs.inv_r(spec, limbs.add_r(spec, n0, n1))
    c0 = limbs.mont_mul_r(spec, x[0], ninv)
    c1 = limbs.neg_r(spec, limbs.mont_mul_r(spec, x[1], ninv))
    return jnp.stack([c0, c1])


def tree_batch_inv(f, den):
    """Batch inversion via a fold-in-half product tree: ~3 muls/lane +
    one Fermat at the root. O(log W) traced muls (associative-scan-free:
    its per-level retracing is what makes batch_inv_r untraceable at
    MSM widths). den must have power-of-two width and no zeros."""
    levels = []
    cur = den
    while cur.shape[-1] > 1:
        w = cur.shape[-1] // 2
        levels.append(cur)
        cur = f.mul(cur[..., :w], cur[..., w:])
    inv_cur = _field_inv(f, cur)
    for child in reversed(levels):
        w = child.shape[-1] // 2
        inv_l = f.mul(inv_cur, child[..., w:])
        inv_r = f.mul(inv_cur, child[..., :w])
        inv_cur = jnp.concatenate([inv_l, inv_r], axis=child.ndim - 1)
    return inv_cur
