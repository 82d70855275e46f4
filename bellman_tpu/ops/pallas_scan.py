"""Pallas TPU kernels for the MSM bucket pipeline's scans.

The jnp chunked scan (ops.scan) executes K sequential while-loop steps
per level, and each Jacobian-add combine is itself ~50 nested while
iterations of scan-based CIOS — on TPU the launch overhead of those tiny
steps dominates MSM runtime (PERF.md). Mosaic, unlike XLA, compiles the
FLAT (fully unrolled) limb arithmetic quickly, so these kernels run the
combine as straight-line vector code:

* ``_scan_level``: inclusive (segmented) scan within chunks. Grid steps
  iterate sequentially along the K axis; a VMEM scratch carries the
  running prefix across steps (the classic sequential-grid accumulator).
  Elements are (3C+1, G) tiles: 3C point-coordinate rows + a segment-
  flag row, chunks on lanes.
* ``_fold_level``: grid-parallel combine folding exclusive chunk
  prefixes into the intra-chunk prefixes.

``seg_scan`` recurses over chunk totals with the same kernels until one
element remains — every level is Mosaic-compiled; XLA never sees a flat
limb graph. Enabled on TPU backends (ops.pallas_kernels.enabled()); the
jnp chunked scan stays the CPU/test reference. A plain (unsegmented)
scan is the flags=0 special case, so the bucket suffix pass reuses it
with a flip.
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


# ---------------------------------------------------------------------------
# Kernel-side field/curve ops (explicit modulus; static loops only)
# ---------------------------------------------------------------------------


class _KernelFieldOps:
    """FieldOps facade over the static-loop limb ops with explicit
    modulus/one values (Pallas cannot capture large array constants)."""

    def __init__(self, spec, p, one):
        self.spec = spec
        self.p = p
        self.one_arr = one  # (L, 1) Montgomery one
        self.coeff_shape = (spec.L,)

    def add(self, a, b):
        return limbs.add_kernel(self.spec, a, b, self.p)

    def sub(self, a, b):
        return limbs.sub_kernel(self.spec, a, b, self.p)

    def neg(self, a):
        return limbs.neg_kernel(self.spec, a, self.p)

    def mul(self, a, b):
        return limbs.mont_mul_kernel(self.spec, a, b, self.p)

    def sqr(self, a):
        return limbs.mont_mul_kernel(self.spec, a, a, self.p)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=0)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def zeros(self, batch):
        return jnp.zeros(self.coeff_shape + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        one = self.one_arr.reshape(self.coeff_shape + (1,) * len(batch))
        return jnp.broadcast_to(one, self.coeff_shape + tuple(batch))


class _KernelFq2Ops(_KernelFieldOps):
    def __init__(self, spec, p, one):
        super().__init__(spec, p, one)
        self.coeff_shape = (2, spec.L)

    def add(self, a, b):
        s, p = self.spec, self.p
        return jnp.stack(
            [limbs.add_kernel(s, a[0], b[0], p),
             limbs.add_kernel(s, a[1], b[1], p)]
        )

    def sub(self, a, b):
        s, p = self.spec, self.p
        return jnp.stack(
            [limbs.sub_kernel(s, a[0], b[0], p),
             limbs.sub_kernel(s, a[1], b[1], p)]
        )

    def neg(self, a):
        s, p = self.spec, self.p
        return jnp.stack(
            [limbs.neg_kernel(s, a[0], p), limbs.neg_kernel(s, a[1], p)]
        )

    def mul(self, a, b):
        s, p = self.spec, self.p
        t0 = limbs.mont_mul_kernel(s, a[0], b[0], p)
        t1 = limbs.mont_mul_kernel(s, a[1], b[1], p)
        t2 = limbs.mont_mul_kernel(
            s, limbs.add_kernel(s, a[0], a[1], p),
            limbs.add_kernel(s, b[0], b[1], p), p,
        )
        c0 = limbs.sub_kernel(s, t0, t1, p)
        c1 = limbs.sub_kernel(s, limbs.sub_kernel(s, t2, t0, p), t1, p)
        return jnp.stack([c0, c1])

    def sqr(self, a):
        s, p = self.spec, self.p
        t0 = limbs.mont_mul_kernel(
            s, limbs.add_kernel(s, a[0], a[1], p),
            limbs.sub_kernel(s, a[0], a[1], p), p,
        )
        t1 = limbs.mont_mul_kernel(s, a[0], a[1], p)
        return jnp.stack([t0, limbs.add_kernel(s, t1, t1, p)])

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def zeros(self, batch):
        return jnp.zeros((2, self.spec.L) + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        s = self.spec
        c0 = self.one_arr.reshape((s.L,) + (1,) * len(batch))
        c0 = jnp.broadcast_to(c0, (s.L,) + tuple(batch))
        return jnp.stack([c0, jnp.zeros_like(c0)])


class _KernelCurveOps(CurveOps):
    """CurveOps whose batched-mul helpers run unbatched: the lane-axis
    concat+slice pattern trips Mosaic's layout inference, and inside a
    kernel there is no XLA graph to shrink anyway."""

    def _mul_many(self, xs, ys):
        return [self.f.mul(x, y) for x, y in zip(xs, ys)]

    def _sqr_many(self, xs):
        return [self.f.sqr(x) for x in xs]

    def _add_many(self, xs, ys):
        return [self.f.add(x, y) for x, y in zip(xs, ys)]

    def _sub_many(self, xs, ys):
        return [self.f.sub(x, y) for x, y in zip(xs, ys)]


def _kernel_curve_ops(ops: CurveOps, p, one) -> CurveOps:
    spec = ops.f.spec
    if len(ops.f.coeff_shape) == 1:
        return _KernelCurveOps(_KernelFieldOps(spec, p, one))
    return _KernelCurveOps(_KernelFq2Ops(spec, p, one))


def _C(ops: CurveOps) -> int:
    return int(np.prod(ops.f.coeff_shape))


def _unpack_rows(ops: CurveOps, a):
    C = _C(ops)
    cs = ops.f.coeff_shape + (a.shape[-1],)
    return (
        a[:C].reshape(cs),
        a[C : 2 * C].reshape(cs),
        a[2 * C :].reshape(cs),
    )


def _pack_rows(ops: CurveOps, p):
    C = _C(ops)
    n = p[0].shape[-1]
    return jnp.concatenate([c.reshape(C, n) for c in p], axis=0)


def _combine_rows(kops: CurveOps, C3: int, a, b):
    """Segmented combine on (R_pad, G) tiles: row C3 is the flag; rows
    beyond C3+1 are alignment padding (passed through)."""
    pa, fa = a[:C3], a[C3 : C3 + 1]
    pb, fb = b[:C3], b[C3 : C3 + 1]
    merged = _pack_rows(
        kops, kops.add(_unpack_rows(kops, pa), _unpack_rows(kops, pb))
    )
    out = jnp.where(fb.astype(bool), pb, merged)
    return jnp.concatenate([out, fa | fb, b[C3 + 1 :]], axis=0)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 4))
def _scan_level(ops: CurveOps, K: int, R: int, x2, interpret: bool = False):
    """x2: (K*R, G) — K row-blocks of R rows; inclusive scan along K."""
    G = x2.shape[-1]
    spec = ops.f.spec
    C3 = 3 * _C(ops)
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))

    def kernel(p_ref, one_ref, x_ref, o_ref, carry_ref):
        k = pl.program_id(0)
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        xk = x_ref[:]

        @pl.when(k == 0)
        def _():
            carry_ref[:] = xk

        @pl.when(k != 0)
        def _():
            carry_ref[:] = _combine_rows(kops, C3, carry_ref[:], xk)

        o_ref[:] = carry_ref[:]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K * R, G), jnp.uint32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((R, G), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((R, G), lambda k: (k, 0)),
        scratch_shapes=[pltpu.VMEM((R, G), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, x2)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _fold_level(ops: CurveOps, K: int, R: int, prev, intra2,
                interpret: bool = False):
    """prev: (R, G) exclusive chunk prefixes; intra2: (K*R, G)."""
    G = intra2.shape[-1]
    spec = ops.f.spec
    C3 = 3 * _C(ops)
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))

    def kernel(p_ref, one_ref, prev_ref, x_ref, o_ref):
        kops = _kernel_curve_ops(ops, p_ref[:], one_ref[:])
        o_ref[:] = _combine_rows(kops, C3, prev_ref[:], x_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K * R, G), jnp.uint32),
        grid=(K,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda k: (0, 0)),
            pl.BlockSpec((R, G), lambda k: (0, 0)),
            pl.BlockSpec((R, G), lambda k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((R, G), lambda k: (k, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, one_arr, prev, intra2)


# ---------------------------------------------------------------------------
# Orchestration
# ---------------------------------------------------------------------------

MAX_K = 512  # sequential grid steps per level

FORCE_INTERPRET = False  # tests set this to exercise kernels on CPU


def seg_scan(ops: CurveOps, packed, flags, interpret: bool = False):
    """Inclusive segmented scan along the last axis, all levels Pallas.

    packed: (3C, n); flags: (1, n) uint32 (all-zero => plain scan).
    Returns (3C, n)."""
    interpret = interpret or FORCE_INTERPRET
    R3 = packed.shape[0]
    # rows padded to a sublane-aligned count (Mosaic rejects unaligned
    # offsets); row R3 is the flag, the rest are zero padding
    R = -(-(R3 + 1) // 8) * 8
    pad_rows = R - R3 - 1
    n = packed.shape[-1]
    x = jnp.concatenate(
        [packed, flags, jnp.zeros((pad_rows, n), jnp.uint32)], axis=0
    )
    inf_elem = jnp.concatenate(
        [
            _pack_rows(ops, ops.infinity((1,))),
            jnp.zeros((pad_rows + 1, 1), jnp.uint32),
        ],
        axis=0,
    )

    def level(x):  # (R, m) -> (R, m)
        m = x.shape[-1]
        if m == 1:
            return x
        # K sequential steps of G = m/K lanes. Verified sweet spot for
        # the axon remote compiler; wider-G tilings run faster but
        # compile 10x slower (see PERF.md).
        K = m if m <= MAX_K else MAX_K
        pad = (-m) % K
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(inf_elem, (R, pad))], axis=-1
            )
        m2 = m + pad
        G = m2 // K
        # (R, G, K) -> (K, R, G) -> (K*R, G) row-blocks
        xk = jnp.moveaxis(x.reshape(R, G, K), -1, 0).reshape(K * R, G)
        intra2 = _scan_level(ops, K, R, xk, interpret)
        intra = intra2.reshape(K, R, G)
        if G == 1:
            out = jnp.moveaxis(intra, 0, -1).reshape(R, m2)
            return out[:, :m]
        totals = intra[-1]  # (R, G)
        tot_scan = level(totals)
        prev = jnp.concatenate(
            [jnp.broadcast_to(inf_elem, (R, 1)), tot_scan[:, :-1]], axis=-1
        )
        folded2 = _fold_level(ops, K, R, prev, intra2, interpret)
        out = jnp.moveaxis(folded2.reshape(K, R, G), 0, -1).reshape(R, m2)
        return out[:, :m]

    return level(x)[:R3]


def plain_scan(ops: CurveOps, packed, reverse: bool = False,
               interpret: bool = False):
    """Unsegmented point-add scan (flags = 0), optional suffix direction."""
    if reverse:
        out = plain_scan(ops, jnp.flip(packed, axis=-1), interpret=interpret)
        return jnp.flip(out, axis=-1)
    flags = jnp.zeros((1, packed.shape[-1]), jnp.uint32)
    return seg_scan(ops, packed, flags, interpret=interpret)
