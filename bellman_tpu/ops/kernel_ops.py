"""Kernel-side field/curve ops for Pallas MSM kernels.

Facades over the static-loop limb ops (ops/limbs.py *_kernel variants)
with EXPLICIT modulus/one operands: Pallas kernels cannot capture large
array constants, so the modulus and Montgomery one ride in as refs and
these classes thread them through every op. Shared by the fold
(ops/pallas_fold.py, ops/pallas_afold.py), batch-affine
(ops/pallas_affine.py) kernel families.

The reference gets its in-kernel field arithmetic from the `ff` crate's
generated code (/root/reference/Cargo.toml:26); here the kernel ISA is
Mosaic vector ops over u32 limb rows, and the "traits" are these
facades.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

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
