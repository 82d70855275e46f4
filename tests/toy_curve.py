"""Tiny short-Weierstrass curve for kernel parity tests.

The Pallas point kernels (ops/pallas_fold.py, ops/pallas_affine.py,
ops/pallas_afold.py) are generic over the limb spec and curve ops; their
interpret-mode parity tests only exercise layouts, masks, rolls and the
case analysis — none of which depend on the field size. Running them on
BLS12-381 Fq (w=13, L=32) traces ~10^3 u32 ops per field multiply into
the kernel jaxpr, which makes interpret mode take >10 minutes per test
on XLA-CPU. This toy curve (y^2 = x^3 + 5 over a 49-bit prime, w=13,
L=4 conv limbs) shrinks the jaxprs ~64x so the same kernel code paths
run in seconds. Fq-width parity is still covered by the jnp-mode MSM
tests and the on-chip bench/drive paths.
"""

from __future__ import annotations

import functools

from bellman_tpu.ops import curve as curve_mod
from bellman_tpu.ops import limbs

# 49-bit prime, p % 4 == 3 (easy sqrt), fits w=13 x L=4 conv limbs
TOY_P = (1 << 49) - 81
assert TOY_P % 4 == 3
TOY_B = 5


@functools.lru_cache(maxsize=None)
def toy_spec() -> limbs.FieldSpec:
    s = limbs.FieldSpec("toy_fq", TOY_P, w=13, nlimbs=4)
    assert s.conv_ok
    return s


@functools.lru_cache(maxsize=None)
def toy_ops() -> curve_mod.CurveOps:
    return curve_mod.CurveOps(limbs.FieldOps(toy_spec()))


class ToyFq:
    """Minimal host field element (mirrors algebra.bls12_381.Fq shape)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = int(v) % TOY_P

    def __add__(self, o):
        return ToyFq(self.v + o.v)

    def __sub__(self, o):
        return ToyFq(self.v - o.v)

    def __mul__(self, o):
        return ToyFq(self.v * o.v)

    def __neg__(self):
        return ToyFq(-self.v)

    def __eq__(self, o):
        return self.v == o.v

    def __int__(self):
        return self.v

    def __hash__(self):
        return hash(self.v)

    def square(self):
        return ToyFq(self.v * self.v)

    def invert(self):
        return ToyFq(pow(self.v, TOY_P - 2, TOY_P))

    def is_zero(self):
        return self.v == 0

    def sqrt(self):
        r = pow(self.v, (TOY_P + 1) // 4, TOY_P)
        return ToyFq(r) if (r * r) % TOY_P == self.v else None


class ToyPoint:
    """Affine point on y^2 = x^3 + TOY_B (identity = (None, None)),
    with the subset of the host G1Affine API the kernel tests use."""

    FIELD = ToyFq
    __slots__ = ("x", "y")

    def __init__(self, x=None, y=None):
        self.x = x
        self.y = y

    @classmethod
    def identity(cls):
        return cls()

    def is_identity(self):
        return self.x is None

    @classmethod
    def generator(cls):
        x = 1
        while True:
            rhs = ToyFq(x * x * x + TOY_B)
            y = rhs.sqrt()
            if y is not None and y.v != 0:
                return cls(ToyFq(x), y)
            x += 1

    def __neg__(self):
        if self.is_identity():
            return self
        return ToyPoint(self.x, -self.y)

    def __eq__(self, o):
        return self.x == o.x and self.y == o.y \
            if not (self.is_identity() or o.is_identity()) \
            else self.is_identity() == o.is_identity()

    def __add__(self, o):
        if self.is_identity():
            return o
        if o.is_identity():
            return self
        if self.x == o.x:
            if self.y == -o.y:
                return ToyPoint()
            lam = (self.x.square() * ToyFq(3)) * (self.y + self.y).invert()
        else:
            lam = (o.y - self.y) * (o.x - self.x).invert()
        x3 = lam.square() - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return ToyPoint(x3, y3)

    def double(self):
        return self + self

    def mul_int(self, k: int):
        acc = ToyPoint()
        add = self
        while k:
            if k & 1:
                acc = acc + add
            add = add + add
            k >>= 1
        return acc


def rand_toy(rng, n):
    g = ToyPoint.generator()
    return [g.mul_int(rng.randrange(1, TOY_P)) for _ in range(n)]
