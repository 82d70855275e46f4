"""Host-side EvaluationDomain: radix-2 polynomial domains for the QAP.

Behavioral equivalent of /root/reference/src/domain.rs:21-189 (padding to
2^exp with a 2^S cap, fft/ifft, coset shifts via distribute_powers with the
field's multiplicative generator, the vanishing polynomial z(tau) = tau^m-1,
coset division by z, and pointwise mul/sub). Generic over the element kind
the same way the reference's Group trait is (:192-197): works on field
scalars or on curve points, anything with group_add/group_sub and
scalar-multiplication hooks.

This host version is the oracle; the TPU path lives in
``bellman_tpu.ops.fft`` (vectorized limb arithmetic, shard_map all-to-all
for the distributed stages) and is cross-checked against this module.
"""

from __future__ import annotations

from .r1cs import PolynomialDegreeTooLarge


class EvaluationDomain:
    """coeffs: list of elements; ops: a _GroupOps adapter for the element
    type; field: the scalar field class (host)."""

    def __init__(self, coeffs, ops, field, exp):
        self.coeffs = coeffs
        self.ops = ops
        self.field = field
        self.exp = exp
        # omega: 2^exp primitive root of unity
        omega = field.ROOT_OF_UNITY
        for _ in range(exp, field.S):
            omega = omega.square()
        self.omega = omega
        self.omegainv = omega.invert()
        self.geninv = field.GENERATOR.invert()
        self.minv = field.from_int(len(coeffs)).invert()

    @classmethod
    def from_coeffs(cls, coeffs, ops, field):
        m, exp = 1, 0
        while m < len(coeffs):
            m *= 2
            exp += 1
            if exp >= field.S:
                raise PolynomialDegreeTooLarge(
                    f"domain 2^{exp} exceeds field 2-adicity {field.S}"
                )
        coeffs = list(coeffs) + [ops.zero() for _ in range(m - len(coeffs))]
        return cls(coeffs, ops, field, exp)

    def __len__(self):
        return len(self.coeffs)

    def into_coeffs(self):
        return self.coeffs

    # -- FFT ----------------------------------------------------------------
    def _fft_in_place(self, omega):
        """Iterative bit-reversed Cooley-Tukey (serial_fft behavior,
        /root/reference/src/domain.rs:272-314)."""
        a = self.coeffs
        n = len(a)
        log_n = self.exp
        for k in range(n):
            rk = _bitreverse(k, log_n)
            if k < rk:
                a[k], a[rk] = a[rk], a[k]
        m = 1
        for _ in range(log_n):
            w_m = omega ** (n // (2 * m))
            k = 0
            while k < n:
                w = self.field.one()
                for j in range(m):
                    t = self.ops.mul(a[k + j + m], w)
                    a[k + j + m] = self.ops.sub(a[k + j], t)
                    a[k + j] = self.ops.add(a[k + j], t)
                    w = w * w_m
                k += 2 * m
            m *= 2

    def fft(self):
        self._fft_in_place(self.omega)

    def ifft(self):
        self._fft_in_place(self.omegainv)
        minv = self.minv
        self.coeffs = [self.ops.mul(v, minv) for v in self.coeffs]

    def distribute_powers(self, g):
        u = self.field.one()
        out = []
        for v in self.coeffs:
            out.append(self.ops.mul(v, u))
            u = u * g
        self.coeffs = out

    def coset_fft(self):
        self.distribute_powers(self.field.GENERATOR)
        self.fft()

    def icoset_fft(self):
        self.ifft()
        self.distribute_powers(self.geninv)

    # -- domain arithmetic ---------------------------------------------------
    def z(self, tau):
        """Vanishing polynomial t(tau) = tau^m - 1."""
        return tau ** len(self.coeffs) - self.field.one()

    def divide_by_z_on_coset(self):
        i = self.z(self.field.GENERATOR).invert()
        self.coeffs = [self.ops.mul(v, i) for v in self.coeffs]

    def mul_assign(self, other: "EvaluationDomain"):
        """Pointwise multiply by a *scalar* domain."""
        assert len(self.coeffs) == len(other.coeffs)
        self.coeffs = [
            self.ops.mul(a, b) for a, b in zip(self.coeffs, other.coeffs)
        ]

    def sub_assign(self, other: "EvaluationDomain"):
        assert len(self.coeffs) == len(other.coeffs)
        self.coeffs = [
            self.ops.sub(a, b) for a, b in zip(self.coeffs, other.coeffs)
        ]


def _bitreverse(n: int, l: int) -> int:
    r = 0
    for _ in range(l):
        r = (r << 1) | (n & 1)
        n >>= 1
    return r


class ScalarOps:
    """Group ops for field-scalar domains (reference Scalar<S>,
    /root/reference/src/domain.rs:230-259)."""

    def __init__(self, field):
        self.field = field

    def zero(self):
        return self.field.zero()

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, scalar):
        return a * scalar


class PointOps:
    """Group ops for curve-point domains (reference Point<G>,
    /root/reference/src/domain.rs:199-228); scalar mul is
    point-by-field-element."""

    def __init__(self, point_cls):
        self.point_cls = point_cls

    def zero(self):
        return self.point_cls.identity()

    def add(self, a, b):
        return a + b

    def sub(self, a, b):
        return a - b

    def mul(self, a, scalar):
        return a.mul_int(int(scalar))
