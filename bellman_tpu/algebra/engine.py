"""Engine protocol: the pairing-engine abstraction the proving system is
generic over (the reference is generic over pairing::Engine /
MultiMillerLoop — SURVEY.md L0).

Two engines ship:

* ``DummyEngine`` — the F_64513 mock engine
  (/root/reference/groth16/src/tests/dummy_engine.rs): G1 = G2 = Gt = Fr
  and pairing(a, b) = a*b with *additive* Gt. It reduces the whole Groth16
  protocol to integer arithmetic small enough to check by hand, enabling
  the known-answer tests that pin every CRS element and the exact proof.
* ``Bls12_381Engine`` — the real curve, host arithmetic from
  ``bellman_tpu.algebra.bls12_381``.

Device kernels register per-engine backends in ``bellman_tpu.ops``.
"""

from __future__ import annotations

from .field import prime_field
from . import bls12_381 as bls

# ---------------------------------------------------------------------------
# DummyEngine: F_64513 = 63 * 2^10 + 1, generator 5
# ---------------------------------------------------------------------------

FrD = prime_field(64513, "FrD", generator=5, repr_bytes=8)
assert FrD.S == 10
assert int(FrD.ROOT_OF_UNITY) == 57751  # dummy_engine.rs:318
assert FrD.NUM_BITS == 16 and FrD.CAPACITY == 15


class DummyG:
    """Additive group wrapper over FrD acting as G1=G2 of the dummy engine.

    Presents the same interface as CurvePoint (identity/generator/add/
    mul_int) so proving-system code is engine-generic.
    """

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v if isinstance(v, FrD) else FrD(v)

    @classmethod
    def identity(cls):
        return cls(0)

    @classmethod
    def generator(cls):
        return cls(1)

    def is_identity(self):
        return self.v.is_zero()

    def __add__(self, o):
        return DummyG(self.v + o.v)

    def __sub__(self, o):
        return DummyG(self.v - o.v)

    def __neg__(self):
        return DummyG(-self.v)

    def mul_int(self, k: int):
        return DummyG(self.v * FrD(k))

    def __mul__(self, scalar):
        return self.mul_int(int(scalar))

    __rmul__ = __mul__

    def double(self):
        return DummyG(self.v.double())

    def __eq__(self, o):
        return isinstance(o, DummyG) and self.v == o.v

    def __hash__(self):
        return hash(("DummyG", self.v.value))

    def __repr__(self):
        return f"DummyG({self.v.value})"

    # wire format: u64 LE (dummy_engine.rs FrRepr)
    def to_uncompressed(self):
        return self.v.value.to_bytes(8, "little")

    to_compressed = to_uncompressed
    COMPRESSED_SIZE = 8
    UNCOMPRESSED_SIZE = 8

    @classmethod
    def from_uncompressed(cls, data, checked=True):
        v = int.from_bytes(data, "little")
        if v >= 64513:
            raise ValueError("not in field")
        return cls(v)

    from_compressed = from_uncompressed


class _DummyMillerResult:
    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __add__(self, o):
        return _DummyMillerResult(self.v + o.v)

    def final_exponentiation(self):
        return self.v


class DummyEngine:
    name = "dummy"
    Fr = FrD
    G1 = DummyG
    G2 = DummyG

    @staticmethod
    def gt_one():
        return FrD.zero()  # Gt is additive: identity is 0

    gt_identity = gt_one

    @staticmethod
    def miller_loop(p: DummyG, q: DummyG):
        return _DummyMillerResult(p.v * q.v)

    @staticmethod
    def multi_miller_loop(pairs):
        acc = FrD.zero()
        for p, q in pairs:
            acc = acc + p.v * q.v
        return _DummyMillerResult(acc)

    @staticmethod
    def pairing(p, q):
        return p.v * q.v


class Bls12_381Engine:
    name = "bls12_381"
    Fr = bls.Fr
    G1 = bls.G1Affine
    G2 = bls.G2Affine

    @staticmethod
    def gt_one():
        return bls.Fq12.one()

    gt_identity = gt_one

    @staticmethod
    def miller_loop(p, q):
        return bls.MillerLoopResult(bls.miller_loop(p, q))

    @staticmethod
    def multi_miller_loop(pairs):
        return bls.multi_miller_loop(pairs)

    @staticmethod
    def pairing(p, q):
        return bls.pairing(p, q)
