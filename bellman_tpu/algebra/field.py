"""Host-side prime-field arithmetic (arbitrary precision Python ints).

This is the *reference* arithmetic layer: slow, obviously-correct, used by
the host Groth16 oracle implementation, the gadget library (witness
computation), and as the golden model that every device (JAX/Pallas) kernel
is cross-checked against.

Mirrors the capability surface of the `ff::PrimeField` /
`ff::PrimeFieldBits` traits the reference library is generic over
(see /root/reference/Cargo.toml:26-27 and SURVEY.md L0): modulus, NUM_BITS,
CAPACITY, 2-adicity S, multiplicative generator, 2^S root of unity,
to/from canonical little-endian byte repr, and LE bit views.

The design is TPU-first overall: host fields exist only for synthesis,
verification, and as oracles; all hot-path arithmetic lives in
``bellman_tpu.ops`` as fixed-limb vector kernels.
"""

from __future__ import annotations

import hashlib


class FieldElement:
    """Element of a prime field; subclasses define MODULUS and friends.

    Instances are immutable; ``value`` is the canonical representative in
    ``[0, MODULUS)``.
    """

    __slots__ = ("value",)

    # -- class-level constants, filled in by prime_field() ------------------
    MODULUS: int = 0
    NUM_BITS: int = 0
    CAPACITY: int = 0          # NUM_BITS - 1
    S: int = 0                 # 2-adicity: MODULUS - 1 = 2^S * t with t odd
    GENERATOR: "FieldElement"  # multiplicative generator of the field
    ROOT_OF_UNITY: "FieldElement"  # 2^S-th primitive root of unity
    REPR_BYTES: int = 0        # byte length of the canonical LE repr

    def __init__(self, value: int):
        self.value = value % self.MODULUS

    # -- constructors -------------------------------------------------------
    @classmethod
    def zero(cls):
        return cls(0)

    @classmethod
    def one(cls):
        return cls(1)

    @classmethod
    def from_int(cls, v: int):
        return cls(v)

    @classmethod
    def from_repr(cls, data: bytes):
        """Parse canonical little-endian repr; None if >= MODULUS."""
        if len(data) != cls.REPR_BYTES:
            raise ValueError(f"expected {cls.REPR_BYTES} bytes")
        v = int.from_bytes(data, "little")
        if v >= cls.MODULUS:
            return None
        return cls(v)

    @classmethod
    def random(cls, rng):
        """Uniform random element; rng must have randrange()."""
        return cls(rng.randrange(cls.MODULUS))

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, other):
        return type(self)(self.value + other.value)

    def __sub__(self, other):
        return type(self)(self.value - other.value)

    def __neg__(self):
        return type(self)(-self.value)

    def __mul__(self, other):
        if isinstance(other, int):
            return type(self)(self.value * other)
        return type(self)(self.value * other.value)

    __rmul__ = __mul__

    def square(self):
        return type(self)(self.value * self.value)

    def double(self):
        return type(self)(self.value << 1)

    def invert(self):
        """Multiplicative inverse; None for zero (mirrors ff's CtOption)."""
        if self.value == 0:
            return None
        return type(self)(pow(self.value, -1, self.MODULUS))

    def __pow__(self, e: int):
        return type(self)(pow(self.value, e, self.MODULUS))

    def pow_vartime(self, e: int):
        return self.__pow__(e)

    def sqrt(self):
        """Square root via Tonelli-Shanks; None if non-residue."""
        p = self.MODULUS
        if self.value == 0:
            return type(self)(0)
        if pow(self.value, (p - 1) // 2, p) != 1:
            return None
        if p % 4 == 3:
            return type(self)(pow(self.value, (p + 1) // 4, p))
        # Tonelli-Shanks for p = 1 mod 4
        s, t = 0, p - 1
        while t % 2 == 0:
            s += 1
            t //= 2
        z = self.GENERATOR.value  # a known non-residue
        m = s
        c = pow(z, t, p)
        u = pow(self.value, t, p)
        r = pow(self.value, (t + 1) // 2, p)
        while u != 1:
            # find least i with u^(2^i) == 1
            i, u2 = 0, u
            while u2 != 1:
                u2 = u2 * u2 % p
                i += 1
            b = pow(c, 1 << (m - i - 1), p)
            m = i
            c = b * b % p
            u = u * c % p
            r = r * b % p
        return type(self)(r)

    # -- predicates / conversions ------------------------------------------
    def is_zero(self) -> bool:
        return self.value == 0

    def to_repr(self) -> bytes:
        """Canonical little-endian byte repr (ff::PrimeField::to_repr)."""
        return self.value.to_bytes(self.REPR_BYTES, "little")

    def to_le_bits(self):
        """LE bit view (ff::PrimeFieldBits::to_le_bits); NUM_BITS entries."""
        v = self.value
        return [(v >> i) & 1 for i in range(self.NUM_BITS)]

    def __int__(self):
        return self.value

    def __eq__(self, other):
        return type(self) is type(other) and self.value == other.value

    def __hash__(self):
        return hash((type(self).__name__, self.value))

    def __repr__(self):
        return f"{type(self).__name__}(0x{self.value:x})"


def _two_adicity(p: int):
    s, t = 0, p - 1
    while t % 2 == 0:
        s += 1
        t //= 2
    return s, t


def _find_generator(p: int) -> int:
    """Smallest multiplicative generator of F_p (matches ff derive logic)."""
    # factor p-1 (moduli here are small or have known structure; generic
    # trial division is only used for small test fields)
    n = p - 1
    factors = set()
    d = 2
    m = n
    while d * d <= m:
        if m % d == 0:
            factors.add(d)
            while m % d == 0:
                m //= d
        d += 1
    if m > 1:
        factors.add(m)
    g = 2
    while True:
        if all(pow(g, n // f, p) != 1 for f in factors):
            return g
        g += 1


def prime_field(modulus: int, name: str, generator: int | None = None,
                repr_bytes: int | None = None):
    """Create a prime-field class for the given modulus.

    ``generator`` may be supplied when known (e.g. 7 for BLS12-381 Fr,
    5 for the F_64513 test field — /root/reference/groth16/src/tests/
    dummy_engine.rs:294-321) to avoid factoring p-1.
    """
    s, t = _two_adicity(modulus)
    num_bits = modulus.bit_length()
    if generator is None:
        generator = _find_generator(modulus)
    if repr_bytes is None:
        repr_bytes = (num_bits + 7) // 8

    cls = type(name, (FieldElement,), {"__slots__": ()})
    cls.MODULUS = modulus
    cls.NUM_BITS = num_bits
    cls.CAPACITY = num_bits - 1
    cls.S = s
    cls.REPR_BYTES = repr_bytes
    cls.GENERATOR = cls(generator)
    cls.ROOT_OF_UNITY = cls(pow(generator, t, modulus))
    return cls


def blake2s_personal(personal: bytes, data: bytes) -> bytes:
    """blake2s with 8-byte personalization (stdlib hashlib)."""
    h = hashlib.blake2s(person=personal)
    h.update(data)
    return h.digest()
