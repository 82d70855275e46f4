"""Host-side BLS12-381: field tower, G1/G2, pairing, zkcrypto-compatible
serialization.

The reference library is generic over the ``ff``/``group``/``pairing``
trait ecosystem and uses the external ``bls12_381`` crate as its concrete
curve (/root/reference/Cargo.toml:40, README.md:7-10). This module is the
from-scratch host implementation of that curve layer: it provides the
canonical (slow, obviously correct) arithmetic used by the verifier, the
serializers, and as the oracle for every device kernel.

Byte formats match the zkcrypto encodings exactly (compressed G1 = 48 B,
compressed G2 = 96 B, uncompressed = 2x) so that proofs/keys are
byte-identical to the reference's (checked against the pinned sizes in
/root/reference/groth16/src/lib.rs:529,559).

The pairing is implemented the "generic" way — untwist G2 into E(Fq12) and
run an affine Miller loop with ordinary line functions — rather than with
hand-memorized coefficient-form step formulas; correctness is established
by bilinearity/non-degeneracy tests and the Groth16 end-to-end round trip.
"""

from __future__ import annotations

from .field import prime_field

# ---------------------------------------------------------------------------
# Base field / scalar field
# ---------------------------------------------------------------------------

P = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001

# BLS parameter x (the curve is parameterized by x = -0xd201000000010000)
BLS_X = 0xD201000000010000
BLS_X_IS_NEGATIVE = True

Fq = prime_field(P, "Fq", generator=2, repr_bytes=48)
# Fr: 2-adicity S=32, multiplicative generator 7 (matches ff's constants for
# the bls12_381 crate's Scalar).
Fr = prime_field(R, "Fr", generator=7, repr_bytes=32)

assert Fr.S == 32 and Fr.NUM_BITS == 255 and Fr.CAPACITY == 254


def _fq_lex_largest(y: "Fq") -> bool:
    return y.value > (P - 1) // 2


# ---------------------------------------------------------------------------
# Fq2 = Fq[u] / (u^2 + 1)
# ---------------------------------------------------------------------------


class Fq2:
    __slots__ = ("c0", "c1")

    def __init__(self, c0, c1):
        self.c0 = c0 if isinstance(c0, Fq) else Fq(c0)
        self.c1 = c1 if isinstance(c1, Fq) else Fq(c1)

    @classmethod
    def zero(cls):
        return cls(0, 0)

    @classmethod
    def one(cls):
        return cls(1, 0)

    def is_zero(self):
        return self.c0.is_zero() and self.c1.is_zero()

    def __add__(self, o):
        return Fq2(self.c0 + o.c0, self.c1 + o.c1)

    def __sub__(self, o):
        return Fq2(self.c0 - o.c0, self.c1 - o.c1)

    def __neg__(self):
        return Fq2(-self.c0, -self.c1)

    def __mul__(self, o):
        if isinstance(o, Fq2):
            # (a0 + a1 u)(b0 + b1 u), u^2 = -1 (Karatsuba)
            t0 = self.c0 * o.c0
            t1 = self.c1 * o.c1
            t2 = (self.c0 + self.c1) * (o.c0 + o.c1)
            return Fq2(t0 - t1, t2 - t0 - t1)
        return Fq2(self.c0 * o, self.c1 * o)  # o: Fq or int

    __rmul__ = __mul__

    def square(self):
        # (a0+a1 u)^2 = (a0+a1)(a0-a1) + 2 a0 a1 u
        t = self.c0 * self.c1
        return Fq2((self.c0 + self.c1) * (self.c0 - self.c1), t + t)

    def double(self):
        return Fq2(self.c0.double(), self.c1.double())

    def conjugate(self):
        return Fq2(self.c0, -self.c1)

    def invert(self):
        # (a - bu) / (a^2 + b^2)
        norm = self.c0.square() + self.c1.square()
        inv = norm.invert()
        if inv is None:
            return None
        return Fq2(self.c0 * inv, -(self.c1 * inv))

    def frobenius(self):
        # u^p = -u since p = 3 mod 4
        return self.conjugate()

    def pow(self, e: int):
        result = Fq2.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    def sqrt(self):
        """Tonelli-Shanks in Fq2 (group order p^2 - 1, 2-adicity 3,
        non-residue xi = 1 + u)."""
        if self.is_zero():
            return Fq2.zero()
        q1_half = (P * P - 1) // 2
        if self.pow(q1_half) != Fq2.one():
            return None
        s, t = 0, P * P - 1
        while t % 2 == 0:
            s += 1
            t //= 2
        z = XI  # quadratic non-residue in Fq2
        m = s
        c = z.pow(t)
        u_ = self.pow(t)
        r = self.pow((t + 1) // 2)
        while u_ != Fq2.one():
            i, u2 = 0, u_
            while u2 != Fq2.one():
                u2 = u2.square()
                i += 1
            b = c
            for _ in range(m - i - 1):
                b = b.square()
            m = i
            c = b.square()
            u_ = u_ * c
            r = r * b
        return r

    def lex_largest(self) -> bool:
        if not self.c1.is_zero():
            return _fq_lex_largest(self.c1)
        return _fq_lex_largest(self.c0)

    def __eq__(self, o):
        return isinstance(o, Fq2) and self.c0 == o.c0 and self.c1 == o.c1

    def __hash__(self):
        return hash(("Fq2", self.c0.value, self.c1.value))

    def __repr__(self):
        return f"Fq2(0x{self.c0.value:x}, 0x{self.c1.value:x})"


XI = Fq2(1, 1)  # the sextic non-residue xi = 1 + u; Fq12 = Fq2[w]/(w^6 - xi)


# ---------------------------------------------------------------------------
# Fq12 = Fq2[w] / (w^6 - xi)  (direct degree-6 extension of Fq2)
# ---------------------------------------------------------------------------


class Fq12:
    """Element sum_{i<6} c[i] w^i with c[i] in Fq2 and w^6 = xi."""

    __slots__ = ("c",)

    def __init__(self, c):
        assert len(c) == 6
        self.c = list(c)

    @classmethod
    def zero(cls):
        return cls([Fq2.zero()] * 6)

    @classmethod
    def one(cls):
        return cls([Fq2.one()] + [Fq2.zero()] * 5)

    @classmethod
    def from_fq2(cls, a: Fq2, power: int = 0):
        c = [Fq2.zero()] * 6
        c[power] = a
        return cls(c)

    def is_zero(self):
        return all(x.is_zero() for x in self.c)

    def __add__(self, o):
        return Fq12([a + b for a, b in zip(self.c, o.c)])

    def __sub__(self, o):
        return Fq12([a - b for a, b in zip(self.c, o.c)])

    def __neg__(self):
        return Fq12([-a for a in self.c])

    def __mul__(self, o):
        if not isinstance(o, Fq12):
            return Fq12([a * o for a in self.c])
        # schoolbook in w with reduction w^6 = xi
        acc = [Fq2.zero()] * 11
        for i, a in enumerate(self.c):
            if a.is_zero():
                continue
            for j, b in enumerate(o.c):
                if b.is_zero():
                    continue
                acc[i + j] = acc[i + j] + a * b
        out = acc[:6]
        for k in range(6, 11):
            out[k - 6] = out[k - 6] + acc[k] * XI
        return Fq12(out)

    __rmul__ = __mul__

    def square(self):
        return self * self

    def conjugate(self):
        """The Fq12/Fq6 conjugation f -> f^(p^6): w^(p^6) = -w."""
        return Fq12([c if i % 2 == 0 else -c for i, c in enumerate(self.c)])

    def invert(self):
        """Inverse by Gaussian elimination on the 6x6 multiplication-by-f
        matrix over Fq2 (column j = coefficients of f * w^j, a xi-twisted
        rotation of f's coefficients)."""
        cols = []
        for j in range(6):
            col = [None] * 6
            for i in range(6):
                if i >= j:
                    col[i] = self.c[i - j]
                else:
                    col[i] = self.c[6 + i - j] * XI
            cols.append(col)
        # Solve M x = e0 over Fq2
        n = 6
        M = [[cols[j][i] for j in range(n)] for i in range(n)]
        b = [Fq2.one()] + [Fq2.zero()] * 5
        # forward elimination
        for col in range(n):
            piv = None
            for row in range(col, n):
                if not M[row][col].is_zero():
                    piv = row
                    break
            if piv is None:
                return None
            M[col], M[piv] = M[piv], M[col]
            b[col], b[piv] = b[piv], b[col]
            inv = M[col][col].invert()
            M[col] = [x * inv for x in M[col]]
            b[col] = b[col] * inv
            for row in range(n):
                if row != col and not M[row][col].is_zero():
                    f = M[row][col]
                    M[row] = [x - f * y for x, y in zip(M[row], M[col])]
                    b[row] = b[row] - f * b[col]
        return Fq12(b)

    def pow(self, e: int):
        if e < 0:
            return self.invert().pow(-e)
        result = Fq12.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.square()
            e >>= 1
        return result

    def frobenius(self, power: int = 1):
        """f -> f^(p^power) using w^p = gamma * w with gamma = xi^((p-1)/6)."""
        out = self
        for _ in range(power % 12):
            out = Fq12([c.frobenius() * _FROB_W[i] for i, c in enumerate(out.c)])
        return out

    def __eq__(self, o):
        return isinstance(o, Fq12) and all(a == b for a, b in zip(self.c, o.c))

    def __hash__(self):
        return hash(("Fq12",) + tuple((x.c0.value, x.c1.value) for x in self.c))

    def __repr__(self):
        return f"Fq12({self.c})"


# gamma_i = xi^(i (p-1)/6): coefficient of w^i under Frobenius
_g = XI.pow((P - 1) // 6)
_FROB_W = [Fq2.one()]
for _i in range(5):
    _FROB_W.append(_FROB_W[-1] * _g)


# ---------------------------------------------------------------------------
# Generic short-Weierstrass curve arithmetic (host): y^2 = x^3 + b
# ---------------------------------------------------------------------------


class CurvePoint:
    """Affine point or identity over a field F with curve constant B.

    Subclasses define FIELD (class with zero/one), B (field element), the
    group order (SCALAR_ORDER = r), and serialization. Internally scalar
    multiplication uses Jacobian coordinates.
    """

    __slots__ = ("x", "y", "infinity")

    FIELD = None
    B = None
    COFACTOR = 1

    def __init__(self, x=None, y=None, infinity=False):
        self.x = x
        self.y = y
        self.infinity = infinity

    @classmethod
    def identity(cls):
        return cls(infinity=True)

    @classmethod
    def generator(cls):
        return cls(cls.GEN_X, cls.GEN_Y)

    def is_identity(self):
        return self.infinity

    def is_on_curve(self) -> bool:
        if self.infinity:
            return True
        return self.y.square() == self.x.square() * self.x + self.B

    def is_torsion_free(self) -> bool:
        return self.mul_int(R).is_identity()

    def __neg__(self):
        if self.infinity:
            return self
        return type(self)(self.x, -self.y)

    def __eq__(self, o):
        if self.infinity or o.infinity:
            return self.infinity and o.infinity
        return self.x == o.x and self.y == o.y

    def __hash__(self):
        if self.infinity:
            return hash((type(self).__name__, "inf"))
        return hash((type(self).__name__, self.x, self.y))

    def __add__(self, o):
        if self.infinity:
            return o
        if o.infinity:
            return self
        if self.x == o.x:
            if self.y == o.y:
                return self.double()
            return type(self).identity()
        lam = (o.y - self.y) * (o.x - self.x).invert()
        x3 = lam.square() - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return type(self)(x3, y3)

    def __sub__(self, o):
        return self + (-o)

    def double(self):
        if self.infinity or self.y.is_zero():
            return type(self).identity()
        xx = self.x.square()
        lam = (xx + xx + xx) * (self.y + self.y).invert()
        x3 = lam.square() - self.x - self.x
        y3 = lam * (self.x - x3) - self.y
        return type(self)(x3, y3)

    # -- Jacobian helpers for fast host scalar multiplication ---------------
    def _to_jac(self):
        if self.infinity:
            return None
        return (self.x, self.y, self.FIELD.one())

    @classmethod
    def _jac_double(cls, p):
        if p is None:
            return None
        X, Y, Z = p
        if Y.is_zero():
            return None
        A = X.square()
        Bv = Y.square()
        C = Bv.square()
        D = ((X + Bv).square() - A - C).double()
        E = A + A + A
        F = E.square()
        X3 = F - D - D
        c8 = C.double().double().double()
        Y3 = E * (D - X3) - c8
        Z3 = (Y * Z).double()
        return (X3, Y3, Z3)

    @classmethod
    def _jac_add_affine(cls, p, q):
        """p Jacobian (or None), q affine CurvePoint; mixed addition."""
        if q.infinity:
            return p
        if p is None:
            return (q.x, q.y, cls.FIELD.one())
        X1, Y1, Z1 = p
        Z1Z1 = Z1.square()
        U2 = q.x * Z1Z1
        S2 = q.y * Z1 * Z1Z1
        if U2 == X1:
            if S2 == Y1:
                return cls._jac_double(p)
            return None
        H = U2 - X1
        HH = H.square()
        I = HH.double().double()
        J = H * I
        rr = (S2 - Y1).double()
        V = X1 * I
        X3 = rr.square() - J - V - V
        Y3 = rr * (V - X3) - (Y1 * J).double()
        Z3 = ((Z1 + H).square() - Z1Z1 - HH)
        return (X3, Y3, Z3)

    @classmethod
    def _jac_to_affine(cls, p):
        if p is None:
            return cls.identity()
        X, Y, Z = p
        zinv = Z.invert()
        z2 = zinv.square()
        return cls(X * z2, Y * z2 * zinv)

    def mul_int(self, k: int):
        """Scalar multiplication by a plain integer (4-bit window)."""
        if k == 0 or self.infinity:
            return type(self).identity()
        if k < 0:
            return (-self).mul_int(-k)
        # 4-bit window table [_, P, 2P, ..., 15P] in Jacobian coords
        table = [None] * 16
        table[1] = self._to_jac()
        for i in range(2, 16):
            table[i] = self._jac_add_affine(table[i - 1], self)
        acc = None
        nibbles = []
        kk = k
        while kk:
            nibbles.append(kk & 0xF)
            kk >>= 4
        for nib in reversed(nibbles):
            if acc is not None:
                for _ in range(4):
                    acc = self._jac_double(acc)
            if nib:
                t = table[nib]
                acc = t if acc is None else self._jac_add_jacobian(acc, t)
        return self._jac_to_affine(acc)

    @classmethod
    def _jac_add_jacobian(cls, p, q):
        if p is None:
            return q
        if q is None:
            return p
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        Z1Z1 = Z1.square()
        Z2Z2 = Z2.square()
        U1 = X1 * Z2Z2
        U2 = X2 * Z1Z1
        S1 = Y1 * Z2 * Z2Z2
        S2 = Y2 * Z1 * Z1Z1
        if U1 == U2:
            if S1 == S2:
                return cls._jac_double(p)
            return None
        H = U2 - U1
        I = H.double().square()
        J = H * I
        rr = (S2 - S1).double()
        V = U1 * I
        X3 = rr.square() - J - V - V
        Y3 = rr * (V - X3) - (S1 * J).double()
        Z3 = ((Z1 + Z2).square() - Z1Z1 - Z2Z2) * H
        return (X3, Y3, Z3)

    def __mul__(self, scalar):
        if isinstance(scalar, int):
            return self.mul_int(scalar % R)
        return self.mul_int(scalar.value)

    __rmul__ = __mul__


def batch_normalize(jac_points, cls):
    """Batched Jacobian -> affine with a single shared inversion
    (Montgomery's trick); behavioral equivalent of group::Curve::
    batch_normalize used at /root/reference/groth16/src/generator.rs:293."""
    field = cls.FIELD
    zs = []
    idxs = []
    for i, p in enumerate(jac_points):
        if p is not None:
            zs.append(p[2])
            idxs.append(i)
    if not zs:
        return [cls.identity() for _ in jac_points]
    # prefix products
    prefix = [field.one()]
    for z in zs:
        prefix.append(prefix[-1] * z)
    inv_all = prefix[-1].invert()
    invs = [None] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        invs[i] = prefix[i] * inv_all
        inv_all = inv_all * zs[i]
    out = [cls.identity()] * len(jac_points)
    for j, i in enumerate(idxs):
        X, Y, _ = jac_points[i]
        zi = invs[j]
        z2 = zi.square()
        out[i] = cls(X * z2, Y * z2 * zi)
    return out


# ---------------------------------------------------------------------------
# G1 / G2
# ---------------------------------------------------------------------------


class G1Affine(CurvePoint):
    __slots__ = ()
    FIELD = Fq
    B = Fq(4)
    GEN_X = Fq(0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB)
    GEN_Y = Fq(0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1)

    COMPRESSED_SIZE = 48
    UNCOMPRESSED_SIZE = 96

    def to_compressed(self) -> bytes:
        if self.infinity:
            out = bytearray(48)
            out[0] = 0b1100_0000
            return bytes(out)
        out = bytearray(self.x.value.to_bytes(48, "big"))
        out[0] |= 0b1000_0000
        if _fq_lex_largest(self.y):
            out[0] |= 0b0010_0000
        return bytes(out)

    def to_uncompressed(self) -> bytes:
        if self.infinity:
            out = bytearray(96)
            out[0] = 0b0100_0000
            return bytes(out)
        return self.x.value.to_bytes(48, "big") + self.y.value.to_bytes(48, "big")

    @classmethod
    def from_compressed(cls, data: bytes, checked: bool = True):
        if len(data) != 48:
            raise ValueError("G1 compressed must be 48 bytes")
        flags = data[0]
        compression = bool(flags & 0b1000_0000)
        infinity = bool(flags & 0b0100_0000)
        sort = bool(flags & 0b0010_0000)
        if not compression:
            raise ValueError("compression flag not set")
        xv = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:], "big")
        if infinity:
            if xv != 0 or sort:
                raise ValueError("invalid infinity encoding")
            return cls.identity()
        if xv >= P:
            raise ValueError("x not in field")
        x = Fq(xv)
        y2 = x.square() * x + cls.B
        y = y2.sqrt()
        if y is None:
            raise ValueError("not on curve")
        if _fq_lex_largest(y) != sort:
            y = -y
        pt = cls(x, y)
        if checked and not pt.is_torsion_free():
            raise ValueError("not in prime-order subgroup")
        return pt

    @classmethod
    def from_uncompressed(cls, data: bytes, checked: bool = True):
        if len(data) != 96:
            raise ValueError("G1 uncompressed must be 96 bytes")
        flags = data[0]
        if flags & 0b1000_0000:
            raise ValueError("compression flag set on uncompressed point")
        infinity = bool(flags & 0b0100_0000)
        if flags & 0b0010_0000:
            raise ValueError("sort flag set on uncompressed point")
        xv = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
        yv = int.from_bytes(data[48:], "big")
        if infinity:
            if xv != 0 or yv != 0:
                raise ValueError("invalid infinity encoding")
            return cls.identity()
        if xv >= P or yv >= P:
            raise ValueError("coordinate not in field")
        pt = cls(Fq(xv), Fq(yv))
        if checked:
            if not pt.is_on_curve():
                raise ValueError("not on curve")
            if not pt.is_torsion_free():
                raise ValueError("not in prime-order subgroup")
        return pt


class G2Affine(CurvePoint):
    __slots__ = ()
    FIELD = Fq2
    B = Fq2(4, 4)
    GEN_X = Fq2(
        0x024AA2B2F08F0A91260805272DC51051C6E47AD4FA403B02B4510B647AE3D1770BAC0326A805BBEFD48056C8C121BDB8,
        0x13E02B6052719F607DACD3A088274F65596BD0D09920B61AB5DA61BBDC7F5049334CF11213945D57E5AC7D055D042B7E,
    )
    GEN_Y = Fq2(
        0x0CE5D527727D6E118CC9CDC6DA2E351AADFD9BAA8CBDD3A76D429A695160D12C923AC9CC3BACA289E193548608B82801,
        0x0606C4A02EA734CC32ACD2B02BC28B99CB3E287E85A763AF267492AB572E99AB3F370D275CEC1DA1AAA9075FF05F79BE,
    )

    COMPRESSED_SIZE = 96
    UNCOMPRESSED_SIZE = 192

    def to_compressed(self) -> bytes:
        if self.infinity:
            out = bytearray(96)
            out[0] = 0b1100_0000
            return bytes(out)
        out = bytearray(
            self.x.c1.value.to_bytes(48, "big") + self.x.c0.value.to_bytes(48, "big")
        )
        out[0] |= 0b1000_0000
        if self.y.lex_largest():
            out[0] |= 0b0010_0000
        return bytes(out)

    def to_uncompressed(self) -> bytes:
        if self.infinity:
            out = bytearray(192)
            out[0] = 0b0100_0000
            return bytes(out)
        return (
            self.x.c1.value.to_bytes(48, "big")
            + self.x.c0.value.to_bytes(48, "big")
            + self.y.c1.value.to_bytes(48, "big")
            + self.y.c0.value.to_bytes(48, "big")
        )

    @classmethod
    def from_compressed(cls, data: bytes, checked: bool = True):
        if len(data) != 96:
            raise ValueError("G2 compressed must be 96 bytes")
        flags = data[0]
        compression = bool(flags & 0b1000_0000)
        infinity = bool(flags & 0b0100_0000)
        sort = bool(flags & 0b0010_0000)
        if not compression:
            raise ValueError("compression flag not set")
        xc1 = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
        xc0 = int.from_bytes(data[48:96], "big")
        if infinity:
            if xc1 != 0 or xc0 != 0 or sort:
                raise ValueError("invalid infinity encoding")
            return cls.identity()
        if xc1 >= P or xc0 >= P:
            raise ValueError("x not in field")
        x = Fq2(xc0, xc1)
        y2 = x.square() * x + cls.B
        y = y2.sqrt()
        if y is None:
            raise ValueError("not on curve")
        if y.lex_largest() != sort:
            y = -y
        pt = cls(x, y)
        if checked and not pt.is_torsion_free():
            raise ValueError("not in prime-order subgroup")
        return pt

    @classmethod
    def from_uncompressed(cls, data: bytes, checked: bool = True):
        if len(data) != 192:
            raise ValueError("G2 uncompressed must be 192 bytes")
        flags = data[0]
        if flags & 0b1000_0000:
            raise ValueError("compression flag set on uncompressed point")
        infinity = bool(flags & 0b0100_0000)
        if flags & 0b0010_0000:
            raise ValueError("sort flag set on uncompressed point")
        xc1 = int.from_bytes(bytes([data[0] & 0x1F]) + data[1:48], "big")
        xc0 = int.from_bytes(data[48:96], "big")
        yc1 = int.from_bytes(data[96:144], "big")
        yc0 = int.from_bytes(data[144:192], "big")
        if infinity:
            if xc1 or xc0 or yc1 or yc0:
                raise ValueError("invalid infinity encoding")
            return cls.identity()
        for v in (xc1, xc0, yc1, yc0):
            if v >= P:
                raise ValueError("coordinate not in field")
        pt = cls(Fq2(xc0, xc1), Fq2(yc0, yc1))
        if checked:
            if not pt.is_on_curve():
                raise ValueError("not on curve")
            if not pt.is_torsion_free():
                raise ValueError("not in prime-order subgroup")
        return pt


# ---------------------------------------------------------------------------
# Pairing: untwist + affine Miller loop + final exponentiation
# ---------------------------------------------------------------------------

# Untwist psi: E'(Fq2) -> E(Fq12), (x', y') -> (x'/w^2, y'/w^3).
# In the w-basis: 1/w^2 = w^4/xi and 1/w^3 = w^3/xi, so
#   x12 = (x'/xi) w^4,  y12 = (y'/xi) w^3,
# which lands on y^2 = x^3 + 4 over Fq12.
_XI_INV = XI.invert()


def _line(mu: Fq2, xt: Fq2, yt: Fq2, p: G1Affine) -> Fq12:
    """Line through T (twist coords, slope mu) evaluated at untwisted P.

    With the untwist (x', y') -> (x'/w^2, y'/w^3) and lambda_12 =
    mu xi^{-1} w^5, the line lambda(xP - xT) - (yP - yT) collapses to the
    sparse element  (-yP) w^0 + (yt - mu xt) xi^{-1} w^3 + (mu xP) xi^{-1} w^5.
    """
    c = [Fq2.zero()] * 6
    c[0] = Fq2(-p.y, Fq(0))
    c[3] = (yt - mu * xt) * _XI_INV
    c[5] = (mu * Fq2(p.x, Fq(0))) * _XI_INV
    return Fq12(c)


def miller_loop(p: G1Affine, q: G2Affine) -> Fq12:
    """f_{|x|, psi(Q)}(P), conjugated for the negative BLS parameter.

    Affine Miller loop with point arithmetic kept on the twist in Fq2;
    vertical lines are omitted (they die in the final exponentiation for
    even embedding degree).
    """
    if p.is_identity() or q.is_identity():
        return Fq12.one()
    xq, yq = q.x, q.y
    xt, yt = xq, yq
    f = Fq12.one()
    for bit in bin(BLS_X)[3:]:
        # tangent line at T evaluated at P, then T = 2T (twist affine)
        mu = (xt.square() * 3) * (yt.double()).invert()
        f = f.square() * _line(mu, xt, yt, p)
        x3 = mu.square() - xt - xt
        yt = mu * (xt - x3) - yt
        xt = x3
        if bit == "1":
            mu = (yq - yt) * (xq - xt).invert()
            f = f * _line(mu, xt, yt, p)
            x3 = mu.square() - xt - xq
            yt = mu * (xt - x3) - yt
            xt = x3
    if BLS_X_IS_NEGATIVE:
        f = f.conjugate()
    return f


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((p^12 - 1) / r): easy part via Frobenius, hard part by plain
    exponentiation (host-side; speed is irrelevant for correctness oracle).
    """
    # easy part: f^(p^6 - 1) then ^(p^2 + 1)
    f1 = f.conjugate() * f.invert()          # f^(p^6 - 1)
    f2 = f1.frobenius(2) * f1                # ^(p^2 + 1)
    # hard part: ^((p^4 - p^2 + 1) / r)
    h = (P**4 - P**2 + 1) // R
    return f2.pow(h)


def _native():
    """The C++ pairing library (bellman_tpu.native), or None."""
    try:
        from .. import native

        if native.available():
            return native
    except Exception:  # noqa: BLE001 - pure-Python fallback
        pass
    return None


def pairing(p: G1Affine, q: G2Affine) -> Fq12:
    nat = _native()
    if nat is not None:
        return nat.pairing(p, q)
    return final_exponentiation(miller_loop(p, q))


class MillerLoopResult:
    """Accumulated product of Miller loops, awaiting final exponentiation.
    Mirrors pairing::MillerLoopResult used by the batch verifier
    (/root/reference/groth16/src/verifier/batch.rs:131-172)."""

    __slots__ = ("value",)

    def __init__(self, value: Fq12 | None = None):
        self.value = value if value is not None else Fq12.one()

    def __add__(self, other):
        return MillerLoopResult(self.value * other.value)

    def final_exponentiation(self) -> Fq12:
        nat = _native()
        if nat is not None:
            return nat.final_exponentiation(self.value)
        return final_exponentiation(self.value)


def multi_miller_loop(pairs) -> MillerLoopResult:
    pairs = list(pairs)
    nat = _native()
    if nat is not None:
        return MillerLoopResult(nat.multi_miller_loop(pairs))
    acc = Fq12.one()
    for (p, q) in pairs:
        acc = acc * miller_loop(p, q)
    return MillerLoopResult(acc)


GT_GENERATOR_ORDER = R
