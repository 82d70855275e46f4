"""UInt32: a 32-bit word of circuit Booleans (LSB-first).

Behavioral equivalent of /root/reference/src/gadgets/uint32.rs:
constant/alloc (:25-77), BE/LE bit conversions (:79-164), FREE rotr/shr
by bit rewiring (:166-202), bitwise xor (:283-305), fused per-bit
sha256 maj/ch (:204-280), and ``addmany`` — sum of 2..=10 operands as
one linear combination, with ceil(log2(max_sum)) result bits (including
carries) allocated and the equality packed through MultiEq (:308-408).
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, get_value
from .boolean import AllocatedBit, Boolean
from .multieq import MultiEq


class UInt32:
    __slots__ = ("bits", "value")

    def __init__(self, bits, value):
        self.bits = list(bits)  # LSB first, 32 Booleans
        self.value = value      # Optional[int]

    @classmethod
    def constant(cls, value: int):
        value &= 0xFFFFFFFF
        bits = [Boolean.constant(bool((value >> i) & 1)) for i in range(32)]
        return cls(bits, value)

    @classmethod
    def alloc(cls, cs: ConstraintSystem, value):
        vals = (
            [bool((value >> i) & 1) for i in range(32)]
            if value is not None
            else [None] * 32
        )
        bits = []
        for i, b in enumerate(vals):
            with cs.namespace(f"allocated bit {i}"):
                bits.append(Boolean.from_bit(AllocatedBit.alloc(cs, b)))
        return cls(bits, value)

    # -- bit conversions ------------------------------------------------------
    def into_bits_be(self):
        return list(reversed(self.bits))

    @classmethod
    def from_bits_be(cls, bits):
        assert len(bits) == 32
        value = 0
        for b in bits:
            v = b.get_value()
            if v is None:
                value = None
                break
            value = ((value << 1) | (1 if v else 0)) & 0xFFFFFFFF
        return cls(list(reversed(bits)), value)

    def into_bits(self):
        return list(self.bits)

    @classmethod
    def from_bits(cls, bits):
        assert len(bits) == 32
        value = 0
        for b in reversed(bits):
            v = b.get_value()
            if v is None:
                value = None
                break
            value = (value << 1) | (1 if v else 0)
        return cls(bits, value)

    # -- free shifts/rotations --------------------------------------------------
    def rotr(self, by: int):
        by %= 32
        new_bits = (self.bits[by:] + self.bits)[:32]
        value = (
            ((self.value >> by) | (self.value << (32 - by))) & 0xFFFFFFFF
            if self.value is not None
            else None
        )
        return UInt32(new_bits, value)

    def shr(self, by: int):
        by %= 32
        fill = Boolean.constant(False)
        new_bits = (self.bits[by:] + [fill] * 32)[:32]
        value = (self.value >> by) if self.value is not None else None
        return UInt32(new_bits, value)

    # -- logic ------------------------------------------------------------------
    def xor(self, cs: ConstraintSystem, other: "UInt32"):
        value = (
            self.value ^ other.value
            if self.value is not None and other.value is not None
            else None
        )
        bits = []
        for i, (a, b) in enumerate(zip(self.bits, other.bits)):
            with cs.namespace(f"xor of bit {i}"):
                bits.append(Boolean.xor(cs, a, b))
        return UInt32(bits, value)

    @staticmethod
    def _triop(cs, a, b, c, tri_fn, circuit_fn, label):
        value = (
            tri_fn(a.value, b.value, c.value)
            if None not in (a.value, b.value, c.value)
            else None
        )
        bits = []
        for i, (x, y, z) in enumerate(zip(a.bits, b.bits, c.bits)):
            with cs.namespace(f"{label} {i}"):
                bits.append(circuit_fn(cs, x, y, z))
        return UInt32(bits, value)

    @staticmethod
    def sha256_maj(cs, a, b, c):
        return UInt32._triop(
            cs, a, b, c,
            lambda x, y, z: (x & y) ^ (x & z) ^ (y & z),
            Boolean.sha256_maj,
            "maj",
        )

    @staticmethod
    def sha256_ch(cs, a, b, c):
        return UInt32._triop(
            cs, a, b, c,
            lambda x, y, z: (x & y) ^ ((~x & 0xFFFFFFFF) & z),
            Boolean.sha256_ch,
            "ch",
        )

    # -- modular addition ---------------------------------------------------------
    @staticmethod
    def addmany(cs, operands):
        """cs must be (rooted in) a MultiEq."""
        field = cs.field
        assert field.NUM_BITS >= 64
        assert 2 <= len(operands) <= 10

        max_value = len(operands) * 0xFFFFFFFF
        result_value = 0
        lc = cs.lc()
        all_constants = True

        for op in operands:
            if op.value is not None and result_value is not None:
                result_value += op.value
            else:
                result_value = None
            coeff = field.one()
            for bit in op.bits:
                lc = lc + bit.lc(cs, coeff)
                all_constants &= bit.is_constant()
                coeff = coeff.double()

        modular_value = (
            result_value & 0xFFFFFFFF if result_value is not None else None
        )
        if all_constants and modular_value is not None:
            return UInt32.constant(modular_value)

        result_bits = []
        result_lc = cs.lc()
        coeff = field.one()
        i = 0
        while max_value != 0:
            with cs.namespace(f"result bit {i}"):
                b = AllocatedBit.alloc(
                    cs,
                    bool((result_value >> i) & 1)
                    if result_value is not None
                    else None,
                )
            result_lc = result_lc + (coeff, b.get_variable())
            result_bits.append(Boolean.from_bit(b))
            max_value >>= 1
            i += 1
            coeff = coeff.double()

        root = cs.get_root()
        assert isinstance(root, MultiEq), "addmany requires a MultiEq root"
        root.enforce_equal(i, lc, result_lc)

        return UInt32(result_bits[:32], modular_value)
