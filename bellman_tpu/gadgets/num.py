"""Field-number gadgets.

Behavioral equivalent of /root/reference/src/gadgets/num.rs: AllocatedNum
(alloc :26-47, inputize :49-63, to_bits_le_strict with in-field
strictness via run-of-ones k-ary ANDs against char-1 :70-193, to_bits_le
:198-219, mul/square :221-282, assert_nonzero via an allocated inverse
:284-312, conditionally_reverse in 2 constraints :317-357) and the lazy
Num accumulator (:368-415).
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, DivisionByZero, get_value
from .boolean import AllocatedBit, Boolean, field_into_allocated_bits_le


class AllocatedNum:
    __slots__ = ("value", "variable")

    def __init__(self, value, variable):
        self.value = value
        self.variable = variable

    @classmethod
    def alloc(cls, cs: ConstraintSystem, f, annotation="num"):
        holder = {}

        def compute():
            v = f()
            holder["v"] = v
            return v

        var = cs.alloc(annotation, compute)
        return cls(holder.get("v"), var)

    @classmethod
    def alloc_maybe(cls, cs: ConstraintSystem, value):
        """alloc from an Optional value (common Python convenience)."""
        return cls.alloc(cs, lambda: get_value(value))

    def inputize(self, cs: ConstraintSystem):
        input_var = cs.alloc_input(
            "input variable", lambda: get_value(self.value)
        )
        cs.enforce(
            "enforce input is correct",
            cs.lc() + input_var,
            cs.lc() + cs.one,
            cs.lc() + self.variable,
        )

    def to_bits_le_strict(self, cs: ConstraintSystem):
        """Bit decomposition, strictly in-field (no congruency allowed)."""
        field = cs.field

        def kary_and(cs, bits):
            cur = None
            for i, b in enumerate(bits):
                if cur is None:
                    cur = b
                else:
                    with cs.namespace(f"and {i}"):
                        cur = AllocatedBit.and_(cs, cur, b)
            return cur

        nbits = field.NUM_BITS
        a_bits_be = (
            [bool((int(self.value) >> i) & 1) for i in range(nbits)][::-1]
            if self.value is not None
            else [None] * nbits
        )
        # char - 1 in big-endian (NUM_BITS bits; MSB is always 1)
        char_minus_one = field.MODULUS - 1
        b_bits_be = [bool((char_minus_one >> i) & 1) for i in range(nbits)][::-1]

        result = []
        last_run = None
        current_run = []
        for i, (b, a_bit) in enumerate(zip(b_bits_be, a_bits_be)):
            if b:
                with cs.namespace(f"bit {i}"):
                    ab = AllocatedBit.alloc(cs, a_bit)
                current_run.append(ab)
                result.append(ab)
            else:
                if current_run:
                    if last_run is not None:
                        current_run.append(last_run)
                    with cs.namespace(f"run ending at {i}"):
                        last_run = kary_and(cs, current_run)
                    current_run = []
                with cs.namespace(f"bit {i}"):
                    ab = AllocatedBit.alloc_conditionally(cs, a_bit, last_run)
                result.append(ab)
        assert not current_run  # char is prime: ends on a run of zeros

        lc = cs.lc()
        coeff = field.one()
        for bit in reversed(result):
            lc = lc + (coeff, bit.get_variable())
            coeff = coeff.double()
        lc = lc - self.variable
        cs.enforce("unpacking constraint", cs.lc(), cs.lc(), lc)

        return [Boolean.from_bit(b) for b in reversed(result)]

    def to_bits_le(self, cs: ConstraintSystem):
        bits = field_into_allocated_bits_le(cs, self.value)
        field = cs.field
        lc = cs.lc()
        coeff = field.one()
        for bit in bits:
            lc = lc + (coeff, bit.get_variable())
            coeff = coeff.double()
        lc = lc - self.variable
        cs.enforce("unpacking constraint", cs.lc(), cs.lc(), lc)
        return [Boolean.from_bit(b) for b in bits]

    def mul(self, cs: ConstraintSystem, other: "AllocatedNum"):
        out = AllocatedNum.alloc(
            cs,
            lambda: get_value(self.value) * get_value(other.value),
            annotation="product num",
        )
        cs.enforce(
            "multiplication constraint",
            cs.lc() + self.variable,
            cs.lc() + other.variable,
            cs.lc() + out.variable,
        )
        return out

    def square(self, cs: ConstraintSystem):
        out = AllocatedNum.alloc(
            cs, lambda: get_value(self.value).square(), annotation="squared num"
        )
        cs.enforce(
            "squaring constraint",
            cs.lc() + self.variable,
            cs.lc() + self.variable,
            cs.lc() + out.variable,
        )
        return out

    def assert_nonzero(self, cs: ConstraintSystem):
        def compute_inv():
            v = get_value(self.value)
            if v.is_zero():
                raise DivisionByZero("assert_nonzero on zero")
            return v.invert()

        inv = cs.alloc("ephemeral inverse", compute_inv)
        cs.enforce(
            "nonzero assertion constraint",
            cs.lc() + self.variable,
            cs.lc() + inv,
            cs.lc() + cs.one,
        )

    @staticmethod
    def conditionally_reverse(cs: ConstraintSystem, a, b, condition: Boolean):
        """(b, a) if condition else (a, b), in 2 constraints."""
        with cs.namespace("conditional reversal result 1"):
            c = AllocatedNum.alloc(
                cs,
                lambda: get_value(b.value)
                if get_value(condition.get_value())
                else get_value(a.value),
            )
        cs.enforce(
            "first conditional reversal",
            cs.lc() + a.variable - b.variable,
            condition.lc(cs),
            cs.lc() + a.variable - c.variable,
        )
        with cs.namespace("conditional reversal result 2"):
            d = AllocatedNum.alloc(
                cs,
                lambda: get_value(a.value)
                if get_value(condition.get_value())
                else get_value(b.value),
            )
        cs.enforce(
            "second conditional reversal",
            cs.lc() + b.variable - a.variable,
            condition.lc(cs),
            cs.lc() + b.variable - d.variable,
        )
        return c, d

    def get_value(self):
        return self.value

    def get_variable(self):
        return self.variable


class Num:
    """Lazy linear-combination accumulator (num.rs:368-415)."""

    __slots__ = ("value", "_lc")

    def __init__(self, value, lc):
        self.value = value
        self._lc = lc

    @classmethod
    def zero(cls, cs: ConstraintSystem):
        return cls(cs.field.zero(), cs.lc())

    @classmethod
    def from_allocated(cls, cs: ConstraintSystem, num: AllocatedNum):
        return cls(num.value, cs.lc() + num.variable)

    def get_value(self):
        return self.value

    def lc(self, coeff):
        return self._lc * coeff

    def add_bool_with_coeff(self, cs: ConstraintSystem, bit: Boolean, coeff):
        bval = bit.get_value()
        if self.value is not None and bval is not None:
            newval = self.value + coeff if bval else self.value
        else:
            newval = None
        return Num(newval, self._lc + bit.lc(cs, coeff))
