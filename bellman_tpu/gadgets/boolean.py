"""Boolean gadgets: circuit bits and boolean logic.

Behavioral equivalent of /root/reference/src/gadgets/boolean.rs —
identical constraint shapes and counts:

* AllocatedBit.alloc: (1-a)*a = 0 (:70-99); alloc_conditionally:
  (1-must_be_false-a)*a = 0 (:29-66)
* xor: (a+a)*b = a+b-c (:103-151); and: a*b=c (:155-190);
  and_not: a*(1-b)=c (:193-228); nor: (1-a)*(1-b)=c (:231-266)
* Boolean Is/Not/Constant with free negation and constant folding
  (:361-512); sha256_ch fused in 1 constraint a(b-c)=ch-c (:515-619);
  sha256_maj in 2 constraints via bc=b AND c, (2bc-b-c)*a = bc-maj
  (:622-736)
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, SynthesisError, Unsatisfiable, get_value


class AllocatedBit:
    """A variable constrained to be 0 or 1."""

    __slots__ = ("variable", "value")

    def __init__(self, variable, value):
        self.variable = variable
        self.value = value  # Optional[bool]

    def get_value(self):
        return self.value

    def get_variable(self):
        return self.variable

    @classmethod
    def alloc(cls, cs: ConstraintSystem, value):
        field = cs.field
        var = cs.alloc(
            "boolean",
            lambda: field.one() if get_value(value) else field.zero(),
        )
        cs.enforce(
            "boolean constraint",
            cs.lc() + cs.one - var,
            cs.lc() + var,
            cs.lc(),
        )
        return cls(var, value)

    @classmethod
    def alloc_conditionally(cls, cs: ConstraintSystem, value, must_be_false):
        field = cs.field
        var = cs.alloc(
            "boolean",
            lambda: field.one() if get_value(value) else field.zero(),
        )
        # (1 - must_be_false - a) * a = 0
        cs.enforce(
            "boolean constraint",
            cs.lc() + cs.one - must_be_false.variable - var,
            cs.lc() + var,
            cs.lc(),
        )
        return cls(var, value)

    @classmethod
    def xor(cls, cs: ConstraintSystem, a: "AllocatedBit", b: "AllocatedBit"):
        field = cs.field

        def compute():
            return field.one() if get_value(a.value) ^ get_value(b.value) else field.zero()

        var = cs.alloc("xor result", compute)
        value = None if a.value is None or b.value is None else a.value ^ b.value
        # (a + a) * b = a + b - c
        cs.enforce(
            "xor constraint",
            cs.lc() + a.variable + a.variable,
            cs.lc() + b.variable,
            cs.lc() + a.variable + b.variable - var,
        )
        return cls(var, value)

    @classmethod
    def and_(cls, cs: ConstraintSystem, a, b):
        field = cs.field
        var = cs.alloc(
            "and result",
            lambda: field.one()
            if get_value(a.value) and get_value(b.value)
            else field.zero(),
        )
        value = None if a.value is None or b.value is None else a.value and b.value
        cs.enforce(
            "and constraint",
            cs.lc() + a.variable,
            cs.lc() + b.variable,
            cs.lc() + var,
        )
        return cls(var, value)

    @classmethod
    def and_not(cls, cs: ConstraintSystem, a, b):
        field = cs.field
        var = cs.alloc(
            "and not result",
            lambda: field.one()
            if get_value(a.value) and not get_value(b.value)
            else field.zero(),
        )
        value = (
            None if a.value is None or b.value is None else a.value and not b.value
        )
        cs.enforce(
            "and not constraint",
            cs.lc() + a.variable,
            cs.lc() + cs.one - b.variable,
            cs.lc() + var,
        )
        return cls(var, value)

    @classmethod
    def nor(cls, cs: ConstraintSystem, a, b):
        field = cs.field
        var = cs.alloc(
            "nor result",
            lambda: field.one()
            if not get_value(a.value) and not get_value(b.value)
            else field.zero(),
        )
        value = (
            None
            if a.value is None or b.value is None
            else not a.value and not b.value
        )
        cs.enforce(
            "nor constraint",
            cs.lc() + cs.one - a.variable,
            cs.lc() + cs.one - b.variable,
            cs.lc() + var,
        )
        return cls(var, value)


def u64_into_boolean_vec_le(cs: ConstraintSystem, value):
    vals = (
        [bool((value >> i) & 1) for i in range(64)]
        if value is not None
        else [None] * 64
    )
    out = []
    for i, b in enumerate(vals):
        with cs.namespace(f"bit {i}"):
            out.append(Boolean.from_bit(AllocatedBit.alloc(cs, b)))
    return out


def field_into_allocated_bits_le(cs: ConstraintSystem, value):
    """LE bit decomposition with exactly NUM_BITS allocated bits
    (boolean.rs:313-356)."""
    nbits = cs.field.NUM_BITS
    vals = (
        [bool((int(value) >> i) & 1) for i in range(nbits)]
        if value is not None
        else [None] * nbits
    )
    out = []
    for i, b in enumerate(vals):
        with cs.namespace(f"bit {i}"):
            out.append(AllocatedBit.alloc(cs, b))
    return out


def field_into_boolean_vec_le(cs: ConstraintSystem, value):
    return [Boolean.from_bit(b) for b in field_into_allocated_bits_le(cs, value)]


class Boolean:
    """Is(bit) | Not(bit) | Constant(bool), with free negation."""

    IS = "is"
    NOT = "not"
    CONST = "const"

    __slots__ = ("kind", "bit", "const")

    def __init__(self, kind, bit=None, const=None):
        self.kind = kind
        self.bit = bit
        self.const = const

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_bit(cls, bit: AllocatedBit):
        return cls(cls.IS, bit=bit)

    @classmethod
    def constant(cls, b: bool):
        return cls(cls.CONST, const=bool(b))

    def is_constant(self):
        return self.kind == self.CONST

    def get_value(self):
        if self.kind == self.CONST:
            return self.const
        if self.bit.value is None:
            return None
        return self.bit.value if self.kind == self.IS else not self.bit.value

    def not_(self):
        if self.kind == self.CONST:
            return Boolean.constant(not self.const)
        return Boolean(
            self.NOT if self.kind == self.IS else self.IS, bit=self.bit
        )

    def lc(self, cs: ConstraintSystem, coeff=None):
        """Projection onto a linear combination (boolean.rs:429-447)."""
        field = cs.field
        if coeff is None:
            coeff = field.one()
        if self.kind == self.CONST:
            return cs.lc() + (coeff, cs.one) if self.const else cs.lc()
        if self.kind == self.IS:
            return cs.lc() + (coeff, self.bit.variable)
        return cs.lc() + (coeff, cs.one) - (coeff, self.bit.variable)

    # -- relations -----------------------------------------------------------
    @staticmethod
    def enforce_equal(cs: ConstraintSystem, a: "Boolean", b: "Boolean"):
        if a.is_constant() and b.is_constant():
            if a.const != b.const:
                raise Unsatisfiable("booleans are not equal")
            return
        if (a.is_constant() and a.const) or (b.is_constant() and b.const):
            x = b if a.is_constant() else a
            cs.enforce(
                "enforce equal to one",
                cs.lc(),
                cs.lc(),
                cs.lc() + cs.one - x.lc(cs),
            )
            return
        if (a.is_constant() and not a.const) or (b.is_constant() and not b.const):
            x = b if a.is_constant() else a
            cs.enforce("enforce equal to zero", cs.lc(), cs.lc(), x.lc(cs))
            return
        cs.enforce("enforce equal", cs.lc(), cs.lc(), a.lc(cs) - b.lc(cs))

    @staticmethod
    def xor(cs: ConstraintSystem, a: "Boolean", b: "Boolean") -> "Boolean":
        if a.is_constant() and not a.const:
            return b
        if b.is_constant() and not b.const:
            return a
        if a.is_constant() and a.const:
            return b.not_()
        if b.is_constant() and b.const:
            return a.not_()
        if a.kind != b.kind:  # Is ^ Not = NOT(Is ^ Is)
            return Boolean.xor(cs, a, b.not_()).not_()
        return Boolean.from_bit(AllocatedBit.xor(cs, a.bit, b.bit))

    @staticmethod
    def and_(cs: ConstraintSystem, a: "Boolean", b: "Boolean") -> "Boolean":
        if (a.is_constant() and not a.const) or (b.is_constant() and not b.const):
            return Boolean.constant(False)
        if a.is_constant() and a.const:
            return b
        if b.is_constant() and b.const:
            return a
        if a.kind == Boolean.IS and b.kind == Boolean.NOT:
            return Boolean.from_bit(AllocatedBit.and_not(cs, a.bit, b.bit))
        if a.kind == Boolean.NOT and b.kind == Boolean.IS:
            return Boolean.from_bit(AllocatedBit.and_not(cs, b.bit, a.bit))
        if a.kind == Boolean.NOT and b.kind == Boolean.NOT:
            return Boolean.from_bit(AllocatedBit.nor(cs, a.bit, b.bit))
        return Boolean.from_bit(AllocatedBit.and_(cs, a.bit, b.bit))

    @staticmethod
    def sha256_ch(cs: ConstraintSystem, a, b, c) -> "Boolean":
        """(a and b) xor ((not a) and c) — fused, 1 constraint."""
        av, bv, cv = a.get_value(), b.get_value(), c.get_value()
        ch_value = (
            (av and bv) ^ ((not av) and cv)
            if None not in (av, bv, cv)
            else None
        )

        if a.is_constant() and b.is_constant() and c.is_constant():
            return Boolean.constant(ch_value)
        if a.is_constant() and not a.const:
            return c
        if b.is_constant() and not b.const:
            return Boolean.and_(cs, a.not_(), c)
        if c.is_constant() and not c.const:
            return Boolean.and_(cs, a, b)
        if c.is_constant() and c.const:
            return Boolean.and_(cs, a, b.not_()).not_()
        if b.is_constant() and b.const:
            return Boolean.and_(cs, a.not_(), c.not_()).not_()
        # a == Constant(true) falls through to the generic constraint,
        # like the reference (boolean.rs:581-586)

        field = cs.field
        ch = cs.alloc(
            "ch",
            lambda: field.one() if get_value(ch_value) else field.zero(),
        )
        # a(b - c) = ch - c
        cs.enforce(
            "ch computation",
            b.lc(cs) - c.lc(cs),
            a.lc(cs),
            (cs.lc() + ch) - c.lc(cs),
        )
        return Boolean.from_bit(AllocatedBit(ch, ch_value))

    @staticmethod
    def sha256_maj(cs: ConstraintSystem, a, b, c) -> "Boolean":
        """(a and b) xor (a and c) xor (b and c) — fused, 2 constraints."""
        av, bv, cv = a.get_value(), b.get_value(), c.get_value()
        maj_value = (
            (av and bv) ^ (av and cv) ^ (bv and cv)
            if None not in (av, bv, cv)
            else None
        )

        if a.is_constant() and b.is_constant() and c.is_constant():
            return Boolean.constant(maj_value)
        if a.is_constant() and not a.const:
            return Boolean.and_(cs, b, c)
        if b.is_constant() and not b.const:
            return Boolean.and_(cs, a, c)
        if c.is_constant() and not c.const:
            return Boolean.and_(cs, a, b)
        if c.is_constant() and c.const:
            return Boolean.and_(cs, a.not_(), b.not_()).not_()
        if b.is_constant() and b.const:
            return Boolean.and_(cs, a.not_(), c.not_()).not_()
        if a.is_constant() and a.const:
            return Boolean.and_(cs, b.not_(), c.not_()).not_()

        field = cs.field
        maj = cs.alloc(
            "maj",
            lambda: field.one() if get_value(maj_value) else field.zero(),
        )
        with cs.namespace("b and c"):
            bc = Boolean.and_(cs, b, c)
        # (2bc - b - c) * a = bc - maj
        cs.enforce(
            "maj computation",
            bc.lc(cs) + bc.lc(cs) - b.lc(cs) - c.lc(cs),
            a.lc(cs),
            bc.lc(cs) - (cs.lc() + maj),
        )
        return Boolean.from_bit(AllocatedBit(maj, maj_value))

    def __repr__(self):
        if self.kind == self.CONST:
            return f"Boolean.constant({self.const})"
        return f"Boolean.{self.kind}({self.bit.variable})"
