"""R1CS constraint-system core: the circuit programming model.

TPU-native re-design of the reference's circuit layer
(/root/reference/src/lib.rs:156-566): circuits synthesize into
``a * b = c`` rank-1 constraints over linear combinations of public
("input") and private ("aux") variables. ``Index ('input', 0)`` is the
constant ONE (/root/reference/src/lib.rs:380-382).

Synthesis is host-side Python by design (it is serial in the reference too
— SURVEY.md section 3.2); its output feeds sparse matrices / witness
vectors that are shipped to the device once. Annotation closures are lazy:
only constraint systems that care (TestConstraintSystem) evaluate them
(/root/reference/src/lib.rs:388-410).
"""

from __future__ import annotations

from typing import Callable, Optional, Union


# ---------------------------------------------------------------------------
# Errors
# ---------------------------------------------------------------------------


class SynthesisError(Exception):
    """Base for errors during circuit synthesis / proving
    (/root/reference/src/lib.rs:303-349)."""


class AssignmentMissing(SynthesisError):
    """Variable assignment missing (during witness generation only)."""


class DivisionByZero(SynthesisError):
    pass


class Unsatisfiable(SynthesisError):
    pass


class PolynomialDegreeTooLarge(SynthesisError):
    pass


class UnexpectedIdentity(SynthesisError):
    """Encountered an identity element when handling queries of dense bases
    (/root/reference/src/multiexp.rs:63-65)."""


class MalformedVerifyingKey(SynthesisError):
    pass


class UnconstrainedVariable(SynthesisError):
    """An auxiliary variable was unconstrained during CRS generation
    (/root/reference/groth16/src/generator.rs:464-470)."""


class VerificationError(Exception):
    """Base for verification errors (/root/reference/src/lib.rs:352-370)."""


class InvalidVerifyingKey(VerificationError):
    pass


class InvalidProof(VerificationError):
    pass


# ---------------------------------------------------------------------------
# Variables and linear combinations
# ---------------------------------------------------------------------------

INPUT = 0
AUX = 1


class Variable:
    """A variable in a constraint system: (kind, index) where kind is
    INPUT (public) or AUX (private). Compact and hashable; mirrors
    /root/reference/src/lib.rs:162-185."""

    __slots__ = ("kind", "index")

    def __init__(self, kind: int, index: int):
        self.kind = kind
        self.index = index

    @staticmethod
    def input(i: int) -> "Variable":
        return Variable(INPUT, i)

    @staticmethod
    def aux(i: int) -> "Variable":
        return Variable(AUX, i)

    def __eq__(self, o):
        return (
            isinstance(o, Variable) and self.kind == o.kind and self.index == o.index
        )

    def __hash__(self):
        return hash((self.kind, self.index))

    def __repr__(self):
        return f"Variable({'input' if self.kind == INPUT else 'aux'}, {self.index})"

    # Arithmetic sugar so gadget code can write `a + b`, `2 * a - ONE` etc.
    def _lc(self, field):
        return LinearCombination(field).add_term(self, field.one())


ONE = Variable.input(0)


class LinearCombination:
    """Ordered map Variable -> coefficient over a scalar field.

    Insertion order is preserved and repeated terms merge by addition,
    matching the reference's indexmap-backed LinearCombination and its 8
    Add/Sub operator impls (/root/reference/src/lib.rs:190-299).
    """

    __slots__ = ("field", "terms")

    def __init__(self, field, terms=None):
        self.field = field
        self.terms = dict(terms) if terms else {}

    @classmethod
    def zero(cls, field):
        return cls(field)

    def copy(self):
        return LinearCombination(self.field, self.terms)

    def add_term(self, var: Variable, coeff) -> "LinearCombination":
        out = self.copy()
        out._iadd_term(var, coeff)
        return out

    def _iadd_term(self, var: Variable, coeff):
        cur = self.terms.get(var)
        if cur is None:
            self.terms[var] = coeff
        else:
            self.terms[var] = cur + coeff

    # -- operators ----------------------------------------------------------
    def _coerce(self, other):
        """other may be: Variable, (coeff, Variable), LinearCombination."""
        if isinstance(other, Variable):
            return [(other, self.field.one())]
        if isinstance(other, tuple) and len(other) == 2:
            coeff, var = other
            if isinstance(coeff, int):
                coeff = self.field.from_int(coeff)
            return [(var, coeff)]
        if isinstance(other, LinearCombination):
            return list(other.terms.items())
        raise TypeError(f"cannot add {other!r} to LinearCombination")

    def __add__(self, other):
        out = self.copy()
        for var, coeff in self._coerce(other):
            out._iadd_term(var, coeff)
        return out

    def __sub__(self, other):
        out = self.copy()
        for var, coeff in self._coerce(other):
            out._iadd_term(var, -coeff)
        return out

    def __radd__(self, other):
        return self.__add__(other)

    def __mul__(self, scalar):
        if isinstance(scalar, int):
            scalar = self.field.from_int(scalar)
        return LinearCombination(
            self.field, {v: c * scalar for v, c in self.terms.items()}
        )

    __rmul__ = __mul__

    def __neg__(self):
        return LinearCombination(self.field, {v: -c for v, c in self.terms.items()})

    def eval(self, input_assignment, aux_assignment):
        """Evaluate against assignment vectors (lists of field elements)."""
        acc = self.field.zero()
        for var, coeff in self.terms.items():
            if coeff.is_zero():
                continue
            v = (
                input_assignment[var.index]
                if var.kind == INPUT
                else aux_assignment[var.index]
            )
            acc = acc + v * coeff
        return acc

    def __repr__(self):
        return f"LC({self.terms})"


LcLike = Union[LinearCombination, Variable, Callable]


# ---------------------------------------------------------------------------
# ConstraintSystem protocol
# ---------------------------------------------------------------------------


def _lazy_name(annotation) -> str:
    return annotation() if callable(annotation) else str(annotation)


class ConstraintSystem:
    """Abstract constraint system (/root/reference/src/lib.rs:374-437).

    Subclasses implement alloc/alloc_input/enforce and (optionally) the
    namespace hooks. ``field`` is the scalar field class (host field).
    """

    def __init__(self, field):
        self.field = field

    # the constant 1 variable
    @property
    def one(self) -> Variable:
        return ONE

    def lc(self) -> LinearCombination:
        """Fresh empty linear combination over this CS's field."""
        return LinearCombination(self.field)

    # -- to implement -------------------------------------------------------
    def alloc(self, annotation, f: Callable[[], object]) -> Variable:
        raise NotImplementedError

    def alloc_input(self, annotation, f: Callable[[], object]) -> Variable:
        raise NotImplementedError

    def enforce(self, annotation, a: LcLike, b: LcLike, c: LcLike):
        raise NotImplementedError

    # -- namespaces (no-ops except in introspecting CSs) --------------------
    def push_namespace(self, name_fn):
        pass

    def pop_namespace(self):
        pass

    def namespace(self, name):
        return _Namespace(self, name)

    def get_root(self) -> "ConstraintSystem":
        return self

    def is_extensible(self) -> bool:
        return True

    # -- helpers ------------------------------------------------------------
    def _coerce_lc(self, x: LcLike) -> LinearCombination:
        """Accept an LC, a Variable, or a builder callable lc -> lc."""
        if isinstance(x, LinearCombination):
            return x
        if isinstance(x, Variable):
            return self.lc() + x
        if callable(x):
            return x(self.lc())
        raise TypeError(f"cannot interpret {x!r} as a linear combination")


class _Namespace:
    """Context manager pushing/popping a namespace
    (/root/reference/src/lib.rs:441-509)."""

    def __init__(self, cs: ConstraintSystem, name):
        self.cs = cs
        self.name = name

    def __enter__(self):
        self.cs.get_root().push_namespace(
            self.name if callable(self.name) else (lambda: str(self.name))
        )
        return self.cs

    def __exit__(self, exc_type, exc, tb):
        self.cs.get_root().pop_namespace()
        return False


class Circuit:
    """Computations representable as constraint systems
    (/root/reference/src/lib.rs:156-159)."""

    def synthesize(self, cs: ConstraintSystem):
        raise NotImplementedError


def get_value(opt: Optional[object]):
    """Option -> value, raising AssignmentMissing for None; the Assignment
    helper (/root/reference/src/gadgets.rs:22-33)."""
    if opt is None:
        raise AssignmentMissing("a variable assignment is missing")
    return opt
