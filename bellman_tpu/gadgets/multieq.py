"""MultiEq: packs many small equalities into few constraints.

Behavioral equivalent of /root/reference/src/gadgets/multieq.rs:
equalities of num_bits each are stacked at shifted powers of two until
Scalar::CAPACITY bits are used (flush when CAPACITY <= bits_used +
num_bits, :46-57), each flush emitting one constraint lhs * 1 = rhs
(:24-38), including a final flush on Drop (:60-66) — here on context
exit or an explicit ``flush()``.
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem


class MultiEq(ConstraintSystem):
    def __init__(self, cs: ConstraintSystem):
        super().__init__(cs.field)
        self.cs = cs
        self.ops = 0
        self.bits_used = 0
        self.lhs = cs.lc()
        self.rhs = cs.lc()

    # -- accumulation --------------------------------------------------------
    def _accumulate(self):
        ops = self.ops
        self.cs.enforce(
            f"multieq {ops}",
            self.lhs,
            self.cs.lc() + self.cs.one,
            self.rhs,
        )
        self.lhs = self.cs.lc()
        self.rhs = self.cs.lc()
        self.bits_used = 0
        self.ops += 1

    def enforce_equal(self, num_bits: int, lhs, rhs):
        if self.field.CAPACITY <= self.bits_used + num_bits:
            self._accumulate()
        assert self.field.CAPACITY > self.bits_used + num_bits
        coeff = self.field.from_int(2) ** self.bits_used
        self.lhs = self.lhs + lhs * coeff
        self.rhs = self.rhs + rhs * coeff
        self.bits_used += num_bits

    def flush(self):
        if self.bits_used > 0:
            self._accumulate()

    # -- context manager (the Drop-flush) -------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self.flush()
        return False

    # -- ConstraintSystem delegation ------------------------------------------
    def alloc(self, annotation, f):
        return self.cs.alloc(annotation, f)

    def alloc_input(self, annotation, f):
        return self.cs.alloc_input(annotation, f)

    def enforce(self, annotation, a, b, c):
        self.cs.enforce(annotation, a, b, c)

    def push_namespace(self, name_fn):
        self.cs.get_root().push_namespace(name_fn)

    def pop_namespace(self):
        self.cs.get_root().pop_namespace()

    def get_root(self):
        return self
