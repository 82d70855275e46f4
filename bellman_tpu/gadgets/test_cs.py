"""TestConstraintSystem: the introspectable debugging backend.

Behavioral equivalent of /root/reference/src/gadgets/test/mod.rs:
records named constraints and assignments; evaluates every LC for
is_satisfied/which_is_unsatisfied (:254-272); set/get variables by path
(:278-328); verify(expected_inputs) (:292-302); pretty_print (:166-227);
and the BLAKE2s STRUCTURAL HASH over (n_inputs, n_aux, n_constraints,
normalized LCs) for circuit-shape regression pinning (:94-121,229-252) —
byte-compatible with the reference's (inputs sort before aux, u64-BE
lengths/indices, 'I'/'A' tags, big-endian 32-byte coefficient reprs).
Path computation bans '/' in names (:339-357).
"""

from __future__ import annotations

import hashlib
import struct

from ..r1cs import (
    ConstraintSystem, Variable, INPUT, AUX, LinearCombination, _lazy_name,
)


def _compute_path(ns, this: str) -> str:
    if "/" in this:
        raise ValueError("'/' is not allowed in names")
    return "/".join(list(ns) + [this])


def _proc_lc(lc: LinearCombination):
    """Normalized (sorted, zero-coeffs dropped) list of (var, coeff);
    inputs sort before aux."""
    merged = {}
    for var, coeff in lc.terms.items():
        cur = merged.get(var)
        merged[var] = coeff if cur is None else cur + coeff
    out = [(v, c) for v, c in merged.items() if not c.is_zero()]
    out.sort(key=lambda vc: (vc[0].kind, vc[0].index))
    return out


class TestConstraintSystem(ConstraintSystem):
    __test__ = False  # not a pytest class

    def __init__(self, field):
        super().__init__(field)
        self.named_objects = {"ONE": ("var", self.one)}
        self.current_namespace = []
        self.constraints = []  # (a, b, c, path)
        self.inputs = [(field.one(), "ONE")]
        self.aux = []

    # -- allocation -----------------------------------------------------------
    def _set_named_obj(self, path, obj):
        if path in self.named_objects:
            raise ValueError(f"tried to create object at existing path: {path}")
        self.named_objects[path] = obj

    def alloc(self, annotation, f):
        index = len(self.aux)
        path = _compute_path(self.current_namespace, _lazy_name(annotation))
        self.aux.append((f(), path))
        var = Variable.aux(index)
        self._set_named_obj(path, ("var", var))
        return var

    def alloc_input(self, annotation, f):
        index = len(self.inputs)
        path = _compute_path(self.current_namespace, _lazy_name(annotation))
        self.inputs.append((f(), path))
        var = Variable.input(index)
        self._set_named_obj(path, ("var", var))
        return var

    def enforce(self, annotation, a, b, c):
        path = _compute_path(self.current_namespace, _lazy_name(annotation))
        index = len(self.constraints)
        self._set_named_obj(path, ("constraint", index))
        self.constraints.append(
            (self._coerce_lc(a), self._coerce_lc(b), self._coerce_lc(c), path)
        )

    def push_namespace(self, name_fn):
        name = _lazy_name(name_fn)
        path = _compute_path(self.current_namespace, name)
        self._set_named_obj(path, ("namespace",))
        self.current_namespace.append(name)

    def pop_namespace(self):
        assert self.current_namespace, "pop on empty namespace stack"
        self.current_namespace.pop()

    # -- introspection ----------------------------------------------------------
    def _eval_lc(self, lc):
        acc = self.field.zero()
        for var, coeff in lc.terms.items():
            v = (
                self.inputs[var.index][0]
                if var.kind == INPUT
                else self.aux[var.index][0]
            )
            acc = acc + v * coeff
        return acc

    def which_is_unsatisfied(self):
        for a, b, c, path in self.constraints:
            if self._eval_lc(a) * self._eval_lc(b) != self._eval_lc(c):
                return path
        return None

    def is_satisfied(self):
        return self.which_is_unsatisfied() is None

    def num_constraints(self):
        return len(self.constraints)

    def num_inputs(self):
        return len(self.inputs)

    def set(self, path, to):
        obj = self.named_objects.get(path)
        if obj is None:
            raise KeyError(f"no variable exists at path: {path}")
        if obj[0] != "var":
            raise TypeError(f"`{path}` is not a variable: {obj}")
        var = obj[1]
        if var.kind == INPUT:
            self.inputs[var.index] = (to, self.inputs[var.index][1])
        else:
            self.aux[var.index] = (to, self.aux[var.index][1])

    def get(self, path):
        obj = self.named_objects.get(path)
        if obj is None:
            raise KeyError(f"no variable exists at path: {path}")
        if obj[0] != "var":
            raise TypeError(f"`{path}` is not a variable: {obj}")
        var = obj[1]
        return (
            self.inputs[var.index][0]
            if var.kind == INPUT
            else self.aux[var.index][0]
        )

    def get_input(self, index, path):
        assignment, name = self.inputs[index]
        assert path == name, f"{path} != {name}"
        return assignment

    def verify(self, expected) -> bool:
        assert len(expected) + 1 == len(self.inputs)
        return all(
            a[0] == e for a, e in zip(self.inputs[1:], expected)
        )

    # -- structural hash ----------------------------------------------------------
    def hash(self) -> str:
        h = hashlib.blake2s(digest_size=32)
        h.update(
            struct.pack(
                ">QQQ",
                len(self.inputs),
                len(self.aux),
                len(self.constraints),
            )
        )

        def hash_lc(lc):
            norm = _proc_lc(lc)
            h.update(struct.pack(">Q", len(norm)))
            for var, coeff in norm:
                tag = b"I" if var.kind == INPUT else b"A"
                # big-endian flip of the LE canonical repr (test/mod.rs:110-116)
                coeff_be = bytes(reversed(coeff.to_repr()))
                h.update(tag + struct.pack(">Q", var.index) + coeff_be)

        for a, b, c, _ in self.constraints:
            hash_lc(a)
            hash_lc(b)
            hash_lc(c)
        return h.hexdigest()

    # -- pretty printer --------------------------------------------------------------
    def pretty_print(self) -> str:
        field = self.field
        negone = -field.one()
        powers_of_two = [
            field.from_int(2) ** i for i in range(field.NUM_BITS)
        ]

        def pp(lc):
            parts = ["("]
            is_first = True
            for var, coeff in _proc_lc(lc):
                if coeff == negone:
                    parts.append(" - ")
                elif not is_first:
                    parts.append(" + ")
                is_first = False
                if coeff != field.one() and coeff != negone:
                    for i, x in enumerate(powers_of_two):
                        if x == coeff:
                            parts.append(f"2^{i} . ")
                            break
                    parts.append(f"{coeff!r} . ")
                name = (
                    self.inputs[var.index][1]
                    if var.kind == INPUT
                    else self.aux[var.index][1]
                )
                parts.append(f"`{name}`")
            if is_first:
                parts.append("0")
            parts.append(")")
            return "".join(parts)

        lines = []
        for a, b, c, name in self.constraints:
            lines.append(f"{name}: {pp(a)} * {pp(b)} = {pp(c)}")
        return "\n" + "\n".join(lines) + "\n" if lines else "\n"
