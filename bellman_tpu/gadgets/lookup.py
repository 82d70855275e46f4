"""Window table lookup gadgets.

Behavioral equivalent of /root/reference/src/gadgets/lookup.rs:
coefficient synthesis by inclusion-exclusion (:11-27), lookup3_xy in 2
constraints (:31-117), lookup3_xy_with_conditional_negation in 1
constraint + 1 AND, returning a lazy Num x (:121-186).
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, get_value
from .boolean import Boolean
from .num import AllocatedNum, Num


def synth(field, window_size: int, constants):
    """Inclusion-exclusion coefficients for a window lookup."""
    assignment = [field.zero()] * (1 << window_size)
    for i, constant in enumerate(constants):
        cur = constant - assignment[i]
        assignment[i] = cur
        for j in range(i + 1, len(assignment)):
            if j & i == i:
                assignment[j] = assignment[j] + cur
    return assignment


def lookup3_xy(cs: ConstraintSystem, bits, coords):
    """3-bit window lookup of (x, y) pairs; bits little-endian."""
    assert len(bits) == 3
    assert len(coords) == 8
    field = cs.field

    vals = [b.get_value() for b in bits]
    i = (
        (1 if vals[0] else 0) | (2 if vals[1] else 0) | (4 if vals[2] else 0)
        if None not in vals
        else None
    )

    with cs.namespace("x"):
        res_x = AllocatedNum.alloc(cs, lambda: coords[get_value(i)][0])
    with cs.namespace("y"):
        res_y = AllocatedNum.alloc(cs, lambda: coords[get_value(i)][1])

    x_coeffs = synth(field, 3, [c[0] for c in coords])
    y_coeffs = synth(field, 3, [c[1] for c in coords])

    with cs.namespace("precomp"):
        precomp = Boolean.and_(cs, bits[1], bits[2])

    def lookup_constraint(name, coeffs, res):
        cs.enforce(
            name,
            cs.lc()
            + (coeffs[0b001], cs.one)
            + bits[1].lc(cs, coeffs[0b011])
            + bits[2].lc(cs, coeffs[0b101])
            + precomp.lc(cs, coeffs[0b111]),
            bits[0].lc(cs, field.one()),
            cs.lc()
            + res.get_variable()
            - (coeffs[0b000], cs.one)
            - bits[1].lc(cs, coeffs[0b010])
            - bits[2].lc(cs, coeffs[0b100])
            - precomp.lc(cs, coeffs[0b110]),
        )

    lookup_constraint("x-coordinate lookup", x_coeffs, res_x)
    lookup_constraint("y-coordinate lookup", y_coeffs, res_y)
    return res_x, res_y


def lookup3_xy_with_conditional_negation(cs: ConstraintSystem, bits, coords):
    """3-bit window lookup where bits[2] is a sign bit; x returned as a
    lazy Num (1 constraint + 1 AND)."""
    assert len(bits) == 3
    assert len(coords) == 4
    field = cs.field

    v0, v1 = bits[0].get_value(), bits[1].get_value()
    i = (
        (1 if v0 else 0) | (2 if v1 else 0)
        if v0 is not None and v1 is not None
        else None
    )

    def compute_y():
        tmp = coords[get_value(i)][1]
        if get_value(bits[2].get_value()):
            tmp = -tmp
        return tmp

    with cs.namespace("y"):
        y = AllocatedNum.alloc(cs, compute_y)

    x_coeffs = synth(field, 2, [c[0] for c in coords])
    y_coeffs = synth(field, 2, [c[1] for c in coords])

    with cs.namespace("precomp"):
        precomp = Boolean.and_(cs, bits[0], bits[1])

    x = (
        Num.zero(cs)
        .add_bool_with_coeff(cs, Boolean.constant(True), x_coeffs[0b00])
        .add_bool_with_coeff(cs, bits[0], x_coeffs[0b01])
        .add_bool_with_coeff(cs, bits[1], x_coeffs[0b10])
        .add_bool_with_coeff(cs, precomp, x_coeffs[0b11])
    )

    y_lc = (
        precomp.lc(cs, y_coeffs[0b11])
        + bits[1].lc(cs, y_coeffs[0b10])
        + bits[0].lc(cs, y_coeffs[0b01])
        + (y_coeffs[0b00], cs.one)
    )

    cs.enforce(
        "y-coordinate lookup",
        y_lc + y_lc,
        bits[2].lc(cs, field.one()),
        y_lc - y.get_variable(),
    )

    return x, Num.from_allocated(cs, y)
