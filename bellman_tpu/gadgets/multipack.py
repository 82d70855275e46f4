"""Multipacking: bit vectors packed into CAPACITY-bit field elements.

Behavioral equivalent of /root/reference/src/gadgets/multipack.rs:
in-circuit pack_into_inputs (public input + packing constraint per
CAPACITY-bit chunk, :11-37), out-of-circuit compute_multipacking
(:53-72), bytes_to_bits / bytes_to_bits_le (:39-51).
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, get_value
from .num import Num


def pack_into_inputs(cs: ConstraintSystem, bits):
    field = cs.field
    cap = field.CAPACITY
    for i in range(0, len(bits), cap):
        chunk = bits[i : i + cap]
        num = Num.zero(cs)
        coeff = field.one()
        for bit in chunk:
            num = num.add_bool_with_coeff(cs, bit, coeff)
            coeff = coeff.double()
        idx = i // cap
        input_var = cs.alloc_input(
            f"input {idx}", lambda n=num: get_value(n.get_value())
        )
        cs.enforce(
            f"packing constraint {idx}",
            num.lc(field.one()),
            cs.lc() + cs.one,
            cs.lc() + input_var,
        )


def bytes_to_bits(data: bytes):
    return [bool((b >> (7 - i)) & 1) for b in data for i in range(8)]


def bytes_to_bits_le(data: bytes):
    return [bool((b >> i) & 1) for b in data for i in range(8)]


def compute_multipacking(field, bits):
    out = []
    cap = field.CAPACITY
    for i in range(0, len(bits), cap):
        cur = field.zero()
        coeff = field.one()
        for bit in bits[i : i + cap]:
            if bit:
                cur = cur + coeff
            coeff = coeff.double()
        out.append(cur)
    return out
