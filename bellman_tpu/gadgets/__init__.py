"""Circuit gadget library.

Mirrors /root/reference/src/gadgets.rs:3-12's module surface: boolean,
num, uint32, multieq, multipack, lookup, sha256, blake2s, and the
introspectable test constraint system. The Assignment helper (Option ->
value-or-AssignmentMissing, gadgets.rs:22-33) is ``r1cs.get_value``.
"""

from ..r1cs import get_value  # the Assignment helper
from . import blake2s, boolean, lookup, multieq, multipack, num, sha256, uint32
from .boolean import AllocatedBit, Boolean
from .multieq import MultiEq
from .num import AllocatedNum, Num
from .test_cs import TestConstraintSystem
from .uint32 import UInt32

__all__ = [
    "AllocatedBit",
    "AllocatedNum",
    "Boolean",
    "MultiEq",
    "Num",
    "TestConstraintSystem",
    "UInt32",
    "blake2s",
    "boolean",
    "get_value",
    "lookup",
    "multieq",
    "multipack",
    "num",
    "sha256",
    "uint32",
]
