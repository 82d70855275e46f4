"""Reference workload circuits.

MiMC (LongsightF-322p3 over BLS12-381) is the reference's end-to-end
integration and bench workload (/root/reference/groth16/tests/common/
mod.rs:5,20-129: 322 rounds, xL/xR private preimage halves, the final xL
public). Used by tests/test_mimc_e2e.py and benches/.
"""

from __future__ import annotations

from .r1cs import Circuit, get_value

MIMC_ROUNDS = 322


def mimc_host(field, xl, xr, constants):
    """Plain-host LongsightF evaluation (common/mod.rs:20-34)."""
    assert len(constants) == MIMC_ROUNDS
    for c in constants:
        t = (xl + c).square() * (xl + c) + xr
        xr, xl = xl, t
    return xl


class MiMCDemo(Circuit):
    """xL = mimc(xL, xR): 2 constraints/round (common/mod.rs:39-129)."""

    def __init__(self, constants, xl=None, xr=None):
        assert len(constants) == MIMC_ROUNDS
        self.constants = constants
        self.xl = xl
        self.xr = xr

    def synthesize(self, cs):
        xl_val = self.xl
        xl = cs.alloc("preimage xl", lambda: get_value(self.xl))
        xr_val = self.xr
        xr = cs.alloc("preimage xr", lambda: get_value(self.xr))

        for i, c in enumerate(self.constants):
            with cs.namespace(f"round {i}"):
                # tmp = (xL + Ci)^2
                tmp_val = (
                    (xl_val + c).square() if xl_val is not None else None
                )
                tmp = cs.alloc("tmp", lambda tv=tmp_val: get_value(tv))
                cs.enforce(
                    "tmp = (xL + Ci)^2",
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + tmp,
                )
                # new_xL = xR + (xL + Ci)^3
                new_xl_val = (
                    xr_val + tmp_val * (xl_val + c)
                    if xl_val is not None
                    else None
                )
                if i == len(self.constants) - 1:
                    new_xl = cs.alloc_input(
                        "image", lambda nv=new_xl_val: get_value(nv)
                    )
                else:
                    new_xl = cs.alloc(
                        "new_xl", lambda nv=new_xl_val: get_value(nv)
                    )
                cs.enforce(
                    "new_xL = xR + (xL + Ci)^3",
                    cs.lc() + tmp,
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + new_xl - xr,
                )
                xr, xr_val = xl, xl_val
                xl, xl_val = new_xl, new_xl_val
