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
    """Plain-host LongsightF evaluation (common/mod.rs:20-34).

    len(constants) sets the round count (322 for the reference workload;
    tests use fewer for speed)."""
    for c in constants:
        t = (xl + c).square() * (xl + c) + xr
        xr, xl = xl, t
    return xl


class MiMCDemo(Circuit):
    """xL = mimc(xL, xR): 2 constraints/round (common/mod.rs:39-129)."""

    def __init__(self, constants, xl=None, xr=None):
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


class WideMiMC(Circuit):
    """B independent MiMC instances in one circuit: the scale workload
    for the single-host full-prover config (BASELINE.md "full prover
    @2^20 constraints"). Aux layout is instance-major —
    [xl, xr, tmp_0, new_xl_0, ..., tmp_{R-1}] per instance — so the
    vectorized device witness (``wide_mimc_witness``) can be assembled
    with pure array reshapes.

    Constraint shapes per round match MiMCDemo (2 constraints/round,
    /root/reference/groth16/tests/common/mod.rs:39-129); the final new_xl
    of each instance is a public input."""

    def __init__(self, constants, B, xl=None, xr=None):
        self.constants = constants
        self.B = B
        self.xl = xl  # sequence of B field elements (or None)
        self.xr = xr

    def synthesize(self, cs):
        R = len(self.constants)
        for b in range(self.B):
            xl_val = None if self.xl is None else self.xl[b]
            xr_val = None if self.xr is None else self.xr[b]
            xl = cs.alloc(f"xl {b}", lambda v=xl_val: get_value(v))
            xr = cs.alloc(f"xr {b}", lambda v=xr_val: get_value(v))
            for i, c in enumerate(self.constants):
                tmp_val = (
                    (xl_val + c).square() if xl_val is not None else None
                )
                tmp = cs.alloc(
                    f"tmp {b} {i}", lambda v=tmp_val: get_value(v)
                )
                cs.enforce(
                    f"tmp {b} {i}",
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + tmp,
                )
                nv = (
                    xr_val + tmp_val * (xl_val + c)
                    if xl_val is not None
                    else None
                )
                if i == R - 1:
                    new_xl = cs.alloc_input(
                        f"image {b}", lambda v=nv: get_value(v)
                    )
                else:
                    new_xl = cs.alloc(
                        f"new_xl {b} {i}", lambda v=nv: get_value(v)
                    )
                cs.enforce(
                    f"new_xL {b} {i}",
                    cs.lc() + tmp,
                    cs.lc() + xl + (c, cs.one),
                    cs.lc() + new_xl - xr,
                )
                xr, xr_val = xl, xl_val
                xl, xl_val = new_xl, nv


def wide_mimc_witness(spec, field, constants, xl0, xr0):
    """Device-vectorized witness for WideMiMC: all B chains advance in
    lock-step with (L, B) Montgomery limb vectors, R rounds of ~3 field
    ops each. Returns (input_limbs (L, B+1), aux_limbs (L, B*(2R+1)))
    plain-form uint32 arrays ready for ops.prover.create_proof_compiled.

    xl0/xr0: length-B lists of ints (plain form)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .ops import limbs

    R = len(constants)
    B = len(xl0)
    XL = jnp.asarray(spec.to_mont_host([int(v) for v in xl0]))
    XR = jnp.asarray(spec.to_mont_host([int(v) for v in xr0]))
    C = jnp.asarray(spec.to_mont_host([int(c) for c in constants]))

    @jax.jit
    def run(XL, XR):
        tmps = []
        nxls = []
        for i in range(R):
            t1 = limbs.add_hot(spec, XL, C[:, i:i + 1])
            tmp = limbs.mont_mul_hot(spec, t1, t1)
            nxl = limbs.add_hot(
                spec, XR, limbs.mont_mul_hot(spec, tmp, t1)
            )
            tmps.append(tmp)
            nxls.append(nxl)
            XR = XL
            XL = nxl
        return jnp.stack(tmps), jnp.stack(nxls)  # (R, L, B)

    tmps, nxls = run(XL, XR)
    L = spec.L
    tmps_p = np.asarray(
        jax.device_get(limbs.from_mont(spec, tmps.transpose(1, 0, 2).reshape(L, R * B)))
    ).reshape(L, R, B)
    nxls_p = np.asarray(
        jax.device_get(limbs.from_mont(spec, nxls.transpose(1, 0, 2).reshape(L, R * B)))
    ).reshape(L, R, B)
    xl_p = np.asarray(spec.to_limbs([int(v) for v in xl0]))
    xr_p = np.asarray(spec.to_limbs([int(v) for v in xr0]))

    # aux layout per instance: [xl, xr, tmp_0, nxl_0, ..., tmp_{R-1}]
    per = 2 * R + 1
    aux = np.zeros((L, B, per), np.uint32)
    aux[:, :, 0] = xl_p
    aux[:, :, 1] = xr_p
    aux[:, :, 2::2] = tmps_p.transpose(0, 2, 1)        # R slots
    aux[:, :, 3::2] = nxls_p[:, : R - 1].transpose(0, 2, 1)
    aux_limbs = aux.reshape(L, B * per)

    ones = np.asarray(spec.to_limbs([1]))
    images = nxls_p[:, R - 1]                           # (L, B)
    input_limbs = np.concatenate([ones, images], axis=1)
    return input_limbs, aux_limbs
