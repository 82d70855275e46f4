"""Device prover vs host oracle: proofs must be BIT-IDENTICAL.

The DummyEngine case exercises the full device pipeline (h-pipeline FFTs
+ MSMs) with the F_64513 mock algebra (the reference's testing trick,
/root/reference/groth16/src/tests/dummy_engine.rs); the BLS12-381 case
runs the real curve kernels on a small MiMC-style circuit."""

import random

import pytest

from bellman_tpu.r1cs import Circuit, get_value
from bellman_tpu.algebra.engine import DummyEngine, Bls12_381Engine
from bellman_tpu.groth16 import (
    generate_random_parameters, create_proof, prepare_verifying_key,
    verify_proof,
)
from bellman_tpu.ops.prover import DeviceParameters, create_proof_on_device


class MiMCDemo(Circuit):
    """LongsightF MiMC (2 constraints/round), the reference's e2e workload
    (/root/reference/groth16/tests/common/mod.rs:39-129), at reduced
    round count for test speed."""

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
            # tmp = (xL + Ci)^2
            tmp_val = (xl_val + c).square() if xl_val is not None else None
            tmp = cs.alloc(f"tmp {i}", lambda tv=tmp_val: get_value(tv))
            cs.enforce(
                f"tmp {i}",
                cs.lc() + xl + (c, cs.one),
                cs.lc() + xl + (c, cs.one),
                cs.lc() + tmp,
            )
            # new_xL = xR + (xL + Ci)^3
            new_xl_val = (
                xr_val + tmp_val * (xl_val + c) if xl_val is not None else None
            )
            last = i == len(self.constants) - 1
            if last:
                new_xl = cs.alloc_input(
                    "image", lambda nv=new_xl_val: get_value(nv)
                )
            else:
                new_xl = cs.alloc(
                    f"new_xl {i}", lambda nv=new_xl_val: get_value(nv)
                )
            cs.enforce(
                f"new_xL {i}",
                cs.lc() + tmp,
                cs.lc() + xl + (c, cs.one),
                cs.lc() + new_xl - xr,
            )
            xr, xr_val = xl, xl_val
            xl, xl_val = new_xl, new_xl_val


def mimc_host(field, xl, xr, constants):
    for c in constants:
        t = (xl + c).square() * (xl + c) + xr
        xr, xl = xl, t
    return xl


@pytest.mark.parametrize("engine", [DummyEngine, Bls12_381Engine],
                         ids=["dummy", "bls12_381"])
def test_device_proof_bit_identical(engine):
    Fr = engine.Fr
    rng = random.Random(42)
    rounds = 10 if engine is Bls12_381Engine else 22
    constants = [Fr.random(rng) for _ in range(rounds)]

    params = generate_random_parameters(
        engine, MiMCDemo(constants), rng
    )
    dev_params = DeviceParameters(engine, params)
    pvk = prepare_verifying_key(engine, params.vk)

    for trial in range(2):
        xl = Fr.random(rng)
        xr = Fr.random(rng)
        image = mimc_host(Fr, xl, xr, constants)
        r = Fr.random(rng)
        s = Fr.random(rng)
        circuit = MiMCDemo(constants, xl=xl, xr=xr)

        host_proof = create_proof(engine, circuit, params, r, s)
        dev_proof = create_proof_on_device(engine, circuit, dev_params, r, s)
        assert dev_proof.to_bytes() == host_proof.to_bytes()
        verify_proof(pvk, dev_proof, [image])
