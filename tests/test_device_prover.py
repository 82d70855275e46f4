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
from bellman_tpu.workloads import MiMCDemo, mimc_host


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
