"""Full MiMC end-to-end: the reference's flagship integration test
(/root/reference/groth16/tests/mimc.rs): generate -> prove (host AND
device) -> serialize -> deserialize -> verify, plus the batch path."""

import random

import pytest

from bellman_tpu.algebra.engine import Bls12_381Engine
from bellman_tpu.groth16 import (
    batch, create_proof, generate_random_parameters, prepare_verifying_key,
    verify_proof, Proof,
)
from bellman_tpu.workloads import MIMC_ROUNDS, MiMCDemo, mimc_host
from bellman_tpu.ops.prover import DeviceParameters, create_proof_on_device
from bellman_tpu.r1cs import VerificationError

ENGINE = Bls12_381Engine
Fr = ENGINE.Fr


@pytest.fixture(scope="module")
def setup():
    rng = random.Random(0x4D694D43)
    constants = [Fr.random(rng) for _ in range(MIMC_ROUNDS)]
    params = generate_random_parameters(ENGINE, MiMCDemo(constants), rng)
    pvk = prepare_verifying_key(ENGINE, params.vk)
    return rng, constants, params, pvk


@pytest.mark.slow
def test_mimc_prove_verify_roundtrip(setup):
    rng, constants, params, pvk = setup
    dev_params = DeviceParameters(ENGINE, params)

    for trial in range(2):
        xl = Fr.random(rng)
        xr = Fr.random(rng)
        image = mimc_host(Fr, xl, xr, constants)
        r = Fr.random(rng)
        s = Fr.random(rng)

        circuit = MiMCDemo(constants, xl=xl, xr=xr)
        host_proof = create_proof(ENGINE, circuit, params, r, s)
        dev_proof = create_proof_on_device(ENGINE, circuit, dev_params, r, s)
        assert dev_proof.to_bytes() == host_proof.to_bytes()

        raw = dev_proof.to_bytes()
        assert len(raw) == 192
        back = Proof.from_bytes(raw, ENGINE)
        verify_proof(pvk, back, [image])
        with pytest.raises(VerificationError):
            verify_proof(pvk, back, [image + Fr.one()])


@pytest.mark.slow
def test_mimc_batch_verify(setup):
    rng, constants, params, pvk = setup
    items = []
    for _ in range(3):
        xl = Fr.random(rng)
        xr = Fr.random(rng)
        image = mimc_host(Fr, xl, xr, constants)
        r = Fr.random(rng)
        s = Fr.random(rng)
        proof = create_proof(
            ENGINE, MiMCDemo(constants, xl=xl, xr=xr), params, r, s
        )
        items.append((proof, [image]))

    v = batch.Verifier(ENGINE)
    for proof, inputs in items:
        v.queue(proof, inputs)
    v.verify(rng, params.vk)

    v2 = batch.Verifier(ENGINE)
    for proof, inputs in items:
        v2.queue(proof, inputs)
    v2.verify_chunked(params.vk, rng)
