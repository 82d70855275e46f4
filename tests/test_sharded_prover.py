"""Sharded (multi-chip) prover on the 8-device CPU mesh: proofs must be
bit-identical to the host oracle."""

import random

import jax
import pytest

from bellman_tpu.algebra.engine import Bls12_381Engine
from bellman_tpu.groth16 import (
    create_proof, generate_random_parameters, prepare_verifying_key,
    verify_proof,
)
from bellman_tpu.parallel import sharding
from bellman_tpu.parallel.prover import (
    ShardedDeviceParameters, create_proof_sharded,
)
from tests.test_device_prover import MiMCDemo, mimc_host

ENGINE = Bls12_381Engine
Fr = ENGINE.Fr


@pytest.mark.slow
def test_sharded_proof_bit_identical():
    devs = jax.local_devices(backend="cpu")
    if len(devs) < 4:
        pytest.skip("needs 4 cpu devices")
    # 4 devices + 4-bit windows: XLA-CPU aborts a collective whose
    # participants don't all arrive within 40s, and the virtual devices
    # share host threads; smaller per-window work keeps every device
    # comfortably under that bound
    mesh = sharding.make_mesh(devices=devs[:4])

    rng = random.Random(77)
    rounds = 12
    constants = [Fr.random(rng) for _ in range(rounds)]
    params = generate_random_parameters(ENGINE, MiMCDemo(constants), rng)
    sharded = ShardedDeviceParameters(
        ENGINE, params, mesh, min_block=8, window_c=4
    )
    pvk = prepare_verifying_key(ENGINE, params.vk)

    xl, xr = Fr.random(rng), Fr.random(rng)
    image = mimc_host(Fr, xl, xr, constants)
    r, s = Fr.random(rng), Fr.random(rng)
    circuit = MiMCDemo(constants, xl=xl, xr=xr)

    host_proof = create_proof(ENGINE, circuit, params, r, s)
    sharded_proof = create_proof_sharded(ENGINE, circuit, sharded, r, s)
    assert sharded_proof.to_bytes() == host_proof.to_bytes()
    verify_proof(pvk, sharded_proof, [image])
