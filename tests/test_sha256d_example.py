"""The reference's front-page example as an executable test: prove
knowledge of a SHA-256d preimage (/root/reference/src/lib.rs:16-126's
doc-test), end-to-end over the DummyEngine-style fast path is impossible
(SHA-256 gadget needs a >64-bit field), so it runs on BLS12-381 with the
TestConstraintSystem for satisfiability plus a Groth16 round-trip at
reduced preimage length."""

import hashlib
import random

import pytest

from bellman_tpu.algebra.engine import Bls12_381Engine
from bellman_tpu.gadgets import TestConstraintSystem, boolean, multipack, sha256
from bellman_tpu.groth16 import (
    create_random_proof, generate_random_parameters, prepare_verifying_key,
    verify_proof,
)
from bellman_tpu.r1cs import Circuit

ENGINE = Bls12_381Engine
Fr = ENGINE.Fr


def sha256d(data: bytes) -> bytes:
    return hashlib.sha256(hashlib.sha256(data).digest()).digest()


class MyCircuit(Circuit):
    """Proves knowledge of a preimage x of SHA-256d(x) (lib.rs:36-70)."""

    PREIMAGE_LEN = 80

    def __init__(self, preimage=None):
        self.preimage = preimage

    def synthesize(self, cs):
        bit_values = (
            multipack.bytes_to_bits_le(self.preimage)
            if self.preimage is not None
            else [None] * (self.PREIMAGE_LEN * 8)
        )
        assert len(bit_values) == self.PREIMAGE_LEN * 8

        preimage_bits = []
        for i, b in enumerate(bit_values):
            with cs.namespace(f"preimage bit {i}"):
                preimage_bits.append(
                    boolean.Boolean.from_bit(
                        boolean.AllocatedBit.alloc(cs, b)
                    )
                )

        # the doc-test's sha256d has LE bit order externally: flip each
        # input byte's bits, hash twice, flip output bytes (lib.rs:30-53)
        def flip_bytes(bits):
            return [
                b
                for i in range(0, len(bits), 8)
                for b in reversed(bits[i : i + 8])
            ]

        with cs.namespace("sha256d(preimage)"):
            with cs.namespace("first"):
                mid = sha256.sha256(cs, flip_bytes(preimage_bits))
            with cs.namespace("second"):
                out = sha256.sha256(cs, mid)
        hash_bits = flip_bytes(out)

        multipack.pack_into_inputs(cs, hash_bits)


def test_satisfiable_and_inputs_match():
    rng = random.Random(0)
    preimage = bytes(rng.getrandbits(8) for _ in range(MyCircuit.PREIMAGE_LEN))
    cs = TestConstraintSystem(Fr)
    MyCircuit(preimage).synthesize(cs)
    assert cs.is_satisfied()
    hash_bits = multipack.bytes_to_bits_le(sha256d(preimage))
    expected = multipack.compute_multipacking(Fr, hash_bits)
    assert cs.verify(expected)


@pytest.mark.slow
def test_groth16_roundtrip():
    # ~52k constraints: CRS generation runs on the DEVICE generator (the
    # host oracle would take ~an hour in pure Python at this size)
    from bellman_tpu.ops.generator import generate_random_parameters_on_device

    from bellman_tpu.ops.prover import (
        DeviceParameters, create_random_proof_on_device,
    )

    rng = random.Random(1)
    preimage = bytes(rng.getrandbits(8) for _ in range(MyCircuit.PREIMAGE_LEN))
    params = generate_random_parameters_on_device(ENGINE, MyCircuit(), rng)
    pvk = prepare_verifying_key(ENGINE, params.vk)
    proof = create_random_proof_on_device(
        ENGINE, MyCircuit(preimage), DeviceParameters(ENGINE, params), rng
    )
    hash_bits = multipack.bytes_to_bits_le(sha256d(preimage))
    inputs = multipack.compute_multipacking(Fr, hash_bits)
    verify_proof(pvk, proof, inputs)
