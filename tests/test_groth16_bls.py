"""Groth16 end-to-end over real BLS12-381 (host oracle path).

Ports the serialization round-trip test with its byte-size pins
(/root/reference/groth16/src/lib.rs:486-567: params = 2,136 bytes for the
one-constraint circuit, proof = 192 bytes)."""

import random

import pytest

from bellman_tpu.r1cs import (
    Circuit, AssignmentMissing, VerificationError, get_value,
)
from bellman_tpu.algebra.engine import Bls12_381Engine
from bellman_tpu.groth16 import (
    generate_random_parameters, create_random_proof, create_proof,
    prepare_verifying_key, verify_proof, Parameters, Proof,
)


class MySillyCircuit(Circuit):
    """a * b = c with c public (lib.rs:489-515)."""

    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def synthesize(self, cs):
        a = cs.alloc("a", lambda: get_value(self.a))
        b = cs.alloc("b", lambda: get_value(self.b))
        c = cs.alloc_input(
            "c", lambda: get_value(self.a) * get_value(self.b)
        )
        cs.enforce("a*b=c", cs.lc() + a, cs.lc() + b, cs.lc() + c)


@pytest.mark.slow
def test_serialization_and_e2e():
    engine = Bls12_381Engine
    Fr = engine.Fr
    rng = random.Random(0xBE11)

    params = generate_random_parameters(engine, MySillyCircuit(), rng)

    v = params.to_bytes()
    assert len(v) == 2136  # lib.rs:529

    de_checked = Parameters.from_bytes(v, engine, checked=True)
    assert params == de_checked
    de_unchecked = Parameters.from_bytes(v, engine, checked=False)
    assert params == de_unchecked

    pvk = prepare_verifying_key(engine, params.vk)

    for _ in range(2):
        a = Fr.random(rng)
        b = Fr.random(rng)
        c = a * b

        proof = create_random_proof(
            engine, MySillyCircuit(a=a, b=b), params, rng
        )
        pv = proof.to_bytes()
        assert len(pv) == 192  # lib.rs:559
        de_proof = Proof.from_bytes(pv, engine)
        assert proof == de_proof

        verify_proof(pvk, proof, [c])
        with pytest.raises(VerificationError):
            verify_proof(pvk, proof, [a])
