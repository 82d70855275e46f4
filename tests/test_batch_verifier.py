"""Batch verifier tests (both schedules), ported from the reference's
batch path exercised in groth16/tests/mimc.rs:105-207."""

import random

import pytest

from bellman_tpu.algebra.engine import DummyEngine, Bls12_381Engine
from bellman_tpu.groth16 import (
    batch, create_proof, create_random_proof, generate_random_parameters,
    prepare_verifying_key,
)
from bellman_tpu.r1cs import (
    Circuit, AssignmentMissing, VerificationError, get_value,
)


class SquareDemo(Circuit):
    """x * x = y with y public."""

    def __init__(self, x=None):
        self.x = x

    def synthesize(self, cs):
        x = cs.alloc("x", lambda: get_value(self.x))
        y = cs.alloc_input(
            "y", lambda: get_value(self.x).square()
        )
        cs.enforce("square", cs.lc() + x, cs.lc() + x, cs.lc() + y)


@pytest.mark.parametrize("engine", [DummyEngine, Bls12_381Engine],
                         ids=["dummy", "bls12_381"])
@pytest.mark.parametrize("schedule", ["single_z", "chunked"])
def test_batch_verify_accepts_valid_and_rejects_invalid(engine, schedule):
    Fr = engine.Fr
    rng = random.Random(7)
    n_items = 4 if engine is Bls12_381Engine else 20

    params = generate_random_parameters(engine, SquareDemo(), rng)
    pvk = prepare_verifying_key(engine, params.vk)

    proofs = []
    for _ in range(n_items):
        x = Fr.random(rng)
        proof = create_random_proof(engine, SquareDemo(x=x), params, rng)
        proofs.append((proof, [x.square()]))

    def run(items):
        v = batch.Verifier(engine)
        for proof, inputs in items:
            v.queue(proof, inputs)
        if schedule == "single_z":
            v.verify(rng, params.vk)
        else:
            v.verify_chunked(params.vk, rng, chunk_size=8)

    run(proofs)  # all valid -> accepts

    # single-verify fallback works per item
    batch.Item(*proofs[0]).verify_single(pvk)

    # corrupt one statement -> the whole batch is rejected
    bad = list(proofs)
    good_proof, _ = bad[1]
    bad[1] = (good_proof, [Fr.random(rng)])
    with pytest.raises(VerificationError):
        run(bad)

    # wrong input count -> InvalidVerifyingKey
    bad2 = list(proofs)
    bad2[0] = (bad2[0][0], [])
    with pytest.raises(VerificationError):
        run(bad2)


@pytest.mark.slow
def test_batch_verify_device_accumulation():
    """verify_device (ops/batch_acc.py): the lane-batched double-and-add
    + device tree folds accept valid batches and reject a corrupted
    statement, matching the host schedule's verdicts."""
    engine = Bls12_381Engine
    Fr = engine.Fr
    rng = random.Random(7)

    params = generate_random_parameters(engine, SquareDemo(), rng)
    proofs = []
    for _ in range(3):
        x = Fr.random(rng)
        proof = create_random_proof(engine, SquareDemo(x=x), params, rng)
        proofs.append((proof, [x.square()]))

    def run(items):
        v = batch.Verifier(engine)
        for proof, inputs in items:
            v.queue(proof, inputs)
        v.verify_device(params.vk, rng)

    run(proofs)

    bad = list(proofs)
    bad[1] = (bad[1][0], [Fr.random(rng)])
    with pytest.raises(VerificationError):
        run(bad)


def test_empty_batch_is_valid():
    rng = random.Random(1)
    params = generate_random_parameters(DummyEngine, SquareDemo(), rng)
    v = batch.Verifier(DummyEngine)
    v.verify(rng, params.vk)
    v2 = batch.Verifier(DummyEngine)
    v2.verify_chunked(params.vk, rng)
