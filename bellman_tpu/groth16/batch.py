"""Batch Groth16 proof verification (random-linear-combination batching).

Behavioral equivalent of /root/reference/groth16/src/verifier/batch.rs:
Item{proof, inputs} queueing with single-verify fallback (:40-65);
``verify``: per-item nonzero random z, Miller terms (z*A, -B), Gamma/
Delta/Y accumulators, closing terms (Delta, delta), (Psi, gamma),
(Y*alpha, beta), accepting iff the final exponentiation is the identity
(:100-172). ``verify_chunked`` mirrors verify_multicore's chunk-of-8
geometric-z schedule and monoid reduction (:182-285) — on TPU the
accumulation is a batched device reduction; the host fallback here is
the oracle.
"""

from __future__ import annotations

import secrets

from ..r1cs import InvalidVerifyingKey, InvalidProof
from .verifier import PreparedVerifyingKey, verify_proof


class Item:
    __slots__ = ("proof", "inputs")

    def __init__(self, proof, inputs):
        self.proof = proof
        self.inputs = list(inputs)

    def verify_single(self, pvk: PreparedVerifyingKey):
        return verify_proof(pvk, self.proof, self.inputs)


class Verifier:
    """Non-adaptive batch verifier: all items share one VerifyingKey."""

    def __init__(self, engine):
        self.engine = engine
        self.items = []

    def queue(self, proof, inputs):
        self.items.append(Item(proof, inputs))

    # -- helpers --------------------------------------------------------------
    def _nonzero_z(self, rng, field):
        """Soundness requires z unpredictable to the prover: rng MUST be a
        CSPRNG (the reference bounds its rng by CryptoRng,
        batch.rs:100,116). Pass rng=None to get secrets.SystemRandom;
        seeded non-crypto rngs are for deterministic tests only."""
        if rng is None:
            rng = secrets.SystemRandom()
        while True:
            z = field(rng.randrange(field.MODULUS))
            if not z.is_zero():
                return z

    def _check_input_lengths(self, vk):
        if any(len(it.inputs) + 1 != len(vk.ic) for it in self.items):
            raise InvalidVerifyingKey("wrong number of public inputs")

    def _close_and_check(self, vk, ml_terms, gammas, delta_acc, y_acc):
        engine = self.engine
        ml_terms.append((delta_acc, vk.delta_g2))
        psi = None
        for ic_i, g_i in zip(vk.ic, gammas):
            term = ic_i.mul_int(int(g_i))
            psi = term if psi is None else psi + term
        ml_terms.append((psi, vk.gamma_g2))
        ml_terms.append((vk.alpha_g1.mul_int(int(y_acc)), vk.beta_g2))

        result = engine.multi_miller_loop(ml_terms).final_exponentiation()
        if result != engine.gt_identity():
            raise InvalidProof("batched pairing equation does not hold")

    # -- verification ----------------------------------------------------------
    def verify(self, rng, vk):
        """One random z per item (batch.rs:100-172). ``rng`` must be a
        CSPRNG; pass None for secrets.SystemRandom."""
        self._check_input_lengths(vk)
        engine = self.engine
        field = engine.Fr

        ml_terms = []
        gammas = [field.zero()] * len(vk.ic)
        delta_acc = engine.G1.identity()
        y_acc = field.zero()

        for it in self.items:
            z = self._nonzero_z(rng, field)
            ml_terms.append((it.proof.a.mul_int(int(z)), -it.proof.b))
            gammas[0] = gammas[0] + z  # a_0 is implicitly 1
            for i, a_i in enumerate(it.inputs):
                gammas[i + 1] = gammas[i + 1] + z * a_i
            delta_acc = delta_acc + it.proof.c.mul_int(int(z))
            y_acc = y_acc + z

        self._close_and_check(vk, ml_terms, gammas, delta_acc, y_acc)

    def verify_device(self, vk, rng=None):
        """``verify`` with the accumulation on device: one lane-batched
        double-and-add computes every z*A, z*C, and Gamma_i*ic_i, and
        Delta/Psi tree-fold on chip (ops/batch_acc.py); only the Miller
        loops stay on the host (native pairing). Bls12_381Engine only.
        ``rng`` must be a CSPRNG; None gets secrets.SystemRandom."""
        self._check_input_lengths(vk)
        if not self.items:
            return
        engine = self.engine
        field = engine.Fr

        from ..ops.batch_acc import device_accumulate

        zs = [self._nonzero_z(rng, field) for _ in self.items]
        ml_terms, delta_acc, psi, y_acc = device_accumulate(
            engine, self.items, vk, zs
        )
        ml_terms.append((delta_acc, vk.delta_g2))
        ml_terms.append((psi, vk.gamma_g2))
        ml_terms.append((vk.alpha_g1.mul_int(int(y_acc)), vk.beta_g2))
        result = engine.multi_miller_loop(ml_terms).final_exponentiation()
        if result != engine.gt_identity():
            raise InvalidProof("batched pairing equation does not hold")

    def verify_chunked(self, vk, rng=None, chunk_size: int = 8):
        """verify_multicore's schedule: one random z per chunk of 8, item
        weights z, z^2, ... within the chunk; accumulators reduced as a
        monoid (batch.rs:182-285). ``rng`` must be a CSPRNG; None gets
        secrets.SystemRandom."""
        self._check_input_lengths(vk)
        engine = self.engine
        field = engine.Fr

        gammas = [field.zero()] * len(vk.ic)
        delta_acc = engine.G1.identity()
        y_acc = field.zero()
        ml_result = None

        for start in range(0, len(self.items), chunk_size):
            chunk = self.items[start : start + chunk_size]
            z = self._nonzero_z(rng, field)
            cur_z = z
            ml_terms = []
            for it in chunk:
                gammas[0] = gammas[0] + cur_z
                for i, a_i in enumerate(it.inputs):
                    gammas[i + 1] = gammas[i + 1] + cur_z * a_i
                delta_acc = delta_acc + it.proof.c.mul_int(int(cur_z))
                y_acc = y_acc + cur_z
                ml_terms.append((it.proof.a.mul_int(int(cur_z)), -it.proof.b))
                cur_z = cur_z * z
            part = engine.multi_miller_loop(ml_terms)
            ml_result = part if ml_result is None else ml_result + part

        if ml_result is None:
            return  # empty batch is trivially valid (batch.rs:259)

        closing = engine.multi_miller_loop(
            [
                (delta_acc, vk.delta_g2),
                (
                    _sum_points(
                        [ic.mul_int(int(g)) for ic, g in zip(vk.ic, gammas)],
                        engine.G1,
                    ),
                    vk.gamma_g2,
                ),
                (vk.alpha_g1.mul_int(int(y_acc)), vk.beta_g2),
            ]
        )
        total = (ml_result + closing).final_exponentiation()
        if total != engine.gt_identity():
            raise InvalidProof("batched pairing equation does not hold")


def _sum_points(points, group):
    acc = group.identity()
    for p in points:
        acc = acc + p
    return acc
