"""Groth16 single-proof verifier.

Behavioral equivalent of /root/reference/groth16/src/verifier.rs:11-58:
prepare_verifying_key precomputes e(alpha, beta), -gamma, -delta;
verify_proof checks
    e(A, B) * e(acc, -gamma) * e(C, -delta) == e(alpha, beta)
with acc = ic[0] + sum_i input_i * ic[i+1].
"""

from __future__ import annotations

from ..r1cs import InvalidVerifyingKey, InvalidProof


class PreparedVerifyingKey:
    __slots__ = ("engine", "alpha_g1_beta_g2", "neg_gamma_g2", "neg_delta_g2", "ic")

    def __init__(self, engine, alpha_g1_beta_g2, neg_gamma_g2, neg_delta_g2, ic):
        self.engine = engine
        self.alpha_g1_beta_g2 = alpha_g1_beta_g2
        self.neg_gamma_g2 = neg_gamma_g2
        self.neg_delta_g2 = neg_delta_g2
        self.ic = ic


def prepare_verifying_key(engine, vk) -> PreparedVerifyingKey:
    return PreparedVerifyingKey(
        engine=engine,
        alpha_g1_beta_g2=engine.pairing(vk.alpha_g1, vk.beta_g2),
        neg_gamma_g2=-vk.gamma_g2,
        neg_delta_g2=-vk.delta_g2,
        ic=list(vk.ic),
    )


def verify_proof(pvk: PreparedVerifyingKey, proof, public_inputs) -> None:
    """Raises VerificationError on failure; returns None on success."""
    if len(public_inputs) + 1 != len(pvk.ic):
        raise InvalidVerifyingKey("wrong number of public inputs")

    acc = pvk.ic[0]
    for x, ic in zip(public_inputs, pvk.ic[1:]):
        acc = acc + ic.mul_int(int(x))

    engine = pvk.engine
    result = engine.multi_miller_loop(
        [
            (proof.a, proof.b),
            (acc, pvk.neg_gamma_g2),
            (proof.c, pvk.neg_delta_g2),
        ]
    ).final_exponentiation()

    if result != pvk.alpha_g1_beta_g2:
        raise InvalidProof("pairing equation does not hold")
