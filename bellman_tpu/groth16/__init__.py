"""Groth16 proving system (host oracle + TPU device path).

Public surface mirrors /root/reference/groth16/src/lib.rs:21-30:
generate_(random_)parameters, create_(random_)proof,
prepare_verifying_key, verify_proof, batch verification, and
Proof/VerifyingKey/Parameters with byte-compatible read/write.
"""

from .types import Proof, VerifyingKey, Parameters
from .generator import generate_parameters, generate_random_parameters, KeypairAssembly
from .prover import create_proof, create_random_proof, ProvingAssignment
from .verifier import prepare_verifying_key, verify_proof, PreparedVerifyingKey
from . import batch

__all__ = [
    "Proof", "VerifyingKey", "Parameters",
    "generate_parameters", "generate_random_parameters", "KeypairAssembly",
    "create_proof", "create_random_proof", "ProvingAssignment",
    "prepare_verifying_key", "verify_proof", "PreparedVerifyingKey",
    "batch",
]
