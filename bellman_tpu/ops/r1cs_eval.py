"""Device evaluation of compiled R1CS matrices: a/b/c = M w.

The per-proof replacement for ProvingAssignment's serial LC evaluation
(/root/reference/groth16/src/prover.rs:19-55): K gathered Montgomery
multiplies and modular adds at full lane width, K = padded row width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import limbs
from .limbs import FieldSpec


@functools.partial(jax.jit, static_argnums=(0, 1))
def eval_matrix(spec: FieldSpec, K: int, idx, coeff_mont, witness_mont):
    """idx (K, m) int32; coeff_mont (K, L, m); witness_mont (L, nvars).
    Returns (L, m) Montgomery-form evaluations."""
    acc = None
    for k in range(K):
        w = jnp.take(witness_mont, idx[k], axis=1)
        t = limbs.mont_mul_hot(spec, w, coeff_mont[k])
        acc = t if acc is None else limbs.add_hot(spec, acc, t)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def witness_to_mont(spec: FieldSpec, input_limbs, aux_limbs):
    """Plain-form (L, ni)/(L, na) limb arrays -> one Montgomery witness
    vector (L, ni+na)."""
    w = jnp.concatenate([input_limbs, aux_limbs], axis=1)
    return limbs.to_mont(spec, w)
