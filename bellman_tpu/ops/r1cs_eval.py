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
    Returns (L, m) Montgomery-form evaluations.

    The K axis is row depth. Unrolling all of K traces K gathered
    multiplies — at the CRS generator's dense-row cohorts K reaches
    2^20 (the constant-ONE variable appears in ~every constraint) and
    the trace alone ran for hours (r4 prover_bench forensics). Deep K
    therefore folds into the lane axis: K = K2 * F with K2 <= 64
    unrolled gathers at F*m lanes each, then a log2(F)-deep pairwise
    Montgomery-add reduction — same arithmetic, wider and shallower."""
    L = spec.L
    m = idx.shape[-1]
    F = 1
    while K // F > 64:
        F *= 2
    K2 = -(-K // F)  # ceil: K is arbitrary (max LC term count), not
    if F > 1:        # necessarily divisible by F — pad with zero-coeff
        pad = K2 * F - K  # rows (they gather index 0 and contribute 0)
        if pad:
            idx = jnp.concatenate(
                [idx, jnp.zeros((pad, m), idx.dtype)], axis=0
            )
            coeff_mont = jnp.concatenate(
                [coeff_mont, jnp.zeros((pad, L, m), coeff_mont.dtype)],
                axis=0,
            )
        idx = idx.reshape(K2, F * m)
        coeff_mont = coeff_mont.reshape(K2, F, L, m).transpose(
            0, 2, 1, 3
        ).reshape(K2, L, F * m)
    acc = None
    for k in range(K2):
        w = jnp.take(witness_mont, idx[k], axis=1)
        t = limbs.mont_mul_hot(spec, w, coeff_mont[k])
        acc = t if acc is None else limbs.add_hot(spec, acc, t)
    while F > 1:
        F //= 2
        a = acc.reshape(L, 2, F * m)
        acc = limbs.add_hot(spec, a[:, 0], a[:, 1])
    return acc


@functools.partial(jax.jit, static_argnums=0)
def witness_to_mont(spec: FieldSpec, input_limbs, aux_limbs):
    """Plain-form (L, ni)/(L, na) limb arrays -> one Montgomery witness
    vector (L, ni+na)."""
    w = jnp.concatenate([input_limbs, aux_limbs], axis=1)
    return limbs.to_mont(spec, w)
