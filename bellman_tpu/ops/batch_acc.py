"""Device batch-verifier accumulation.

The reference's batch verifier accumulates, per item j with random
weight z_j: Miller terms (z_j*A_j, -B_j), Delta = sum z_j*C_j,
Gamma_i = sum z_j*input_{j,i}, Y = sum z_j, then closes with
(Delta, delta), (Psi = sum Gamma_i*ic_i, gamma), (Y*alpha, beta)
(/root/reference/groth16/src/verifier/batch.rs:100-172, multicore
variant :182-285). Its parallel path is a rayon chunk map-reduce.

TPU-native equivalent: the z_j*A_j and z_j*C_j scalar multiplications
run as ONE lane-batched double-and-add over the item axis (255 steps of
branchless Jacobian double+add on (limb, n) arrays), Delta and
Psi = MSM(ic, Gamma) reduce with the existing pairwise tree fold, and
only the Miller loops stay on the host (native C++ pairing). Gamma/Y
are plain field sums (host bigint, negligible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import curve, limbs
from .curve import CurveOps


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _batch_mul(ops: CurveOps, nbits: int, w: int, pts, z_limbs):
    """pts * z lane-wise: MSB-first double-and-add over the batch axis.

    pts: Jacobian batch (..., n); z_limbs: (Lz, n) plain uint32 limbs of
    width w. Data-independent schedule (every lane runs all nbits
    steps), so one scan-body compile covers any batch size.
    """

    def body(acc, i):
        bit = (z_limbs[i // w] >> (i % w)) & 1
        acc = ops.double(acc)
        added = ops.add(acc, pts)
        return ops.select(bit.astype(bool), added, acc), None

    batch = pts[2].shape[len(ops.f.coeff_shape):]
    acc0 = ops.infinity(batch)
    idx = jnp.arange(nbits - 1, -1, -1, dtype=jnp.int32)
    acc, _ = jax.lax.scan(body, acc0, idx)
    return acc


def _fr_limbs(vals) -> jnp.ndarray:
    return jnp.asarray(
        limbs.spec_for("bls_fr").to_limbs([int(v) for v in vals])
    )


def device_accumulate(engine, items, vk, zs):
    """All device-side accumulation for one batch: returns
    (ml_terms, delta_acc, psi, y_acc) ready for the closing pairing.

    zs: one field weight per item (caller draws them from a CSPRNG —
    soundness needs z unpredictable to the prover)."""
    field = engine.Fr
    n = len(items)
    assert len(zs) == n and n > 0

    # Gamma_i = sum_j z_j * input_{j,i}  (host field sums, O(n*ic))
    gammas = [field.zero()] * len(vk.ic)
    y_acc = field.zero()
    for it, z in zip(items, zs):
        gammas[0] = gammas[0] + z
        for i, a_i in enumerate(it.inputs):
            gammas[i + 1] = gammas[i + 1] + z * a_i
        y_acc = y_acc + z

    # one batched double-and-add covering the z*A lanes, the z*C lanes,
    # and the Gamma_i*ic_i lanes; Delta and Psi tree-fold on device
    from ..algebra import bls12_381 as bls

    ops = curve.g1_ops()
    nbits = field.MODULUS.bit_length()
    pts = (
        [it.proof.a for it in items]
        + [it.proof.c for it in items]
        + list(vk.ic)
    )
    ws = list(zs) + list(zs) + gammas
    dev = curve.g1_to_device(pts)
    out = _batch_mul(
        ops, nbits, limbs.spec_for("bls_fr").w, dev, _fr_limbs(ws)
    )
    za_dev = tuple(c[..., :n] for c in out)
    delta_dev = ops.tree_reduce(tuple(c[..., n : 2 * n] for c in out))
    psi_dev = ops.tree_reduce(tuple(c[..., 2 * n :] for c in out))
    za = curve.jacobian_to_host(ops, za_dev, bls.G1Affine)
    delta_acc = curve.jacobian_to_host(ops, delta_dev, bls.G1Affine)[0]
    psi = curve.jacobian_to_host(ops, psi_dev, bls.G1Affine)[0]
    ml_terms = [(a, -it.proof.b) for a, it in zip(za, items)]
    return ml_terms, delta_acc, psi, y_acc
