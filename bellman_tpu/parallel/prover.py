"""Multi-chip Groth16 prover: sharded h-pipeline + sharded MSMs.

The single-chip device prover (ops.prover) with its two hot paths mapped
onto a jax.sharding.Mesh:

* h(x): the distributed FFT pipeline (sharding.ShardedDomainPlan) whose
  output h coefficients are CYCLIC-sharded; the h-query CRS bases are
  uploaded pre-permuted into the SAME cyclic order, so the h MSM needs
  no reshard at all (the order of an MSM's terms is irrelevant).
* the other 7 MSMs: block-sharded points/scalars, per-window local
  Pippenger + all_gather fold (sharding.sharded_msm).

Queries are padded host-side to a mesh-divisible length with identity
points and zero scalars (inert, like the single-chip power-of-two pad).
Proofs remain bit-identical to the host oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..algebra import bls12_381 as bls
from ..r1cs import UnexpectedIdentity
from ..groth16.types import Proof
from ..groth16.prover import synthesize_for_proving
from ..ops import curve, limbs, msm2
from ..ops.prover import _compact
from . import sharding
from .sharding import AXIS, ShardedDomainPlan


def _pad_to(k: int, multiple: int) -> int:
    k = max(k, 1)
    return -(-k // multiple) * multiple


class ShardedDeviceParameters:
    """CRS resident across a mesh, prove-many-times."""

    def __init__(self, engine, params, mesh, min_block: int = 128,
                 window_c: int = 8):
        assert engine.name == "bls12_381", "sharded prover is BLS-only"
        self.engine = engine
        self.mesh = mesh
        self.T = mesh.devices.size
        self.vk = params.vk
        self.spec = limbs.spec_for("bls_fr")
        self.min_block = min_block
        self.window_c = window_c
        self.batch_spec = NamedSharding(mesh, P(None, AXIS))

        n = len(params.h) + 1
        self.exp = (n - 1).bit_length() if n > 1 else 0
        assert (1 << self.exp) == n, "h query length must be 2^k - 1"
        self.plan = ShardedDomainPlan(self.spec, engine.Fr, self.exp, mesh)

        # h bases in cyclic order: gathered layout [r, q] <-> global q*T+r;
        # the missing top coefficient's slot is an inert identity pad.
        T = self.T
        order = [q * T + r for r in range(T) for q in range(n // T)]
        h_padded = [
            params.h[i] if i < n - 1 else engine.G1.identity() for i in order
        ]
        self.h = self._upload_g1(h_padded, allow_identity=True)

        self.l = self._upload_g1(params.l)
        self.a = self._upload_g1(params.a)
        self.b_g1 = self._upload_g1(params.b_g1)
        self.b_g2 = self._upload_g2(params.b_g2)
        self.n_l = len(params.l)
        self.n_a = len(params.a)
        self.n_b = len(params.b_g1)

    def _pad_points(self, points, cls):
        k = _pad_to(len(points), self.T * self.min_block)
        return list(points) + [cls.identity()] * (k - len(points))

    def _upload(self, ops, to_device, points, cls, allow_identity):
        if not allow_identity:
            for p in points:
                if p.is_identity():
                    raise UnexpectedIdentity("identity base in multiexp")
        pts = self._pad_points(points, cls)
        packed, inf = msm2.pack_points(ops, to_device(pts))
        mask_spec = NamedSharding(self.mesh, P(AXIS))
        return (
            jax.device_put(np.asarray(jax.device_get(packed)),
                           self.batch_spec),
            jax.device_put(np.asarray(jax.device_get(inf)), mask_spec),
        )

    def _upload_g1(self, points, allow_identity=False):
        return self._upload(curve.g1_ops(), curve.g1_to_device, points,
                            self.engine.G1, allow_identity)

    def _upload_g2(self, points):
        return self._upload(curve.g2_ops(), curve.g2_to_device, points,
                            self.engine.G2, False)

    # -- sharded scalar upload ------------------------------------------------
    def scalars(self, ints, pad_to):
        arr = self.spec.to_limbs([int(v) for v in ints])
        if arr.shape[1] < pad_to:
            arr = np.pad(arr, ((0, 0), (0, pad_to - arr.shape[1])))
        return jax.device_put(arr, self.batch_spec)


def _slice_cols(packed, start, stop):
    return packed[..., start:stop]


def create_proof_sharded(engine, circuit, params: ShardedDeviceParameters,
                         r, s) -> Proof:
    field = engine.Fr
    spec = params.spec
    mesh = params.mesh
    T = params.T
    prover = synthesize_for_proving(engine, circuit)

    vk = params.vk
    if vk.delta_g1.is_identity() or vk.delta_g2.is_identity():
        raise UnexpectedIdentity("delta is the identity; CRS is subverted")

    # -- h(x): distributed pipeline ------------------------------------------
    n = 1 << params.exp
    assert len(prover.a) <= n

    def block_scalars_mont(vals):
        arr = spec.to_limbs([int(v) for v in vals])
        if arr.shape[1] < n:
            arr = np.pad(arr, ((0, 0), (0, n - arr.shape[1])))
        dev = jax.device_put(arr, params.plan.block_spec)
        return limbs.to_mont(spec, dev)

    da = block_scalars_mont(prover.a)
    db = block_scalars_mont(prover.b)
    dc = block_scalars_mont(prover.c)
    h_mont_cyclic = params.plan.h_pipeline_sharded(da, db, dc)
    h_plain_cyclic = limbs.from_mont(spec, h_mont_cyclic)

    ops1, ops2 = curve.g1_ops(), curve.g2_ops()

    # h MSM: bases already cyclic-ordered; top slot has a zero coefficient
    h_pt = sharding.sharded_msm(
        ops1, params.h[0], params.h[1], h_plain_cyclic, mesh,
        bls.G1Affine, c=params.window_c
    )

    pad_unit = T * params.min_block
    num_inputs = len(prover.input_assignment)
    input_ints = [int(v) for v in prover.input_assignment]
    aux_ints = [int(v) for v in prover.aux_assignment]

    mask_spec = NamedSharding(mesh, P(AXIS))

    def q_msm(ops, query, start, stop, exps, cls):
        """MSM over query columns [start, stop) with identity padding to
        a mesh-divisible width, resharded block-wise across the mesh.
        Pad columns carry inf_mask=True (and zero scalars), so their
        packed coordinates are never gathered."""
        if not exps:
            return cls.identity()
        packed, inf = query
        assert stop - start == len(exps)
        k = _pad_to(len(exps), pad_unit)
        cols = _slice_cols(packed, start, stop)
        mask = inf[start:stop]
        pad_cols = k - (stop - start)
        if pad_cols:
            cols = jnp.concatenate(
                [cols, jnp.zeros(cols.shape[:-1] + (pad_cols,), cols.dtype)],
                axis=-1,
            )
            mask = jnp.concatenate(
                [mask, jnp.ones((pad_cols,), mask.dtype)], axis=-1
            )
        cols = jax.device_put(cols, params.batch_spec)
        mask = jax.device_put(mask, mask_spec)
        return sharding.sharded_msm(
            ops, cols, mask, params.scalars(exps, k), mesh, cls,
            c=params.window_c
        )

    # l (aux, full density)
    l_pt = q_msm(ops1, params.l, 0, params.n_l, aux_ints, bls.G1Affine)

    # a query split at num_inputs (ParameterSource semantics)
    a_aux_exp = _compact(prover.aux_assignment, prover.a_aux_density)
    a_in = q_msm(ops1, params.a, 0, num_inputs, input_ints, bls.G1Affine)
    a_aux = q_msm(
        ops1, params.a, num_inputs, num_inputs + len(a_aux_exp), a_aux_exp,
        bls.G1Affine,
    )

    b_in_exp = _compact(prover.input_assignment, prover.b_input_density)
    b_aux_exp = _compact(prover.aux_assignment, prover.b_aux_density)
    nb_in = len(b_in_exp)

    b1_in = q_msm(ops1, params.b_g1, 0, nb_in, b_in_exp, bls.G1Affine)
    b1_aux = q_msm(
        ops1, params.b_g1, nb_in, nb_in + len(b_aux_exp), b_aux_exp,
        bls.G1Affine,
    )
    b2_in = q_msm(ops2, params.b_g2, 0, nb_in, b_in_exp, bls.G2Affine)
    b2_aux = q_msm(
        ops2, params.b_g2, nb_in, nb_in + len(b_aux_exp), b_aux_exp,
        bls.G2Affine,
    )

    # -- assembly --------------------------------------------------------------
    a_answer = a_in + a_aux
    b1_answer = b1_in + b1_aux
    b2_answer = b2_in + b2_aux

    g_a = vk.delta_g1.mul_int(int(r)) + vk.alpha_g1 + a_answer
    g_b = vk.delta_g2.mul_int(int(s)) + vk.beta_g2 + b2_answer
    g_c = (
        vk.delta_g1.mul_int(int(r * s))
        + vk.alpha_g1.mul_int(int(s))
        + vk.beta_g1.mul_int(int(r))
        + a_answer.mul_int(int(s))
        + b1_answer.mul_int(int(r))
        + h_pt
        + l_pt
    )
    return Proof(a=g_a, b=g_b, c=g_c)