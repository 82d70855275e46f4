"""TPU Groth16 prover: the h-pipeline + 8-MSM schedule on device.

Runs the exact prover schedule of /root/reference/groth16/src/prover.rs:
182-361 — witness synthesis host-side (it is serial in the reference
too), then the QAP quotient h(x) via 7 device FFT passes, then the 8
multi-scalar multiplications (h, l, a_inputs, a_aux, b_g1_inputs,
b_g1_aux, b_g2_inputs, b_g2_aux) as device Pippenger kernels, with
density-filtered queries compacted host-side (the Source::skip semantics
of /root/reference/src/multiexp.rs:26-31). Proofs are bit-identical to
the host oracle (and hence to the reference's serialization format).

Engine backends:
* ``BlsBackend`` — BLS12-381: G1/G2 limb-vector Jacobian kernels.
* ``DummyBackend`` — the F_64513 mock engine; the "MSM" is a device
  inner product, which exercises the full device pipeline in tests at
  toy scale (the reference's DummyEngine trick, SURVEY.md §4).

XLA dispatch is asynchronous, so the 8 MSM kernel launches overlap
naturally — the host blocks only when proof assembly pulls the 8 result
points, mirroring the reference's Waiter futures
(/root/reference/src/multicore.rs:33-76).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import bls12_381 as bls
from ..algebra.engine import DummyEngine, Bls12_381Engine, DummyG
from ..r1cs import UnexpectedIdentity
from ..groth16.types import Proof
from ..groth16.prover import synthesize_for_proving
from ..multicore import Waiter
from . import curve, fft, limbs, msm2, msm3


class BlsBackend:
    """CRS bases live on device as PackedBases (packed once at upload);
    each MSM dispatches the tree-fold pipeline (ops/msm3.py) and returns
    a pending handle — the host blocks only when proof assembly pulls
    the window totals."""

    engine = Bls12_381Engine
    fr_spec = limbs.spec_for("bls_fr")

    def upload_g1(self, points):
        for p in points:
            if p.is_identity():
                raise UnexpectedIdentity("identity base in multiexp")
        return msm2.PackedBases(curve.g1_ops(), curve.g1_to_device(points))

    def upload_g2(self, points):
        for p in points:
            if p.is_identity():
                raise UnexpectedIdentity("identity base in multiexp")
        return msm2.PackedBases(curve.g2_ops(), curve.g2_to_device(points))

    def slice_bases(self, dev, start, stop):
        return dev.slice(start, stop)

    def msm_g1(self, bases_dev, exp_limbs):
        ops = curve.g1_ops()
        pending = msm3.msm3_start(ops, bases_dev, exp_limbs)
        return Waiter(
            pending, finish=lambda p: msm3.msm3_finish(ops, p, bls.G1Affine)
        )

    def msm_g2(self, bases_dev, exp_limbs):
        # G2 runs the XLA-only jnp pipeline graph by default: the Fq2
        # Pallas fold kernels wedge the Mosaic compile service at group
        # shapes (r5 probe: >40 min, no completion; the tiny-shape
        # variant hard-aborts — r4 logs/prover_bench_20e.err). The jnp
        # graph compiles and runs fine on TPU; G2 is 2 of the 8 MSM
        # queries, so the VPU-efficiency gap is bounded. Override with
        # BELLMAN_TPU_MSM_G2_MODE=pallas when the kernels are fixed.
        import os

        mode = os.environ.get("BELLMAN_TPU_MSM_G2_MODE", "jnp")
        if mode == "default":
            mode = None
        ops = curve.g2_ops()
        pending = msm3.msm3_start(ops, bases_dev, exp_limbs, mode=mode)
        return Waiter(
            pending, finish=lambda p: msm3.msm3_finish(ops, p, bls.G2Affine)
        )


class DummyBackend:
    engine = DummyEngine
    fr_spec = limbs.FieldSpec("dummy", 64513)

    def upload_g1(self, points):
        for p in points:
            if p.is_identity():
                raise UnexpectedIdentity("identity base in multiexp")
        return jnp.asarray(self.fr_spec.to_mont_host([int(p.v) for p in points]))

    upload_g2 = upload_g1

    def slice_bases(self, dev, start, stop):
        return dev[..., start:stop]

    def _msm(self, bases_dev, exp_limbs):
        exps_mont = limbs.to_mont(self.fr_spec, exp_limbs)
        res = msm2.dummy_inner_product(self.fr_spec, bases_dev, exps_mont)
        return Waiter(
            res,
            finish=lambda v: DummyG(self.fr_spec.from_mont_host(v)[0]),
        )

    msm_g1 = _msm
    msm_g2 = _msm


_BACKENDS = {}


def get_backend(engine):
    b = _BACKENDS.get(engine.name)
    if b is None:
        b = DummyBackend() if engine.name == "dummy" else BlsBackend()
        _BACKENDS[engine.name] = b
    return b


class DeviceParameters:
    """CRS resident on device: upload once, prove many times.

    Exposes the ParameterSource splitting semantics
    (/root/reference/groth16/src/lib.rs:411-474)."""

    def __init__(self, engine, params, backend=None):
        self.engine = engine
        self.backend = backend or get_backend(engine)
        self.vk = params.vk
        b = self.backend
        self.h = b.upload_g1(params.h)
        self.n_h = len(params.h)
        self.l = b.upload_g1(params.l)
        self.a = b.upload_g1(params.a)
        self.b_g1 = b.upload_g1(params.b_g1)
        self.b_g2 = b.upload_g2(params.b_g2)

    @classmethod
    def from_device_queries(cls, engine, vk, h, l, a, b_g1, b_g2):
        """Wrap already-device-resident CRS queries (msm2.PackedBases)
        without any host point round-trip — the output format of the
        device-CRS generator (ops.generator.generate_parameters_device_crs)."""
        self = cls.__new__(cls)
        self.engine = engine
        self.backend = get_backend(engine)
        self.vk = vk
        self.h = h
        self.n_h = h.n
        self.l = l
        self.a = a
        self.b_g1 = b_g1
        self.b_g2 = b_g2
        return self

    def get_vk(self, _num_ic):
        return self.vk

    def to_host_parameters(self):
        """Pull the device CRS back to host Parameters (for
        serialization / parity tests; O(n) host conversion)."""
        from ..groth16.types import Parameters

        e = self.engine

        def pull(q, ops, cls_):
            C = msm2._C(ops)
            x, y = msm2._unpack_coords(C, q.packed)
            one = jnp.broadcast_to(
                jnp.asarray(ops.f.spec.one_mont), x[: ops.f.spec.L].shape
            )
            z = jnp.zeros_like(x)
            z = z.at[: ops.f.spec.L].set(
                jnp.where(q.inf_mask[None, :], 0, one)
            )
            shape = ops.f.coeff_shape + (q.n,)
            p = (x.reshape(shape), y.reshape(shape), z.reshape(shape))
            return curve.jacobian_to_host(ops, p, cls_)

        g1c, g2c = e.G1, e.G2
        return Parameters(
            vk=self.vk,
            h=pull(self.h, curve.g1_ops(), g1c),
            l=pull(self.l, curve.g1_ops(), g1c),
            a=pull(self.a, curve.g1_ops(), g1c),
            b_g1=pull(self.b_g1, curve.g1_ops(), g1c),
            b_g2=pull(self.b_g2, curve.g2_ops(), g2c),
        )


def _compact(assignment, density):
    """Host-side density filtering: the exponents whose density bit is
    set, as plain ints."""
    return [int(v) for v, bit in zip(assignment, density.bv) if bit]


def create_proof_on_device(engine, circuit, params: DeviceParameters, r, s):
    """Device-accelerated create_proof; bit-identical to the host oracle
    (groth16.prover.create_proof)."""
    backend = params.backend
    field = engine.Fr
    spec = backend.fr_spec
    prover = synthesize_for_proving(engine, circuit)

    vk = params.get_vk(len(prover.input_assignment))
    if vk.delta_g1.is_identity() or vk.delta_g2.is_identity():
        raise UnexpectedIdentity("delta is the identity; CRS is subverted")

    # -- h(x) on device ------------------------------------------------------
    m = len(prover.a)
    exp = (m - 1).bit_length() if m > 1 else 0
    n = 1 << exp
    plan = fft.get_plan(spec, field, exp)

    def dev_scalars(vals, pad_to):
        arr = spec.to_limbs([int(v) for v in vals])
        if arr.shape[1] < pad_to:
            arr = np.pad(arr, ((0, 0), (0, pad_to - arr.shape[1])))
        return limbs.to_mont(spec, jnp.asarray(arr))

    da = dev_scalars(prover.a, n)
    db = dev_scalars(prover.b, n)
    dc = dev_scalars(prover.c, n)
    h_mont = fft.h_pipeline(plan, da, db, dc)
    h_plain = limbs.from_mont(spec, h_mont)[:, : n - 1]  # drop top coeff

    # -- the 8 MSMs (async dispatch; host blocks at assembly) ---------------
    num_inputs = len(prover.input_assignment)
    input_ints = [int(v) for v in prover.input_assignment]
    aux_ints = [int(v) for v in prover.aux_assignment]

    bk = backend
    if n > 1:
        h_bases = bk.slice_bases(params.h, 0, n - 1)
        h_res = bk.msm_g1(h_bases, h_plain)
    else:
        h_res = None

    l_res = (
        bk.msm_g1(params.l, jnp.asarray(spec.to_limbs(aux_ints)))
        if aux_ints
        else None
    )

    a_aux_exp = _compact(prover.aux_assignment, prover.a_aux_density)
    a_in = bk.slice_bases(params.a, 0, num_inputs)
    a_aux = bk.slice_bases(params.a, num_inputs, num_inputs + len(a_aux_exp))
    a_in_res = bk.msm_g1(a_in, jnp.asarray(spec.to_limbs(input_ints)))
    a_aux_res = (
        bk.msm_g1(a_aux, jnp.asarray(spec.to_limbs(a_aux_exp)))
        if a_aux_exp
        else None
    )

    b_in_exp = _compact(prover.input_assignment, prover.b_input_density)
    b_aux_exp = _compact(prover.aux_assignment, prover.b_aux_density)
    nb_in = len(b_in_exp)

    def b_msm(bases, fn):
        b_in = bk.slice_bases(bases, 0, nb_in)
        b_aux = bk.slice_bases(bases, nb_in, nb_in + len(b_aux_exp))
        r_in = fn(b_in, jnp.asarray(spec.to_limbs(b_in_exp))) if b_in_exp else None
        r_aux = fn(b_aux, jnp.asarray(spec.to_limbs(b_aux_exp))) if b_aux_exp else None
        return r_in, r_aux

    b1_in_res, b1_aux_res = b_msm(params.b_g1, bk.msm_g1)
    b2_in_res, b2_aux_res = b_msm(params.b_g2, bk.msm_g2)

    # -- proof assembly (host; first blocking pulls) -------------------------
    G1, G2 = engine.G1, engine.G2

    def pull_g1(res):
        return res.wait() if res is not None else G1.identity()

    def pull_g2(res):
        return res.wait() if res is not None else G2.identity()

    h_pt = pull_g1(h_res)
    l_pt = pull_g1(l_res)
    a_answer = pull_g1(a_in_res) + pull_g1(a_aux_res)
    b1_answer = pull_g1(b1_in_res) + pull_g1(b1_aux_res)
    b2_answer = pull_g2(b2_in_res) + pull_g2(b2_aux_res)

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


def create_random_proof_on_device(engine, circuit, params, rng):
    r = engine.Fr(rng.randrange(engine.Fr.MODULUS))
    s = engine.Fr(rng.randrange(engine.Fr.MODULUS))
    return create_proof_on_device(engine, circuit, params, r, s)


def create_proof_compiled(engine, compiled, input_limbs, aux_limbs,
                          params: DeviceParameters, r, s):
    """Prove with a CompiledCircuit and vectorized witness vectors.

    ``input_limbs``/``aux_limbs``: plain-form (L, n) uint32 limb arrays
    (numpy or device). Replaces the per-proof Python synthesis with the
    device sparse-matvec of ops.r1cs_eval; otherwise runs the exact
    schedule of create_proof_on_device and produces bit-identical
    proofs (see tests/test_compiled.py)."""
    import numpy as _np

    from . import r1cs_eval

    backend = params.backend
    field = engine.Fr
    spec = backend.fr_spec

    vk = params.get_vk(compiled.num_inputs)
    if vk.delta_g1.is_identity() or vk.delta_g2.is_identity():
        raise UnexpectedIdentity("delta is the identity; CRS is subverted")

    input_limbs = jnp.asarray(input_limbs)
    aux_limbs = jnp.asarray(aux_limbs)
    witness_mont = r1cs_eval.witness_to_mont(spec, input_limbs, aux_limbs)

    (Ka, ia, ca), (Kb, ib, cb), (Kc, ic_, cc) = compiled.device_matrices(
        spec
    )
    m = compiled.num_constraints
    exp = (m - 1).bit_length() if m > 1 else 0
    n = 1 << exp
    plan = fft.get_plan(spec, field, exp)

    def pad(x):
        if x.shape[-1] < n:
            return jnp.pad(x, ((0, 0), (0, n - x.shape[-1])))
        return x

    da = pad(r1cs_eval.eval_matrix(spec, Ka, ia, ca, witness_mont))
    db = pad(r1cs_eval.eval_matrix(spec, Kb, ib, cb, witness_mont))
    dc = pad(r1cs_eval.eval_matrix(spec, Kc, ic_, cc, witness_mont))
    h_mont = fft.h_pipeline(plan, da, db, dc)
    h_plain = limbs.from_mont(spec, h_mont)[:, : n - 1]

    bk = backend
    num_inputs = compiled.num_inputs
    aux_np = _np.asarray(jax.device_get(aux_limbs))
    in_np = _np.asarray(jax.device_get(input_limbs))

    def mask_cols(arr, density):
        mask = _np.asarray(density.bv, dtype=bool)
        return jnp.asarray(arr[:, mask])

    if n > 1:
        h_res = bk.msm_g1(bk.slice_bases(params.h, 0, n - 1), h_plain)
    else:
        h_res = None

    l_res = bk.msm_g1(params.l, aux_limbs) if compiled.num_aux else None

    a_aux_exp = mask_cols(aux_np, compiled.a_aux_density)
    a_in = bk.slice_bases(params.a, 0, num_inputs)
    a_aux = bk.slice_bases(
        params.a, num_inputs, num_inputs + a_aux_exp.shape[-1]
    )
    a_in_res = bk.msm_g1(a_in, input_limbs)
    a_aux_res = (
        bk.msm_g1(a_aux, a_aux_exp) if a_aux_exp.shape[-1] else None
    )

    b_in_exp = mask_cols(in_np, compiled.b_input_density)
    b_aux_exp = mask_cols(aux_np, compiled.b_aux_density)
    nb_in = b_in_exp.shape[-1]

    def b_msm(bases, fn):
        b_in = bk.slice_bases(bases, 0, nb_in)
        b_aux = bk.slice_bases(bases, nb_in, nb_in + b_aux_exp.shape[-1])
        r_in = fn(b_in, b_in_exp) if nb_in else None
        r_aux = fn(b_aux, b_aux_exp) if b_aux_exp.shape[-1] else None
        return r_in, r_aux

    b1_in_res, b1_aux_res = b_msm(params.b_g1, bk.msm_g1)
    b2_in_res, b2_aux_res = b_msm(params.b_g2, bk.msm_g2)

    G1, G2 = engine.G1, engine.G2

    def pull_g1(res):
        return res.wait() if res is not None else G1.identity()

    def pull_g2(res):
        return res.wait() if res is not None else G2.identity()

    h_pt = pull_g1(h_res)
    l_pt = pull_g1(l_res)
    a_answer = pull_g1(a_in_res) + pull_g1(a_aux_res)
    b1_answer = pull_g1(b1_in_res) + pull_g1(b1_aux_res)
    b2_answer = pull_g2(b2_in_res) + pull_g2(b2_aux_res)

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
