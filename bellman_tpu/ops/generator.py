"""Device-accelerated Groth16 trusted setup.

The generator's hot loops (/root/reference/groth16/src/generator.rs,
SURVEY.md §3.1) are (1) the tau-power evaluation, (2) the wNAF
fixed-base exponentiations for H/A/B/IC/L (dominant), and (3) the iFFT
from tau powers to Lagrange coefficients. On device:

* powers of tau: log n doubling steps (ops.fft.geometric_powers)
* tau powers -> Lagrange: the device iFFT
* all CRS exponentiations: fixed-base window tables (ops.fixed_base)
  with one batched normalization per query

Per-variable QAP evaluations u_i/v_i/w_i stay host-side (a sparse
scatter over the symbolic (coeff, constraint) lists — synthesis-bound,
like the reference's eval()). The output Parameters are identical to
the host oracle's (zero points filtered from A/B, generator.rs:490-505;
unconstrained aux rejected, :464-470).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.engine import DummyEngine
from ..r1cs import UnexpectedIdentity, UnconstrainedVariable, Variable
from ..groth16.types import Parameters, VerifyingKey
from ..groth16.generator import KeypairAssembly
from . import curve, fft, fixed_base, limbs, msm


def generate_parameters_on_device(
    engine, circuit, g1, g2, alpha, beta, gamma, delta, tau, window_c: int = 8
) -> Parameters:
    field = engine.Fr
    if engine is DummyEngine or engine.name == "dummy":
        # The mock engine's "exponentiation" is a field multiply; the host
        # oracle is already optimal at test scale.
        from ..groth16.generator import generate_parameters

        return generate_parameters(
            engine, circuit, g1, g2, alpha, beta, gamma, delta, tau
        )

    assembly = KeypairAssembly(field)
    assembly.alloc_input("", lambda: field.one())
    circuit.synthesize(assembly)
    for i in range(assembly.num_inputs):
        assembly.enforce(
            "", assembly.lc() + Variable.input(i), assembly.lc(), assembly.lc()
        )

    gamma_inverse = gamma.invert()
    delta_inverse = delta.invert()
    if gamma_inverse is None or delta_inverse is None:
        raise UnexpectedIdentity("gamma/delta must be invertible")

    m = assembly.num_constraints
    exp = (m - 1).bit_length() if m > 1 else 0
    n = 1 << exp
    spec = limbs.spec_for("bls_fr")
    plan = fft.get_plan(spec, field, exp)

    # -- powers of tau and Lagrange coefficients (device) --------------------
    tau_mont = jnp.asarray(spec.to_mont_host([int(tau)]))
    powers = fft.geometric_powers(spec, tau_mont, exp)  # (L, n) Montgomery
    lagrange_mont = plan.ifft(powers)
    lagrange = [field(v) for v in spec.from_mont_host(lagrange_mont)]

    # -- fixed-base tables ----------------------------------------------------
    bits = spec.L * spec.w
    t_g1 = fixed_base.FixedBaseTable(curve.g1_ops(), g1, bits, c=window_c)
    t_g2 = fixed_base.FixedBaseTable(curve.g2_ops(), g2, bits, c=window_c)

    def _pad_pow2(ints):
        """Pad to >=64 power-of-two with zero scalars (table[w][0] is the
        identity, so pads are inert) — shape-caches the apply/normalize
        kernels across the CRS's differently-sized queries."""
        k = max(64, 1 << (len(ints) - 1).bit_length())
        return ints + [0] * (k - len(ints))

    def exp_g1(scalars):
        if not scalars:
            return []
        ints = _pad_pow2([int(s) for s in scalars])
        sl = jnp.asarray(spec.to_limbs(ints))
        packed = t_g1.apply(sl)
        xa, ya, inf = fixed_base.batch_to_affine(curve.g1_ops(), packed)
        return fixed_base.to_host_affine(
            curve.g1_ops(), xa, ya, inf, engine.G1
        )[: len(scalars)]

    def exp_g2(scalars):
        if not scalars:
            return []
        ints = _pad_pow2([int(s) for s in scalars])
        sl = jnp.asarray(spec.to_limbs(ints))
        packed = t_g2.apply(sl)
        xa, ya, inf = fixed_base.batch_to_affine(curve.g2_ops(), packed)
        return fixed_base.to_host_affine(
            curve.g2_ops(), xa, ya, inf, engine.G2
        )[: len(scalars)]

    # -- H query: g1^(tau^i * t(tau) / delta), i < n-1 ------------------------
    zt = tau ** n - field.one()
    coeff = zt * delta_inverse
    taus = [field.one()]
    for _ in range(n - 2):
        taus.append(taus[-1] * tau)
    h = exp_g1([int(t * coeff) for t in taus]) if n > 1 else []

    # -- per-variable QAP evaluations (host sparse eval) ----------------------
    def eval_at_tau(terms):
        acc = field.zero()
        for coeff_, idx in terms:
            acc = acc + lagrange[idx] * coeff_
        return acc

    def eval_query(at, bt, ct, inv):
        us, vs, ws = [], [], []
        for at_i, bt_i, ct_i in zip(at, bt, ct):
            us.append(eval_at_tau(at_i))
            vs.append(eval_at_tau(bt_i))
            ws.append(eval_at_tau(ct_i))
        exts = [(u * beta + v * alpha + w) * inv for u, v, w in zip(us, vs, ws)]
        return us, vs, exts

    u_in, v_in, ic_s = eval_query(
        assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs, gamma_inverse
    )
    u_aux, v_aux, l_s = eval_query(
        assembly.at_aux, assembly.bt_aux, assembly.ct_aux, delta_inverse
    )

    for e in l_s:
        if e.is_zero():
            raise UnconstrainedVariable("auxiliary variable is unconstrained")

    # -- CRS exponentiations (device, batched per query) ----------------------
    a_scalars = [u for u in u_in + u_aux if not u.is_zero()]
    b_scalars = [v for v in v_in + v_aux if not v.is_zero()]
    a_pts = exp_g1(a_scalars)
    b_g1 = exp_g1(b_scalars)
    b_g2 = exp_g2(b_scalars)
    ic = exp_g1(ic_s)
    l = exp_g1(l_s)

    vk = VerifyingKey(
        alpha_g1=g1.mul_int(int(alpha)),
        beta_g1=g1.mul_int(int(beta)),
        beta_g2=g2.mul_int(int(beta)),
        gamma_g2=g2.mul_int(int(gamma)),
        delta_g1=g1.mul_int(int(delta)),
        delta_g2=g2.mul_int(int(delta)),
        ic=ic,
    )
    return Parameters(vk=vk, h=h, l=l, a=a_pts, b_g1=b_g1, b_g2=b_g2)


def generate_random_parameters_on_device(engine, circuit, rng) -> Parameters:
    field = engine.Fr
    g1 = engine.G1.generator().mul_int(rng.randrange(1, field.MODULUS))
    g2 = engine.G2.generator().mul_int(rng.randrange(1, field.MODULUS))
    alpha = field(rng.randrange(1, field.MODULUS))
    beta = field(rng.randrange(1, field.MODULUS))
    gamma = field(rng.randrange(1, field.MODULUS))
    delta = field(rng.randrange(1, field.MODULUS))
    tau = field(rng.randrange(1, field.MODULUS))
    return generate_parameters_on_device(
        engine, circuit, g1, g2, alpha, beta, gamma, delta, tau
    )
