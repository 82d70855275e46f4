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
from . import curve, fft, fixed_base, limbs


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


def _sparse_rows_eval(spec, rows, vec_mont):
    """Device sparse matvec: out[:, i] = sum_j coeff_ij * vec[:, idx_ij].

    ``rows``: per-output lists of (coeff, index) — the KeypairAssembly's
    per-variable symbolic lists (generator.rs:376-389). Rows are grouped
    into pow2-capped cohorts by term count (like msm3's occupancy
    groups) so padding stays <= 2x and each cohort is one
    r1cs_eval.eval_matrix dispatch; cohort widths are padded to powers
    of two to bound the set of compiled shapes. Returns an (L, m)
    Montgomery device array. Everything O(total terms) runs on device;
    the host only assembles int32/limb index tables."""
    from . import r1cs_eval

    m = len(rows)
    L = spec.L
    if m == 0:
        return jnp.zeros((L, 0), jnp.uint32)
    counts = np.array([len(r) for r in rows], dtype=np.int64)
    order = np.argsort(-counts, kind="stable")
    cols = []   # (L, mg) device results, cohort by cohort
    col_src = []  # original row index per output column
    pos = 0
    while pos < m:
        cnt = int(counts[order[pos]])
        if cnt == 0:
            break  # remaining rows are all empty -> zeros
        cap = 1 << max(0, cnt - 1).bit_length()
        end = pos
        while end < m and int(counts[order[end]]) > cap // 2:
            end += 1
        sel = order[pos:end]
        mg = 1 << max(0, len(sel) - 1).bit_length()
        idx = np.zeros((cap, mg), dtype=np.int32)
        # coefficients repeat massively (0/±1 and a few circuit
        # constants shared across every instance), so limbify each
        # DISTINCT value once and gather on device — limbifying the
        # dense cap*mg slot list in Python was ~an hour of interpreter
        # time at 2^20 (r4: prover_bench setup never finished its
        # 90-min cap; 6 of these calls at ~4M slots each)
        cof_id = np.zeros((cap, mg), dtype=np.int32)
        uniq = {0: 0}
        vals = [0]
        for j, ri in enumerate(sel):
            for k, (coeff, ci) in enumerate(rows[ri]):
                idx[k, j] = ci
                cv = int(coeff)
                t = uniq.get(cv)
                if t is None:
                    t = len(vals)
                    uniq[cv] = t
                    vals.append(cv)
                cof_id[k, j] = t
        uniq_mont = limbs.to_mont(
            spec, jnp.asarray(spec.to_limbs(vals))
        )                                              # (L, U)
        cof_mont = jnp.take(
            uniq_mont, jnp.asarray(cof_id.reshape(-1)), axis=1
        ).reshape(L, cap, mg)
        cof_mont = jnp.moveaxis(cof_mont, 0, 1)  # (cap, L, mg)
        out = r1cs_eval.eval_matrix(
            spec, cap, jnp.asarray(idx), cof_mont, vec_mont
        )
        cols.append(out[:, : len(sel)])
        col_src.extend(int(i) for i in sel)
        pos = end
    if not cols:
        return jnp.zeros((L, m), jnp.uint32)
    dense = jnp.concatenate(cols, axis=1)
    # scatter back to original row order (zeros for empty rows)
    inv = np.zeros(m, dtype=np.int32)
    present = np.zeros(m, dtype=bool)
    for c_, src in enumerate(col_src):
        inv[src] = c_
        present[src] = True
    gathered = jnp.take(dense, jnp.asarray(inv), axis=1)
    return jnp.where(jnp.asarray(present)[None, :], gathered, 0)


def _pack_query(ops, table, scalar_plain, count,
                chunk: int = 1 << 16):
    """Fixed-base exponentiate ``count`` device plain-form scalars and
    return msm2.PackedBases (device affine, packed) — no host points.

    Runs in ``chunk``-column pieces: every chunk reuses ONE compiled
    apply/normalize/pack pipeline, and no giant single program is ever
    sent to the compiler — the monolithic 2^20-column version got the
    remote TPU compile helper OOM-SIGKILLed (r4 prover_bench). Columns
    pad to a power of two >= 64 (zero scalars = identity, sliced off
    after normalization), like the host-CRS path's _pad_pow2."""
    from . import msm2

    k = max(64, 1 << max(0, count - 1).bit_length())
    if scalar_plain.shape[-1] < k:
        scalar_plain = jnp.pad(
            scalar_plain, ((0, 0), (0, k - scalar_plain.shape[-1]))
        )
    else:
        scalar_plain = scalar_plain[:, :k]

    packed_parts, inf_parts = [], []
    for off in range(0, k, chunk):
        piece = scalar_plain[:, off : off + chunk]
        packed_jac = table.apply(piece)
        xa, ya, inf = fixed_base.batch_to_affine(ops, packed_jac)
        pts = ops.from_affine(xa, ya, inf)
        pb = msm2.PackedBases(ops, pts)
        packed_parts.append(pb.packed)
        inf_parts.append(pb.inf_mask)
    packed = (packed_parts[0] if len(packed_parts) == 1
              else jnp.concatenate(packed_parts, axis=1))
    inf = (inf_parts[0] if len(inf_parts) == 1
           else jnp.concatenate(inf_parts))
    return msm2.PackedBases(
        None, None, _packed=packed[:, :count], _inf=inf[:count]
    )


def generate_parameters_device_crs(
    engine, circuit, g1, g2, alpha, beta, gamma, delta, tau,
    window_c: int = 8,
):
    """Trusted setup with the CRS kept on device end to end.

    generate_parameters_on_device still funnels every CRS point through
    host Python objects (hours of interpreter time at 2^20+ —
    VERDICT r3 missing #2); here the whole O(n) pipeline is device
    arrays: tau powers and Lagrange coefficients via the device iFFT,
    per-variable QAP evaluations as cohort-grouped sparse matvecs
    (_sparse_rows_eval), CRS exponentiations via fixed-base window
    tables, and batch normalization straight into msm2.PackedBases.
    The host touches only the symbolic assembly (synthesis is serial in
    the reference too, groth16/src/generator.rs:191) and the 7 VK
    points. Returns a prover-ready DeviceParameters
    (ops.prover.DeviceParameters.from_device_queries).

    Semantics match generate_parameters (zero points filtered from A/B,
    generator.rs:490-505; unconstrained aux rejected, :464-470)."""
    from .prover import DeviceParameters

    field = engine.Fr
    spec = limbs.spec_for("bls_fr")

    import os as _os
    import sys as _sys
    import time as _time

    _t0 = _time.time()

    def _plog(msg):
        if _os.environ.get("BELLMAN_TPU_SETUP_LOG"):
            print(f"[device-crs +{_time.time() - _t0:.1f}s] {msg}",
                  file=_sys.stderr, flush=True)

    assembly = KeypairAssembly(field)
    assembly.alloc_input("", lambda: field.one())
    circuit.synthesize(assembly)
    _plog("synthesis done")
    for i in range(assembly.num_inputs):
        assembly.enforce(
            "", assembly.lc() + Variable.input(i), assembly.lc(),
            assembly.lc()
        )

    gamma_inverse = gamma.invert()
    delta_inverse = delta.invert()
    if gamma_inverse is None or delta_inverse is None:
        raise UnexpectedIdentity("gamma/delta must be invertible")

    m = assembly.num_constraints
    exp = (m - 1).bit_length() if m > 1 else 0
    n = 1 << exp
    plan = fft.get_plan(spec, field, exp)

    def mont1(v):
        return jnp.asarray(spec.to_mont_host([int(v)]))

    # -- tau powers + Lagrange coefficients (device) -------------------------
    tau_mont = mont1(tau)
    powers = fft.geometric_powers(spec, tau_mont, exp)   # (L, n) Montgomery
    lagrange_mont = plan.ifft(powers)
    _plog("tau powers + lagrange iFFT dispatched")

    # -- H query scalars tau^i * z(tau)/delta, i < n-1 (device) --------------
    zt = tau ** n - field.one()
    coeff = zt * delta_inverse
    h_scal = limbs.from_mont(
        spec, limbs.mont_mul_r(spec, powers, mont1(coeff))
    )[:, : max(n - 1, 0)]

    # -- per-variable QAP evaluations (device sparse matvec) -----------------
    def eval_class(at, bt, ct, inv):
        u = _sparse_rows_eval(spec, at, lagrange_mont)
        v = _sparse_rows_eval(spec, bt, lagrange_mont)
        w = _sparse_rows_eval(spec, ct, lagrange_mont)
        ext = limbs.mont_mul_r(
            spec,
            limbs.add_r(
                spec,
                limbs.add_r(
                    spec,
                    limbs.mont_mul_r(spec, u, mont1(beta)),
                    limbs.mont_mul_r(spec, v, mont1(alpha)),
                ),
                w,
            ),
            mont1(inv),
        )
        return (limbs.from_mont(spec, u), limbs.from_mont(spec, v),
                limbs.from_mont(spec, ext))

    u_in, v_in, ic_s = eval_class(
        assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs,
        gamma_inverse,
    )
    _plog("input-class QAP evals dispatched")
    u_aux, v_aux, l_s = eval_class(
        assembly.at_aux, assembly.bt_aux, assembly.ct_aux, delta_inverse
    )
    _plog("aux-class QAP evals dispatched")

    u_all = jnp.concatenate([u_in, u_aux], axis=1)
    v_all = jnp.concatenate([v_in, v_aux], axis=1)
    u_nz = np.asarray(jax.device_get(jnp.any(u_all != 0, axis=0)))
    v_nz = np.asarray(jax.device_get(jnp.any(v_all != 0, axis=0)))
    l_nz = np.asarray(jax.device_get(jnp.any(l_s != 0, axis=0)))
    if not l_nz.all():
        raise UnconstrainedVariable("auxiliary variable is unconstrained")

    def compact(arr, mask):
        ix = np.nonzero(mask)[0]
        return jnp.take(arr, jnp.asarray(ix, jnp.int32), axis=1), len(ix)

    a_scal, n_a = compact(u_all, u_nz)
    b_scal, n_b = compact(v_all, v_nz)
    _plog(f"density sync + compact done (n_a={n_a}, n_b={n_b})")

    # -- fixed-base tables + CRS exponentiations (device) --------------------
    bits = spec.L * spec.w
    t_g1 = fixed_base.FixedBaseTable(curve.g1_ops(), g1, bits, c=window_c)
    t_g2 = fixed_base.FixedBaseTable(curve.g2_ops(), g2, bits, c=window_c)
    ops1, ops2 = curve.g1_ops(), curve.g2_ops()

    h_q = _pack_query(ops1, t_g1, h_scal, max(n - 1, 0))
    _plog("h query packed")
    l_q = _pack_query(ops1, t_g1, l_s, l_s.shape[-1])
    _plog("l query packed")
    a_q = _pack_query(ops1, t_g1, a_scal, n_a)
    b1_q = _pack_query(ops1, t_g1, b_scal, n_b)
    b2_q = _pack_query(ops2, t_g2, b_scal, n_b)
    _plog("a/b queries packed")

    # -- IC + VK (tiny, host) ------------------------------------------------
    ic_ints = spec.from_limbs(ic_s)
    ic = [g1.mul_int(s) for s in ic_ints]
    vk = VerifyingKey(
        alpha_g1=g1.mul_int(int(alpha)),
        beta_g1=g1.mul_int(int(beta)),
        beta_g2=g2.mul_int(int(beta)),
        gamma_g2=g2.mul_int(int(gamma)),
        delta_g1=g1.mul_int(int(delta)),
        delta_g2=g2.mul_int(int(delta)),
        ic=ic,
    )
    return DeviceParameters.from_device_queries(
        engine, vk, h=h_q, l=l_q, a=a_q, b_g1=b1_q, b_g2=b2_q
    )


def generate_random_parameters_device_crs(engine, circuit, rng,
                                          window_c: int = 8):
    field = engine.Fr
    g1 = engine.G1.generator().mul_int(rng.randrange(1, field.MODULUS))
    g2 = engine.G2.generator().mul_int(rng.randrange(1, field.MODULUS))
    alpha = field(rng.randrange(1, field.MODULUS))
    beta = field(rng.randrange(1, field.MODULUS))
    gamma = field(rng.randrange(1, field.MODULUS))
    delta = field(rng.randrange(1, field.MODULUS))
    tau = field(rng.randrange(1, field.MODULUS))
    return generate_parameters_device_crs(
        engine, circuit, g1, g2, alpha, beta, gamma, delta, tau,
        window_c=window_c,
    )


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
