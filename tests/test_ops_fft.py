"""Device FFT vs the host EvaluationDomain oracle.

Ports the reference's FFT test discipline: fft/ifft round-trip, coset
round-trip, naive polynomial-mul cross-check
(/root/reference/src/domain.rs:376-463), plus the full h-pipeline vs the
host prover's compute_h_coeffs."""

import random

import jax.numpy as jnp
import pytest

from bellman_tpu.algebra.engine import FrD
from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.domain import EvaluationDomain, ScalarOps
from bellman_tpu.groth16.prover import compute_h_coeffs
from bellman_tpu.ops import fft, limbs


CASES = [
    ("dummy", FrD, limbs.FieldSpec("dummy", 64513)),
    ("bls_fr", bls.Fr, limbs.spec_for("bls_fr")),
]


@pytest.fixture(params=CASES, ids=[c[0] for c in CASES])
def case(request):
    return request.param


def to_dev(spec, field, vals):
    return jnp.asarray(spec.to_mont_host([int(v) for v in vals]))


def from_dev(spec, field, arr):
    return [field(v) for v in spec.from_mont_host(arr)]


def test_fft_matches_host(case):
    _, field, spec = case
    rng = random.Random(0)
    for exp in (0, 1, 3, 5):
        n = 1 << exp
        vals = [field(rng.randrange(field.MODULUS)) for _ in range(n)]
        dom = EvaluationDomain.from_coeffs(list(vals), ScalarOps(field), field)
        dom.fft()
        plan = fft.get_plan(spec, field, exp)
        got = from_dev(spec, field, plan.fft(to_dev(spec, field, vals)))
        assert got == dom.coeffs

        dom2 = EvaluationDomain.from_coeffs(list(vals), ScalarOps(field), field)
        dom2.ifft()
        got = from_dev(spec, field, plan.ifft(to_dev(spec, field, vals)))
        assert got == dom2.coeffs


def test_fft_ifft_roundtrip(case):
    _, field, spec = case
    rng = random.Random(1)
    exp = 6
    n = 1 << exp
    vals = [rng.randrange(field.MODULUS) for _ in range(n)]
    plan = fft.get_plan(spec, field, exp)
    a = to_dev(spec, field, vals)
    back = plan.ifft(plan.fft(a))
    assert spec.from_mont_host(back) == vals
    back = plan.icoset_fft(plan.coset_fft(a))
    assert spec.from_mont_host(back) == vals


def test_coset_and_z_division_match_host(case):
    _, field, spec = case
    rng = random.Random(2)
    exp = 4
    n = 1 << exp
    vals = [field(rng.randrange(field.MODULUS)) for _ in range(n)]
    dom = EvaluationDomain.from_coeffs(list(vals), ScalarOps(field), field)
    dom.coset_fft()
    dom.divide_by_z_on_coset()
    dom.icoset_fft()
    plan = fft.get_plan(spec, field, exp)
    a = to_dev(spec, field, vals)
    a = plan.coset_fft(a)
    a = plan.divide_by_z_on_coset(a)
    a = plan.icoset_fft(a)
    assert from_dev(spec, field, a) == dom.coeffs


def test_h_pipeline_matches_host(case):
    _, field, spec = case
    rng = random.Random(3)
    m = 11  # pads to 16
    a = [field(rng.randrange(field.MODULUS)) for _ in range(m)]
    b = [field(rng.randrange(field.MODULUS)) for _ in range(m)]
    c = []
    for x, y in zip(a, b):
        c.append(x * y)  # satisfied constraints so h is exact
    want = compute_h_coeffs(field, a, b, c)

    exp = 4
    n = 1 << exp
    plan = fft.get_plan(spec, field, exp)
    pad = [field.zero()] * (n - m)
    da = to_dev(spec, field, a + pad)
    db = to_dev(spec, field, b + pad)
    dc = to_dev(spec, field, c + pad)
    h = fft.h_pipeline(plan, da, db, dc)
    got = from_dev(spec, field, h)[: n - 1]
    assert got == want


class TestFusedFFTKernels:
    """pallas_fft fused multi-stage kernels (interpret mode) vs the
    per-stage jnp path — exact butterfly/twiddle parity across the
    kernel seams (lane stages / transposed phase / span boundaries)."""

    @pytest.mark.parametrize("exp", [9, 10])
    @pytest.mark.parametrize("inverse", [False, True])
    def test_fused_matches_jnp(self, case, exp, inverse):
        from bellman_tpu.ops import pallas_fft

        name, field, spec = case
        if exp > field.S:
            pytest.skip("exceeds field 2-adicity")
        rng = random.Random(exp)
        n = 1 << exp
        vals = [field(rng.randrange(field.MODULUS)) for _ in range(n)]
        plan = fft.get_plan(spec, field, exp)
        a = to_dev(spec, field, vals)
        want = plan.fft(a, inverse=inverse, scale=False)  # jnp path (CPU)
        tw = plan.inv_twiddles if inverse else plan.twiddles
        ar = jnp.take(a, plan.bitrev, axis=-1)
        got = pallas_fft.fused_fft(spec, exp, tw, ar, interpret=True)
        import numpy as np

        assert (np.asarray(got) == np.asarray(want)).all()

    @pytest.mark.parametrize("exp", [14, 15, 16])
    def test_span_boundary_f65537(self, exp):
        """exps that exercise the fft_span kernel and its seam with
        fft_k1 (k1 covers 7 + log2(min(128, n/128)) stages: exp=14 is
        k1-only at RB=128; 15/16 add 1- and 2-stage spans).

        Uses F_65537 (Fermat prime: S=16, omega=3, L=2 limbs) so
        interpret-mode kernel execution and the vectorized numpy
        reference stay fast — the butterfly structure under test is
        limb-count-independent."""
        import numpy as np

        from bellman_tpu.ops import pallas_fft
        from bellman_tpu.ops.fft import bitrev_indices, geometric_powers

        p = 65537
        spec = limbs.FieldSpec("f65537", p)
        n = 1 << exp
        omega = pow(3, (p - 1) // n, p)
        rng = np.random.default_rng(exp)
        vals = rng.integers(0, p, n)

        # numpy iterative reference (serial_fft semantics)
        br = bitrev_indices(exp)
        ref = vals[br].astype(np.int64)
        for s in range(exp):
            m = 1 << s
            w_tab = np.array([pow(omega, j * (n // (2 * m)), p)
                              for j in range(m)], dtype=np.int64)
            x = ref.reshape(n // (2 * m), 2, m)
            u, v = x[:, 0], x[:, 1]
            t = (v * w_tab[None, :]) % p
            ref = np.stack([(u + t) % p, (u - t) % p], axis=1).reshape(n)

        tw = geometric_powers(
            spec, jnp.asarray(spec.to_mont_host([omega])), exp - 1
        )
        a = jnp.asarray(spec.to_mont_host(list(map(int, vals))))
        ar = jnp.take(a, jnp.asarray(br), axis=-1)
        got_m = pallas_fft.fused_fft(spec, exp, tw, ar, interpret=True)
        got = spec.from_mont_host(np.asarray(got_m))
        assert got == [int(v) for v in ref], exp
