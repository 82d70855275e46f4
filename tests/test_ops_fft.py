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
