"""Native C++ pairing vs the Python big-int oracle.

The reference gets its pairing from the bls12_381 crate (SURVEY.md §2.3);
our native component must agree with the host oracle on miller loop,
final exponentiation, bilinearity, and identity handling."""

import random

import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native pairing library unavailable"
)


def rand_points(seed):
    rng = random.Random(seed)
    p = bls.G1Affine.generator().mul_int(rng.randrange(1, bls.R))
    q = bls.G2Affine.generator().mul_int(rng.randrange(1, bls.R))
    return p, q


def test_miller_loop_matches_oracle():
    p, q = rand_points(0)
    assert native.multi_miller_loop([(p, q)]) == bls.miller_loop(p, q)


def test_final_exp_matches_oracle():
    p, q = rand_points(1)
    ml = bls.miller_loop(p, q)
    assert native.final_exponentiation(ml) == bls.final_exponentiation(ml)


def test_multi_miller_product():
    p1, q1 = rand_points(2)
    p2, q2 = rand_points(3)
    got = native.multi_miller_loop([(p1, q1), (p2, q2)])
    want = bls.miller_loop(p1, q1) * bls.miller_loop(p2, q2)
    assert got == want


def test_bilinearity():
    p, q = rand_points(4)
    a, b = 987654321, 123456789
    lhs = native.pairing(p.mul_int(a), q.mul_int(b))
    rhs = native.pairing(p.mul_int(a * b % bls.R), q)
    assert lhs == rhs


def test_identity_inputs():
    p, q = rand_points(5)
    one = bls.Fq12.one()
    assert native.multi_miller_loop([(bls.G1Affine.identity(), q)]) == one
    assert native.multi_miller_loop([(p, bls.G2Affine.identity())]) == one
