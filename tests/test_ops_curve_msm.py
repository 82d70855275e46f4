"""Device curve ops and MSM vs the host oracle.

Mirrors the reference's MSM test (multiexp == naive double-and-add,
/root/reference/src/multiexp.rs:334-378) and exercises the branchless
exceptional cases (P=Q, P=-Q, infinity)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.ops import curve, limbs, msm2, msm3


def rand_g1(rng, n):
    g = bls.G1Affine.generator()
    return [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]


def rand_g2(rng, n):
    g = bls.G2Affine.generator()
    return [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]


class TestG1Ops:
    def test_add_double_roundtrip(self):
        rng = random.Random(0)
        ops = curve.g1_ops()
        pts = rand_g1(rng, 8)
        qts = rand_g1(rng, 8)
        # exceptional lanes: P=Q, P=-Q, P=inf, Q=inf
        pts[0] = qts[0]
        qts[1] = -pts[1]
        pts[2] = bls.G1Affine.identity()
        qts[3] = bls.G1Affine.identity()
        pts[4] = bls.G1Affine.identity()
        qts[4] = bls.G1Affine.identity()
        dp = curve.g1_to_device(pts)
        dq = curve.g1_to_device(qts)
        got = curve.jacobian_to_host(ops, ops.add(dp, dq), bls.G1Affine)
        want = [p + q for p, q in zip(pts, qts)]
        assert got == want

        got = curve.jacobian_to_host(ops, ops.double(dp), bls.G1Affine)
        assert got == [p.double() for p in pts]

    def test_tree_reduce(self):
        rng = random.Random(1)
        for n in (1, 2, 5, 8):
            pts = rand_g1(rng, n)
            ops = curve.g1_ops()
            dp = curve.g1_to_device(pts)
            got = curve.jacobian_to_host(ops, ops.tree_reduce(dp), bls.G1Affine)
            want = pts[0]
            for p in pts[1:]:
                want = want + p
            assert got == [want]


class TestG2Ops:
    def test_add_double(self):
        rng = random.Random(2)
        ops = curve.g2_ops()
        pts = rand_g2(rng, 4)
        qts = rand_g2(rng, 4)
        pts[0] = qts[0]
        qts[1] = -pts[1]
        pts[2] = bls.G2Affine.identity()
        dp = curve.g2_to_device(pts)
        dq = curve.g2_to_device(qts)
        got = curve.jacobian_to_host(ops, ops.add(dp, dq), bls.G2Affine)
        assert got == [p + q for p, q in zip(pts, qts)]


class TestMsm:
    @pytest.mark.parametrize("n,c", [(1, 8), (7, 8), (40, 8), (300, 8)])
    def test_g1_msm_vs_naive(self, n, c):
        rng = random.Random(n)
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        if n > 2:
            scalars[1] = 0
            scalars[2] = 1
        spec = limbs.spec_for("bls_fr")
        dp = curve.g1_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = msm3.msm3(curve.g1_ops(), dp, sl, c=c, point_cls=bls.G1Affine)
        want = bls.G1Affine.identity()
        for p, s in zip(pts, scalars):
            want = want + p.mul_int(s)
        assert got == want

    def test_g2_msm_vs_naive(self):
        rng = random.Random(9)
        n = 17
        pts = rand_g2(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        spec = limbs.spec_for("bls_fr")
        dp = curve.g2_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = msm3.msm3(curve.g2_ops(), dp, sl, c=8, point_cls=bls.G2Affine)
        want = bls.G2Affine.identity()
        for p, s in zip(pts, scalars):
            want = want + p.mul_int(s)
        assert got == want

    def test_dummy_inner_product(self):
        spec = limbs.FieldSpec("dummy", 64513)
        rng = random.Random(3)
        n = 100
        bs = [rng.randrange(64513) for _ in range(n)]
        es = [rng.randrange(64513) for _ in range(n)]
        b = jnp.asarray(spec.to_mont_host(bs))
        e = jnp.asarray(spec.to_mont_host(es))
        got = spec.from_mont_host(msm2.dummy_inner_product(spec, b, e))
        assert got == [sum(x * y for x, y in zip(bs, es)) % 64513]
