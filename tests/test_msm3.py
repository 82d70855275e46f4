"""Tree-fold MSM (ops/msm3.py) vs the naive host oracle.

Covers the reference MSM contract (multiexp == naive double-and-add,
/root/reference/src/multiexp.rs:334-378) on the v3-specific machinery:
occupancy grouping, rank-major padded gathers, pairwise Jacobian folds
with Z=0 identity slots, and the per-group assembly."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.ops import curve, limbs, msm3


def rand_g1(rng, n):
    g = bls.G1Affine.generator()
    return [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]


def naive(pts, scalars, identity):
    want = identity
    for p, s in zip(pts, scalars):
        want = want + p.mul_int(s)
    return want


def run_msm3(ops, pts_dev, scalars, c, cls):
    spec = limbs.spec_for("bls_fr")
    sl = jnp.asarray(spec.to_limbs(scalars))
    return msm3.msm3(ops, pts_dev, sl, c=c, mode="jnp", point_cls=cls)


class TestMsm3Jnp:
    @pytest.mark.parametrize("n", [1, 7, 40])
    def test_vs_naive(self, n):
        rng = random.Random(n)
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        if n > 2:
            scalars[1] = 0
            scalars[2] = 1
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8, bls.G1Affine
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_duplicates_and_identity(self):
        """Duplicate point+scalar pairs land in one bucket (fold hits the
        doubling path); identity bases contribute nothing."""
        rng = random.Random(77)
        pts = rand_g1(rng, 6)
        pts[1] = pts[0]
        pts[3] = bls.G1Affine.identity()
        scalars = [rng.randrange(bls.R) for _ in range(6)]
        scalars[1] = scalars[0]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8, bls.G1Affine
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_negating_digits(self):
        pts = rand_g1(random.Random(5), 4)
        scalars = [int("81" * 16, 16), int("FF" * 31, 16) % bls.R, 3,
                   bls.R - 1]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8, bls.G1Affine
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_skewed_bucket(self):
        """Many equal scalars: one bucket takes most points (the heavy
        distribution that degrades round-scheduled designs)."""
        rng = random.Random(9)
        n = 24
        pts = rand_g1(rng, n)
        s = rng.randrange(bls.R)
        scalars = [s] * (n - 2) + [rng.randrange(bls.R) for _ in range(2)]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8, bls.G1Affine
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_g2(self):
        rng = random.Random(11)
        g = bls.G2Affine.generator()
        n = 5
        pts = [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        got = run_msm3(
            curve.g2_ops(), curve.g2_to_device(pts), scalars, 8, bls.G2Affine
        )
        assert got == naive(pts, scalars, bls.G2Affine.identity())


@pytest.mark.slow
class TestFoldKernelsInterpret:
    """Pallas fold kernels (interpret mode) == jnp twins on one tile."""

    def _prep(self, rng, W):
        from bellman_tpu.ops.pallas_fold import rows_prep

        ops = curve.g1_ops()
        C = 24
        RP = rows_prep(ops)
        spec_q = limbs.spec_for("bls_fq")
        pts = rand_g1(rng, 16)
        prep = np.zeros((RP, W), np.uint32)
        for lane in range(W):
            p = pts[lane % 16]
            case = lane % 5
            if case == 3:
                continue  # invalid slot (z = 0)
            prep[0:C, lane] = spec_q.to_mont_host([int(p.x)])[:, 0]
            yv = int(-p.y) if case == 4 else int(p.y)
            prep[C:2 * C, lane] = spec_q.to_mont_host([yv])[:, 0]
            prep[2 * C, lane] = 1
        return jnp.asarray(prep)

    def test_level0_and_pair_fold(self):
        from bellman_tpu.ops import pallas_fold

        ops = curve.g1_ops()
        rng = random.Random(3)
        W = 2 * pallas_fold.TILE
        prep = self._prep(rng, W)
        want0 = np.asarray(pallas_fold.level0_fold_jnp(ops, prep))
        got0 = np.asarray(pallas_fold.level0_fold(ops, prep, True))
        assert (got0 == want0).all()

        jac = jnp.asarray(
            np.concatenate([want0, want0[:, ::-1]], axis=1)
        )
        want1 = np.asarray(pallas_fold.pair_fold_jnp(ops, jac))
        got1 = np.asarray(pallas_fold.pair_fold(ops, jac, True))
        assert (got1 == want1).all()

    def test_pair_fold3_and_window_reduce(self):
        """3D bit-plane folds (K-leading pallas layout) == jnp twins
        ((3C, K, W) layout) on random Jacobian planes."""
        from bellman_tpu.ops import pallas_fold

        ops = curve.g1_ops()
        rng = random.Random(6)
        K, W = 2, 256
        prep = self._prep(rng, 2 * K * W)
        jac = pallas_fold.level0_fold_jnp(ops, prep)   # (RJ, K*W)
        RJ = jac.shape[0]
        planes = jac.reshape(RJ, K, W)                  # (RJ, K, W)
        planes_k = jnp.transpose(planes, (1, 0, 2))     # (K, RJ, W)

        want = np.asarray(pallas_fold.pair_fold3_jnp(ops, planes))
        got = np.asarray(pallas_fold.pair_fold3(ops, planes_k, True))
        assert (np.transpose(got, (1, 0, 2)) == want).all()

        nw = 16
        w128 = planes[:, :, :128]
        want_r = np.asarray(pallas_fold.window_reduce_jnp(ops, w128, nw))
        got_r = np.asarray(
            pallas_fold.window_reduce(
                ops, jnp.transpose(w128, (1, 0, 2)), nw, True
            )
        )
        # only the first nw lanes are meaningful
        assert (
            np.transpose(got_r, (1, 0, 2))[:, :, :nw] == want_r[:, :, :nw]
        ).all()

    def test_butterfly_reduce(self):
        from bellman_tpu.ops import pallas_fold

        ops = curve.g1_ops()
        rng = random.Random(4)
        W = pallas_fold.TILE
        prep = self._prep(rng, 2 * W)
        jac = pallas_fold.level0_fold_jnp(ops, prep)  # (72, 2048)
        got = np.asarray(pallas_fold.butterfly_reduce(ops, jac, True))
        C = 24
        want = ops.tree_reduce(
            (
                jac[0:C].reshape(C, W)[None][0].reshape((C, W)),
                jac[C:2 * C],
                jac[2 * C:],
            )
        )
        want_pt = curve.jacobian_to_host(ops, want, bls.G1Affine)[0]
        got_pt = curve.jacobian_to_host(
            ops,
            (got[0:C, :1], got[C:2 * C, :1], got[2 * C:, :1]),
            bls.G1Affine,
        )[0]
        assert got_pt == want_pt
