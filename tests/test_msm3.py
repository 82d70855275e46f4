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


def run_msm3(ops, pts_dev, scalars, c, cls, fold="jacobian"):
    spec = limbs.spec_for("bls_fr")
    sl = jnp.asarray(spec.to_limbs(scalars))
    return msm3.msm3(ops, pts_dev, sl, c=c, mode="jnp", point_cls=cls,
                     fold=fold)


@pytest.mark.parametrize("fold", ["jacobian", "affine"])
class TestMsm3Jnp:
    @pytest.mark.parametrize("n", [1, 7, 40])
    def test_vs_naive(self, n, fold):
        rng = random.Random(n)
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        if n > 2:
            scalars[1] = 0
            scalars[2] = 1
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8,
            bls.G1Affine, fold
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_duplicates_and_identity(self, fold):
        """Duplicate point+scalar pairs land in one bucket (fold hits the
        doubling path); identity bases contribute nothing."""
        rng = random.Random(77)
        pts = rand_g1(rng, 6)
        pts[1] = pts[0]
        pts[3] = bls.G1Affine.identity()
        scalars = [rng.randrange(bls.R) for _ in range(6)]
        scalars[1] = scalars[0]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8,
            bls.G1Affine, fold
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_negating_digits(self, fold):
        pts = rand_g1(random.Random(5), 4)
        scalars = [int("81" * 16, 16), int("FF" * 31, 16) % bls.R, 3,
                   bls.R - 1]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8,
            bls.G1Affine, fold
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_skewed_bucket(self, fold):
        """Many equal scalars: one bucket takes most points (the heavy
        distribution that degrades round-scheduled designs)."""
        rng = random.Random(9)
        n = 24
        pts = rand_g1(rng, n)
        s = rng.randrange(bls.R)
        scalars = [s] * (n - 2) + [rng.randrange(bls.R) for _ in range(2)]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8,
            bls.G1Affine, fold
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_grouped_path(self, fold, monkeypatch):
        """Force the occupancy-grouped plan (small-n fast path disabled)
        so the data-dependent group pipeline keeps fast-tier coverage."""
        monkeypatch.setenv("BELLMAN_TPU_MSM_SMALL_SLOTS", "0")
        rng = random.Random(40)
        n = 40
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        got = run_msm3(
            curve.g1_ops(), curve.g1_to_device(pts), scalars, 8,
            bls.G1Affine, fold
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_g2(self, fold):
        rng = random.Random(11)
        g = bls.G2Affine.generator()
        n = 5
        pts = [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        got = run_msm3(
            curve.g2_ops(), curve.g2_to_device(pts), scalars, 8,
            bls.G2Affine, fold
        )
        assert got == naive(pts, scalars, bls.G2Affine.identity())


@pytest.mark.slow
class TestFoldKernelsInterpret:
    """Pallas fold kernels (interpret mode) == jnp twins on one tile.

    Runs on the toy curve (tests/toy_curve.py): the kernels are generic
    over the limb spec, and BLS12-381 Fq (w=13, L=32) jaxprs make
    interpret mode take >10 min per test on XLA-CPU; the toy field
    (w=13, L=4) covers the same layout/mask/roll/case-analysis paths in
    seconds. Fq-width parity runs in the jnp-mode tests above and the
    on-chip bench."""

    def _prep(self, rng, W):
        from bellman_tpu.ops.pallas_fold import rows_prep
        from toy_curve import rand_toy, toy_ops, toy_spec

        ops = toy_ops()
        spec = toy_spec()
        C = spec.L
        RP = rows_prep(ops)
        pts = rand_toy(rng, 16)
        prep = np.zeros((RP, W), np.uint32)
        for lane in range(W):
            p = pts[lane % 16]
            case = lane % 5
            if case == 3:
                continue  # invalid slot (z = 0)
            prep[0:C, lane] = spec.to_mont_host([int(p.x)])[:, 0]
            yv = int(-p.y) if case == 4 else int(p.y)
            prep[C:2 * C, lane] = spec.to_mont_host([yv])[:, 0]
            prep[2 * C, lane] = 1
        return jnp.asarray(prep)

    def test_level0_and_pair_fold(self):
        from bellman_tpu.ops import pallas_fold
        from toy_curve import toy_ops

        ops = toy_ops()
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

    def _jac_planes(self, rng, K, W):
        """(RJ, K, W) Jacobian planes directly from affine lanes
        (Z = 1 for valid, 0 for identity) — no fold compile needed."""
        from bellman_tpu.ops.pallas_fold import rows_jac
        from toy_curve import toy_ops, toy_spec

        ops = toy_ops()
        spec = toy_spec()
        C = spec.L
        RJ = rows_jac(ops)
        prep = np.asarray(self._prep(rng, K * W))
        jac = np.zeros((RJ, K * W), np.uint32)
        jac[0:C] = prep[0:C]
        jac[C:2 * C] = prep[C:2 * C]
        one = spec.one_mont[:, 0]
        valid = prep[2 * C] != 0
        jac[2 * C:3 * C][:, valid] = one[:, None]
        return jnp.asarray(jac.reshape(RJ, K, W))

    def test_pair_fold3_and_window_reduce(self):
        """3D bit-plane folds == jnp twins ((3C, K, W) layout), on both
        the narrow 3-D fallback (W=256) and the full-tile 4-D layout
        (W=2048)."""
        from bellman_tpu.ops import pallas_fold
        from toy_curve import toy_ops

        ops = toy_ops()
        rng = random.Random(6)
        for K, W in ((2, 256), (2, 2048)):
            planes = self._jac_planes(rng, K, W)            # (RJ, K, W)
            planes_k = jnp.transpose(planes, (1, 0, 2))     # (K, RJ, W)

            want = np.asarray(pallas_fold.pair_fold3_jnp(ops, planes))
            got = np.asarray(pallas_fold.pair_fold3(ops, planes_k, True))
            assert (np.transpose(got, (1, 0, 2)) == want).all(), (K, W)

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
        from toy_curve import ToyPoint, toy_ops, toy_spec

        ops = toy_ops()
        rng = random.Random(4)
        W = pallas_fold.TILE
        prep = self._prep(rng, 2 * W)
        jac = pallas_fold.level0_fold_jnp(ops, prep)  # (RJ, TILE)
        got = np.asarray(pallas_fold.butterfly_reduce(ops, jac, True))
        C = toy_spec().L
        want = ops.tree_reduce(
            (jac[0:C], jac[C:2 * C], jac[2 * C:3 * C])
        )
        want_pt = curve.jacobian_to_host(ops, want, ToyPoint)[0]
        got_pt = curve.jacobian_to_host(
            ops,
            (got[0:C, :1], got[C:2 * C, :1], got[2 * C:3 * C, :1]),
            ToyPoint,
        )[0]
        assert got_pt == want_pt


@pytest.mark.slow
class TestAfoldInterpret:
    """Batch-affine fold kernels (ops/pallas_afold.py, interpret mode)
    == jnp twin, on the toy curve; parity checked after
    canonicalization (the kernel works in the lazy [0, 2p) form)."""

    def test_afold_matches_jnp(self):
        from bellman_tpu.ops import pallas_afold
        from toy_curve import rand_toy, toy_ops, toy_spec

        ops = toy_ops()
        spec = toy_spec()
        C = spec.L
        RAFF = pallas_afold.rows_aff(ops)
        rng = random.Random(13)
        W = 2 * pallas_afold.TILE
        pts = rand_toy(rng, 16)
        prep = np.zeros((RAFF, W), np.uint32)
        M = W // 2
        for lane in range(W):
            p = pts[lane % 16]
            case = lane % 7
            if case == 3:
                continue  # empty slot
            if case == 5 and lane >= M:
                p = pts[(lane - M) % 16]       # doubling pair
            if case == 6 and lane >= M:
                p = -pts[(lane - M) % 16]      # cancellation pair
            prep[0:C, lane] = spec.to_mont_host([int(p.x)])[:, 0]
            prep[C:2 * C, lane] = spec.to_mont_host([int(p.y)])[:, 0]
            prep[2 * C, lane] = 1
        prep_j = jnp.asarray(prep)
        want = np.asarray(pallas_afold.afold_jnp(ops, prep_j))
        got = np.asarray(pallas_afold.afold(ops, prep_j, True))

        def canon(a):
            return np.asarray(
                limbs._cond_sub_p(spec, jnp.asarray(a))
            )

        flag_w = want[2 * C] != 0
        flag_g = got[2 * C] != 0
        assert (flag_g == flag_w).all()
        for rows in (slice(0, C), slice(C, 2 * C)):
            cw, cg = canon(want[rows]), canon(got[rows])
            assert (cg[:, flag_w] == cw[:, flag_w]).all()

    def test_afold_host_crosscheck(self):
        """afold_jnp == host toy-curve addition lane by lane."""
        from bellman_tpu.ops import pallas_afold
        from toy_curve import ToyFq, ToyPoint, rand_toy, toy_ops, toy_spec

        ops = toy_ops()
        spec = toy_spec()
        C = spec.L
        RAFF = pallas_afold.rows_aff(ops)
        rng = random.Random(21)
        W = 64
        pts = rand_toy(rng, 16)
        prep = np.zeros((RAFF, W), np.uint32)
        for lane in range(W):
            p = pts[lane % 16]
            if lane % 5 == 3:
                continue
            prep[0:C, lane] = spec.to_mont_host([int(p.x)])[:, 0]
            yv = int(-p.y) if lane % 5 == 4 else int(p.y)
            prep[C:2 * C, lane] = spec.to_mont_host([yv])[:, 0]
            prep[2 * C, lane] = 1
        out = np.asarray(pallas_afold.afold_jnp(ops, jnp.asarray(prep)))

        def lane_pt(arr, l):
            if arr[2 * C, l] == 0:
                return ToyPoint.identity()
            x = spec.from_mont_host(arr[0:C, l:l + 1])[0]
            y = spec.from_mont_host(arr[C:2 * C, l:l + 1])[0]
            return ToyPoint(ToyFq(x), ToyFq(y))

        M = W // 2
        for l in range(M):
            assert lane_pt(out, l) == lane_pt(prep, l) + lane_pt(prep, l + M), l


class TestMsm3Chunked:
    """Chunked accumulation (msm3_start_chunked): device-streamed 2^24
    path — totals combine across chunks by plane-wise Jacobian adds."""

    @pytest.mark.parametrize("chunk", [16, 64])
    def test_vs_unchunked(self, chunk):
        rng = random.Random(77)
        n = 100
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        spec = limbs.spec_for("bls_fr")
        sl = jnp.asarray(spec.to_limbs(scalars))
        ops = curve.g1_ops()
        packed = msm3.PackedBases(ops, curve.g1_to_device(pts))
        got = msm3.msm3_chunked(
            ops, packed, sl, bls.G1Affine, c=8, mode="jnp", chunk=chunk
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())

    def test_streamed_parts(self):
        """Per-chunk PackedBases sequence (host-streamed upload mode)."""
        rng = random.Random(78)
        n = 48
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        spec = limbs.spec_for("bls_fr")
        sl = jnp.asarray(spec.to_limbs(scalars))
        ops = curve.g1_ops()
        parts = [
            msm3.PackedBases(ops, curve.g1_to_device(pts[off : off + 16]))
            for off in range(0, n, 16)
        ]
        got = msm3.msm3_chunked(
            ops, parts, sl, bls.G1Affine, c=8, mode="jnp", chunk=16
        )
        assert got == naive(pts, scalars, bls.G1Affine.identity())
