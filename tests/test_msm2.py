"""Round-scheduled MSM (ops/msm2.py) vs the naive host oracle.

Covers the reference's MSM contract (multiexp == naive double-and-add,
/root/reference/src/multiexp.rs:334-378) plus the v2-specific machinery:
signed-digit decomposition, the occupancy-sorted round schedule, and the
masked mixed-add special cases (zero scalar, identity point, duplicate
points forcing the in-round doubling path)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.ops import curve, limbs, msm2


def rand_g1(rng, n):
    g = bls.G1Affine.generator()
    return [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]


def naive(pts, scalars, identity):
    want = identity
    for p, s in zip(pts, scalars):
        want = want + p.mul_int(s)
    return want


class TestSignedDigits:
    @pytest.mark.parametrize("c", [8, 16])
    def test_reconstruction(self, c):
        spec = limbs.spec_for("bls_fr")
        rng = random.Random(c)
        vals = [0, 1, bls.R - 1, (1 << 255) % bls.R] + [
            rng.randrange(bls.R) for _ in range(20)
        ]
        sl = jnp.asarray(spec.to_limbs(vals))
        absd, sgn = msm2.signed_digits(sl, c)
        absd = np.asarray(absd)
        sgn = np.asarray(sgn)
        half = 1 << (c - 1)
        assert absd.max() <= half
        for j, v in enumerate(vals):
            rec = sum(
                int(absd[w, j]) * (-1 if sgn[w, j] else 1) * (1 << (c * w))
                for w in range(absd.shape[0])
            )
            assert rec == v, (j, v)


class TestMsm2Jnp:
    """Pure-jnp reference path on CPU (mode='jnp')."""

    @pytest.mark.parametrize("n", [1, 7])
    def test_vs_naive(self, n):
        rng = random.Random(n)
        pts = rand_g1(rng, n)
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        if n > 2:
            scalars[1] = 0
            scalars[2] = 1
        spec = limbs.spec_for("bls_fr")
        dp = curve.g1_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = curve.jacobian_to_host(
            curve.g1_ops(),
            msm2.msm2(curve.g1_ops(), dp, sl, c=8, mode="jnp"),
            bls.G1Affine,
        )
        assert got == [naive(pts, scalars, bls.G1Affine.identity())]

    @pytest.mark.slow
    def test_vs_naive_large_subprocess(self):
        """n=40 in a FRESH interpreter: compiling this program as the
        third big MSM compile in one process segfaults XLA:CPU on this
        host (deterministic, cache-independent — r4 forensics,
        logs/msm2_class.out); the identical program compiles and
        passes in isolation, so the coverage runs in a subprocess."""
        import subprocess
        import sys

        code = (
            "import jax\n"
            "jax.config.update('jax_platforms', 'cpu')\n"
            "from bellman_tpu.utils import cpu_cache\n"
            "cpu_cache.enable()\n"
            "import random, jax.numpy as jnp\n"
            "from bellman_tpu.algebra import bls12_381 as bls\n"
            "from bellman_tpu.ops import curve, limbs, msm2\n"
            "from test_msm2 import rand_g1, naive\n"
            "n = 40\n"
            "rng = random.Random(n)\n"
            "pts = rand_g1(rng, n)\n"
            "scalars = [rng.randrange(bls.R) for _ in range(n)]\n"
            "scalars[1] = 0\n"
            "scalars[2] = 1\n"
            "spec = limbs.spec_for('bls_fr')\n"
            "sl = jnp.asarray(spec.to_limbs(scalars))\n"
            "got = curve.jacobian_to_host(\n"
            "    curve.g1_ops(),\n"
            "    msm2.msm2(curve.g1_ops(), curve.g1_to_device(pts), sl,\n"
            "              c=8, mode='jnp'),\n"
            "    bls.G1Affine,\n"
            ")\n"
            "assert got == [naive(pts, scalars, bls.G1Affine.identity())]\n"
            "print('MSM2-N40-OK')\n"
        )
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env["PYTHONPATH"] = repo + (
            ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        r = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(__file__),
            env=env, capture_output=True, text=True, timeout=1800,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "MSM2-N40-OK" in r.stdout

    def test_duplicates_and_identity(self):
        """Duplicate points in one bucket hit the in-round doubling path;
        an identity base contributes nothing."""
        rng = random.Random(77)
        pts = rand_g1(rng, 6)
        pts[1] = pts[0]            # same point twice
        pts[3] = bls.G1Affine.identity()
        scalars = [rng.randrange(bls.R) for _ in range(6)]
        scalars[1] = scalars[0]    # same scalar too => same bucket every window
        spec = limbs.spec_for("bls_fr")
        dp = curve.g1_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = curve.jacobian_to_host(
            curve.g1_ops(),
            msm2.msm2(curve.g1_ops(), dp, sl, c=8, mode="jnp"),
            bls.G1Affine,
        )
        assert got == [naive(pts, scalars, bls.G1Affine.identity())]

    def test_negating_buckets(self):
        """Scalars crafted to produce negative digits in every window."""
        spec = limbs.spec_for("bls_fr")
        rng = random.Random(5)
        pts = rand_g1(rng, 4)
        # 0xFFFF... digits force carries/negative digits everywhere
        scalars = [int("81" * 16, 16), int("FF" * 31, 16) % bls.R, 3, bls.R - 1]
        dp = curve.g1_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = curve.jacobian_to_host(
            curve.g1_ops(),
            msm2.msm2(curve.g1_ops(), dp, sl, c=8, mode="jnp"),
            bls.G1Affine,
        )
        assert got == [naive(pts, scalars, bls.G1Affine.identity())]

    def test_g2(self):
        rng = random.Random(11)
        g = bls.G2Affine.generator()
        n = 5
        pts = [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        spec = limbs.spec_for("bls_fr")
        dp = curve.g2_to_device(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        got = curve.jacobian_to_host(
            curve.g2_ops(),
            msm2.msm2(curve.g2_ops(), dp, sl, c=8, mode="jnp"),
            bls.G2Affine,
        )
        assert got == [naive(pts, scalars, bls.G2Affine.identity())]


@pytest.mark.slow
class TestMaddKernelInterpret:
    """madd_round (Pallas, interpret mode) == madd_round_jnp on one tile.

    Runs on the toy curve (tests/toy_curve.py) — see
    TestFoldKernelsInterpret in tests/test_msm3.py for why (BLS Fq-width
    jaxprs make interpret mode >10 min per test)."""

    def test_madd_round_interpret_matches_jnp(self):
        from bellman_tpu.ops import pallas_madd
        from toy_curve import rand_toy, toy_ops, toy_spec

        ops = toy_ops()
        rng = random.Random(4)
        W = pallas_madd.TILE
        spec = toy_spec()
        C = spec.L
        RA = pallas_madd.rows_acc(ops)
        RD = pallas_madd.rows_add(ops)
        # accumulator: mix of infinity lanes and real points
        acc_pts = rand_toy(rng, 8)
        base_pts = rand_toy(rng, 8)
        acc = np.zeros((RA, W), np.uint32)
        add = np.zeros((RD, W), np.uint32)
        for lane in range(W):
            p = acc_pts[lane % 8]
            q = base_pts[lane % 8]
            cases = lane % 5
            if cases == 1:
                q = p                  # doubling lane
            if cases == 2:
                q = -p                 # cancellation lane
            if cases != 3:             # 3 => acc stays infinity
                acc[0:C, lane] = spec.to_mont_host([int(p.x)])[:, 0]
                acc[C:2 * C, lane] = spec.to_mont_host([int(p.y)])[:, 0]
                acc[2 * C:3 * C, lane] = spec.one_mont[:, 0]
            add[0:C, lane] = spec.to_mont_host([int(q.x)])[:, 0]
            add[C:2 * C, lane] = spec.to_mont_host([int(q.y)])[:, 0]
            vrow = pallas_madd._pad8(2 * C)
            add[vrow, lane] = 0 if cases == 4 else 1   # valid row
            add[vrow + 1, lane] = 1 if lane % 7 == 0 else 0  # sign row
        acc_j = jnp.asarray(acc)
        add_j = jnp.asarray(add)
        want = np.asarray(pallas_madd.madd_round_jnp(ops, acc_j, add_j))
        got = np.asarray(
            pallas_madd.madd_round(ops, jnp.asarray(acc), add_j, True)
        )
        assert (got[:3 * C] == want[:3 * C]).all()


@pytest.mark.slow
class TestAffineKernelInterpret:
    """affine_round (Pallas K1/K2/K3, interpret mode) == affine_round_jnp
    on one tile, on the toy curve (see TestMaddKernelInterpret).

    The kernel works in the lazy [0, 2p) representation; parity is
    checked after canonicalization (one conditional subtract per
    coordinate slab)."""

    def test_affine_round_interpret_matches_jnp(self):
        from bellman_tpu.ops import pallas_affine, pallas_madd
        from toy_curve import rand_toy, toy_ops, toy_spec

        ops = toy_ops()
        rng = random.Random(9)
        W = pallas_madd.TILE
        spec = toy_spec()
        C = spec.L
        RAFF = pallas_affine.rows_aff(ops)
        RD = pallas_madd.rows_add(ops)
        acc_pts = rand_toy(rng, 8)
        base_pts = rand_toy(rng, 8)
        acc = np.zeros((RAFF, W), np.uint32)
        add = np.zeros((RD, W), np.uint32)
        for lane in range(W):
            p = acc_pts[lane % 8]
            q = base_pts[lane % 8]
            cases = lane % 5
            if cases == 1:
                q = p                  # doubling lane
            if cases == 2:
                q = -p                 # cancellation lane
            if cases != 3:             # 3 => lane starts empty
                acc[0:C, lane] = spec.to_mont_host([int(p.x)])[:, 0]
                acc[C:2 * C, lane] = spec.to_mont_host([int(p.y)])[:, 0]
                acc[2 * C, lane] = 1   # nonempty flag
            add[0:C, lane] = spec.to_mont_host([int(q.x)])[:, 0]
            add[C:2 * C, lane] = spec.to_mont_host([int(q.y)])[:, 0]
            vrow = pallas_madd._pad8(2 * C)
            add[vrow, lane] = 0 if cases == 4 else 1   # valid row
            add[vrow + 1, lane] = 1 if lane % 7 == 0 else 0  # sign row
        acc_j = jnp.asarray(acc)
        add_j = jnp.asarray(add)
        want = np.asarray(pallas_affine.affine_round_jnp(ops, acc_j, add_j))
        got = np.asarray(
            pallas_affine.affine_round(ops, jnp.asarray(acc), add_j, True)
        )

        def canon(a):
            out = [
                np.asarray(
                    limbs._cond_sub_p(
                        spec, jnp.asarray(a[b * spec.L:(b + 1) * spec.L])
                    )
                )
                for b in range(2 * C // spec.L)
            ]
            return np.concatenate(out, axis=0)

        flag_w = want[2 * C] != 0
        flag_g = got[2 * C] != 0
        assert (flag_g == flag_w).all()
        cw, cg = canon(want), canon(got)
        # coordinates only matter on nonempty lanes
        assert (cg[:, flag_w] == cw[:, flag_w]).all()
