"""Shared MSM machinery (ops/msm2.py): signed digits + schedule.

Covers the signed-digit decomposition contract (reconstruction over
random + edge-case scalars) and the schedule's segment bounds. The MSM
accumulation itself is ops/msm3.py, covered by tests/test_msm3.py
(vs-naive, duplicates/identity, negation, skewed buckets, G2, chunked
— the reference's multiexp contract, /root/reference/src/multiexp.rs:
334-378)."""

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

class TestScheduleSegments:
    """_schedule's histogram/cumsum segment bounds vs a host rebuild."""

    def test_segments_match_host(self):
        import numpy as np
        from bellman_tpu.ops import msm2 as m

        rng = random.Random(3)
        c, L = 8, 16
        n = 24
        nw = m.num_windows(L, c)
        half = 1 << (c - 1)
        spec = limbs.spec_for("bls_fr")
        scalars = [rng.randrange(bls.R) for _ in range(n)]
        sl = jnp.asarray(spec.to_limbs(scalars))
        inf = jnp.zeros((n,), bool)
        fenc, starts, occ, lane_order, inv_order = m._schedule(
            L, c, nw, half, sl, inf)
        fenc, starts, occ, lane_order = (
            np.asarray(fenc), np.asarray(starts), np.asarray(occ),
            np.asarray(lane_order),
        )
        absd, sgn = m.signed_digits(sl, c)
        absd, sgn = np.asarray(absd), np.asarray(sgn)
        # host rebuild: per (window, |digit|) lists of (pt, sign)
        buckets = {}
        for w in range(nw):
            for j in range(n):
                d = int(absd[w, j])
                if d:
                    buckets.setdefault((w, d), []).append(
                        (j, int(sgn[w, j]))
                    )
        # occupancy-sorted lanes are a permutation of (w, b) lanes
        assert occ.sum() == sum(len(v) for v in buckets.values())
        assert (occ[:-1] >= occ[1:]).all()  # descending
        for lane_pos, lane in enumerate(lane_order):
            w, b = int(lane) // half, int(lane) % half + 1
            want = sorted(buckets.get((w, b), []))
            got = sorted(
                (int(fenc[starts[lane_pos] + r]) >> 1,
                 int(fenc[starts[lane_pos] + r]) & 1)
                for r in range(occ[lane_pos])
            )
            assert got == want, (w, b)
