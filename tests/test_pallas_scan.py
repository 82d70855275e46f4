"""Pallas scan kernels vs the jnp chunked-scan path (interpret mode).

Marked slow: interpret-mode Pallas inlines the flat combine per grid
step, which XLA-CPU compiles slowly (~16 min, ~12 GB peak). Run it in a
fresh process: after another heavy suite in the same process the XLA-CPU
compile has been seen to segfault. The TPU path is exercised by bench.py
and the device prover on real hardware."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.ops import curve, msm, pallas_scan


@pytest.mark.slow
def test_window_body_pallas_matches_jnp():
    pallas_scan.FORCE_INTERPRET = True
    try:
        rng = random.Random(0)
        g = bls.G1Affine.generator()
        n, c = 48, 4
        pts = [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]
        ops = curve.g1_ops()
        packed = msm._pack(ops, curve.g1_to_device(pts))
        digits = jnp.asarray(
            np.random.default_rng(0).integers(0, 1 << c, n, dtype=np.uint32)
        )
        ref = msm._window_sum_body(ops, c, packed, digits, use_pallas=False)
        got = msm._window_sum_body(ops, c, packed, digits, use_pallas=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    finally:
        pallas_scan.FORCE_INTERPRET = False
