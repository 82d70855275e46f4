"""Pallas kernel math vs the jnp limb path (interpret mode on CPU;
real-Mosaic compilation is exercised on TPU by bench.py)."""

import random

import jax.numpy as jnp
import pytest

from bellman_tpu.ops import limbs, pallas_kernels as pk


@pytest.mark.parametrize("spec_name", ["bls_fr", "bls_fq"])
def test_mont_mul_kernel_matches(spec_name):
    spec = limbs.spec_for(spec_name)
    rng = random.Random(1)
    n = pk.TILE_N * 2
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    got = spec.from_mont_host(pk.mont_mul(spec, a, b, True))
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


def test_h_pointwise_kernel_matches():
    spec = limbs.spec_for("bls_fr")
    rng = random.Random(2)
    n = pk.TILE_N
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    zs = [rng.randrange(spec.p) for _ in range(n)]
    zi = rng.randrange(1, spec.p)
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    c = jnp.asarray(spec.to_mont_host(zs))
    z = jnp.asarray(spec.to_mont_host([zi]))
    got = spec.from_mont_host(pk.h_pointwise(spec, a, b, c, True, zinv=z))
    assert got == [
        ((x * y - w) * zi) % spec.p for x, y, w in zip(xs, ys, zs)
    ]


def test_kernel_safe_ops_match_scan_ops():
    spec = limbs.spec_for("bls_fq")
    rng = random.Random(3)
    n = 64
    xs = [rng.randrange(spec.p) for _ in range(n)]
    ys = [rng.randrange(spec.p) for _ in range(n)]
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    p = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(limbs.mont_mul_kernel(spec, a, b, p)),
        np.asarray(limbs.mont_mul(spec, a, b)),
    )
    np.testing.assert_array_equal(
        np.asarray(limbs.sub_kernel(spec, a, b, p)),
        np.asarray(limbs.sub(spec, a, b)),
    )
    np.testing.assert_array_equal(
        np.asarray(limbs.add_kernel(spec, a, b, p)),
        np.asarray(limbs.add(spec, a, b)),
    )
