"""Device limb arithmetic vs the host big-int oracle.

Mirrors the reference's kernel test strategy (device kernels cross-checked
against an obviously-correct implementation — SURVEY.md §4)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.ops import limbs
from bellman_tpu.ops.limbs import FieldSpec, Fq2Ops, FieldOps


SPECS = [
    FieldSpec("dummy", 64513),
    FieldSpec("bls_fr", limbs.spec_for("bls_fr").p),
    FieldSpec("bls_fq", limbs.spec_for("bls_fq").p),
]


@pytest.fixture(params=SPECS, ids=[s.name for s in SPECS])
def spec(request):
    return request.param


def rand_ints(spec, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(spec.p) for _ in range(n)]


def test_limb_roundtrip(spec):
    xs = rand_ints(spec, 17) + [0, 1, spec.p - 1]
    arr = spec.to_limbs(xs)
    assert spec.from_limbs(arr) == [x % spec.p for x in xs]


def test_mont_roundtrip(spec):
    xs = rand_ints(spec, 9, seed=1) + [0, 1, spec.p - 1]
    m = jnp.asarray(spec.to_mont_host(xs))
    back = limbs.from_mont(spec, m)
    assert spec.from_limbs(back) == [x % spec.p for x in xs]
    # device to_mont matches host to_mont
    plain = jnp.asarray(spec.to_limbs(xs))
    m2 = limbs.to_mont(spec, plain)
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))


def test_add_sub_neg(spec):
    n = 33
    xs, ys = rand_ints(spec, n, 2), rand_ints(spec, n, 3)
    xs[0], ys[0] = 0, 0
    xs[1], ys[1] = spec.p - 1, spec.p - 1
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    assert spec.from_mont_host(limbs.add(spec, a, b)) == [
        (x + y) % spec.p for x, y in zip(xs, ys)
    ]
    assert spec.from_mont_host(limbs.sub(spec, a, b)) == [
        (x - y) % spec.p for x, y in zip(xs, ys)
    ]
    assert spec.from_mont_host(limbs.neg(spec, a)) == [(-x) % spec.p for x in xs]


def test_mont_mul(spec):
    n = 33
    xs, ys = rand_ints(spec, n, 4), rand_ints(spec, n, 5)
    xs[0], ys[1] = 0, 0
    xs[2], ys[2] = spec.p - 1, spec.p - 1
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(ys))
    got = spec.from_mont_host(limbs.mont_mul(spec, a, b))
    assert got == [(x * y) % spec.p for x, y in zip(xs, ys)]


def test_mul_broadcast_scalar(spec):
    xs = rand_ints(spec, 8, 6)
    c = rand_ints(spec, 1, 7)
    a = jnp.asarray(spec.to_mont_host(xs))
    b = jnp.asarray(spec.to_mont_host(c))  # (L, 1)
    got = spec.from_mont_host(limbs.mont_mul(spec, a, b))
    assert got == [(x * c[0]) % spec.p for x in xs]


def test_pow_and_inv(spec):
    xs = rand_ints(spec, 5, 8) + [1, spec.p - 1]
    a = jnp.asarray(spec.to_mont_host(xs))
    e = 12345
    bits = jnp.asarray(limbs.exp_bits_host(e))
    got = spec.from_mont_host(limbs.pow_bits(spec, a, bits))
    assert got == [pow(x, e, spec.p) for x in xs]
    inv = spec.from_mont_host(limbs.inv(spec, a))
    assert inv == [pow(x, -1, spec.p) for x in xs]


def test_batch_inv(spec):
    xs = rand_ints(spec, 16, 9)
    xs[3] = 0
    xs[7] = 0
    a = jnp.asarray(spec.to_mont_host(xs))
    got = spec.from_mont_host(limbs.batch_inv(spec, a))
    want = [pow(x, -1, spec.p) if x else 0 for x in xs]
    assert got == want


def test_is_zero_select(spec):
    xs = [0, 1, 0, spec.p - 1]
    a = jnp.asarray(spec.to_mont_host(xs))
    z = limbs.is_zero(spec, a)
    np.testing.assert_array_equal(np.asarray(z), [True, False, True, False])
    b = jnp.asarray(spec.to_mont_host([9, 9, 9, 9]))
    sel = limbs.select(z, a, b)
    assert spec.from_mont_host(sel) == [0, 9, 0, 9]


def test_fq2_ops():
    spec = limbs.spec_for("bls_fq")
    ops = Fq2Ops(spec)
    p = spec.p
    rng = random.Random(11)
    n = 9
    xs = [(rng.randrange(p), rng.randrange(p)) for _ in range(n)]
    ys = [(rng.randrange(p), rng.randrange(p)) for _ in range(n)]
    xs[0] = (0, 0)
    a = jnp.asarray(ops.to_mont_host(xs))
    b = jnp.asarray(ops.to_mont_host(ys))

    def fq2_mul(x, y):
        c0 = (x[0] * y[0] - x[1] * y[1]) % p
        c1 = (x[0] * y[1] + x[1] * y[0]) % p
        return (c0, c1)

    got = ops.from_mont_host(ops.mul(a, b))
    assert got == [fq2_mul(x, y) for x, y in zip(xs, ys)]
    got = ops.from_mont_host(ops.sqr(a))
    assert got == [fq2_mul(x, x) for x in xs]
    got = ops.from_mont_host(ops.add(a, b))
    assert got == [((x[0] + y[0]) % p, (x[1] + y[1]) % p) for x, y in zip(xs, ys)]
    z = ops.is_zero(a)
    np.testing.assert_array_equal(np.asarray(z)[:2], [True, False])
    one = ops.one((n,))
    got = ops.from_mont_host(ops.mul(a, one))
    assert got == xs


def test_jit_compatible():
    spec = limbs.spec_for("bls_fr")
    xs = rand_ints(spec, 4, 12)
    a = jnp.asarray(spec.to_mont_host(xs))

    @jax.jit
    def f(a):
        return limbs.mont_mul(spec, a, a)

    got = spec.from_mont_host(f(a))
    assert got == [(x * x) % spec.p for x in xs]
