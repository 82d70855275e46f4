"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

Mirrors the reference's parallel_fft==serial_fft consistency sweep
(/root/reference/src/domain.rs:465-498) with shard_map over
xla_force_host_platform_device_count devices (SURVEY.md §4)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bellman_tpu.algebra.engine import FrD
from bellman_tpu.algebra import bls12_381 as bls
from bellman_tpu.ops import curve, fft, limbs, msm2
from bellman_tpu.parallel import sharding


def cpu_mesh(t):
    devs = jax.local_devices(backend="cpu")
    if len(devs) < t:
        pytest.skip(f"need {t} cpu devices, have {len(devs)}")
    return sharding.make_mesh(devices=devs[:t])


CASES = [
    ("dummy", FrD, limbs.FieldSpec("dummy", 64513)),
    ("bls_fr", bls.Fr, limbs.spec_for("bls_fr")),
]


@pytest.mark.parametrize("name,field,spec", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize(
    "t,exp",
    [(2, 6), (8, 6), (4, 10)],
    # (4, 10): n_local/T = 64 exercises the all-to-all cross-DFT with
    # real lane slices ((8, 6) hits it with single-lane slices, (2, 6)
    # and the h-pipeline's 2^5 hit the small-block ring fallback)
)
def test_sharded_fft_matches_serial(name, field, spec, t, exp):
    mesh = cpu_mesh(t)
    n = 1 << exp
    rng = random.Random(exp * t)
    vals = [rng.randrange(field.MODULUS) for _ in range(n)]
    plan = fft.get_plan(spec, field, exp)
    splan = sharding.ShardedDomainPlan(spec, field, exp, mesh)

    a = jax.device_put(
        jnp.asarray(spec.to_mont_host(vals)), splan.block_spec
    )
    got_cyclic = splan.fft_sharded(a)
    got = splan.cyclic_to_natural_host(got_cyclic)
    want = plan.fft(jnp.asarray(spec.to_mont_host(vals)))
    np.testing.assert_array_equal(got, np.asarray(jax.device_get(want)))

    got_cyclic = splan.ifft_sharded(a)
    got = splan.cyclic_to_natural_host(got_cyclic)
    want = plan.ifft(jnp.asarray(spec.to_mont_host(vals)))
    np.testing.assert_array_equal(got, np.asarray(jax.device_get(want)))


@pytest.mark.parametrize("name,field,spec", CASES, ids=[c[0] for c in CASES])
def test_sharded_h_pipeline_matches_single(name, field, spec):
    mesh = cpu_mesh(8)
    exp = 5
    n = 1 << exp
    rng = random.Random(7)
    av = [rng.randrange(field.MODULUS) for _ in range(n)]
    bv = [rng.randrange(field.MODULUS) for _ in range(n)]
    cv = [rng.randrange(field.MODULUS) for _ in range(n)]

    plan = fft.get_plan(spec, field, exp)
    want = fft.h_pipeline(
        plan,
        jnp.asarray(spec.to_mont_host(av)),
        jnp.asarray(spec.to_mont_host(bv)),
        jnp.asarray(spec.to_mont_host(cv)),
    )
    want = np.asarray(jax.device_get(want)).copy()
    want[:, -1] = 0  # sharded version zeroes the dropped top coefficient

    splan = sharding.ShardedDomainPlan(spec, field, exp, mesh)
    da = jax.device_put(jnp.asarray(spec.to_mont_host(av)), splan.block_spec)
    db = jax.device_put(jnp.asarray(spec.to_mont_host(bv)), splan.block_spec)
    dc = jax.device_put(jnp.asarray(spec.to_mont_host(cv)), splan.block_spec)
    got_cyclic = splan.h_pipeline_sharded(da, db, dc)
    got = splan.cyclic_to_natural_host(got_cyclic)
    np.testing.assert_array_equal(got, want)


def test_sharded_msm_matches_naive():
    mesh = cpu_mesh(8)
    rng = random.Random(5)
    n = 64
    g = bls.G1Affine.generator()
    pts = [g.mul_int(rng.randrange(1, bls.R)) for _ in range(n)]
    scalars = [rng.randrange(bls.R) for _ in range(n)]
    spec = limbs.spec_for("bls_fr")
    ops = curve.g1_ops()

    # device points on the CPU mesh (v3 packed-affine layout)
    dp = curve.g1_to_device(pts)
    packed, inf = msm2.pack_points(ops, dp)
    packed = jax.device_put(
        np.asarray(jax.device_get(packed)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, sharding.AXIS)),
    )
    inf = jax.device_put(
        np.asarray(jax.device_get(inf)),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(sharding.AXIS)),
    )
    sl = jax.device_put(
        spec.to_limbs(scalars),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, sharding.AXIS)),
    )
    # c=4 matches the dryrun config (and pre-warms its compile cache
    # entry); jnp mode has no tile-alignment constraint on W0
    got = sharding.sharded_msm(ops, packed, inf, sl, mesh, bls.G1Affine, c=4)
    want = bls.G1Affine.identity()
    for p, s in zip(pts, scalars):
        want = want + p.mul_int(s)
    assert got == want


def test_distributed_entry_point():
    """Multi-host initialization path (SURVEY §2.4): single-process is a
    no-op fast path; the global mesh covers all (virtual) devices; the
    host-shard helper splits a batch axis by process."""
    from bellman_tpu.parallel import distributed

    assert distributed.initialize() is False  # no coordinator configured
    assert distributed.initialize(num_processes=1) is False

    mesh = distributed.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == (sharding.AXIS,)

    lo, hi = distributed.host_local_shard(1 << 10)
    assert (lo, hi) == (0, 1 << 10)  # single process owns everything

    d = distributed.describe()
    assert d["process_count"] == 1
    # mesh-size assertion above pins the real invariant; don't couple
    # to the conftest's 8-virtual-device XLA_FLAGS (ADVICE r4)
    assert d["global_devices"] == len(jax.devices())
    assert d["initialized_multiprocess"] is False
