"""Isolate _run_seg per-round vs per-segment costs at full width."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, iters=3):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2
    from bellman_tpu.ops.pallas_affine import rows_aff

    spec = limbs.spec_for("bls_fr")
    ops = curve.g1_ops()
    rng = np.random.default_rng(0)
    n = 1 << 20
    c = 16
    L, nw, half = 16, 16, 1 << 15
    W0 = nw * half

    pool = 64
    g = bls.G1Affine.generator()
    pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    base = curve.g1_to_device(pts)
    dev_pts = tuple(
        jnp.asarray(np.tile(np.asarray(jax.device_get(x)), (1, n // pool)))
        for x in base
    )
    scalars = (
        np.frombuffer(rng.bytes(n * 32), dtype="<u2")
        .reshape(n, 16)
        .T.astype(np.uint32)
    )
    scalars[15] = rng.integers(0, int(bls.R >> 240), n, dtype=np.uint32)
    sl = jnp.asarray(scalars)
    packed = msm2.PackedBases(ops, dev_pts)
    levels = msm2._width_levels(W0)
    fenc_sorted, starts_s, occ_s, lane_order, probe = msm2._schedule(
        L, c, nw, half, W0, len(levels), sl, packed.inf_mask
    )
    jax.block_until_ready(fenc_sorted)

    def seg(nr):
        return msm2._run_seg(
            ops, W0, W0, "pallas", packed.packed, fenc_sorted, starts_s,
            occ_s, jnp.uint32(0),
            jnp.zeros((rows_aff(ops), W0), jnp.uint32), jnp.int32(nr)
        )

    for nr in (1, 2, 8, 32):
        t = timeit(lambda: seg(nr))
        print(f"_run_seg nrounds={nr:3d}: {t*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
