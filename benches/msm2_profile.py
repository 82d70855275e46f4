"""Per-phase steady-state timing of the msm2 pipeline on the chip.

Usage: python benches/msm2_profile.py [--size 20] [--c 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, iters=3):
    import jax

    jax.block_until_ready(fn())  # warm
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=20)
    ap.add_argument("--c", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2
    from bellman_tpu.ops.pallas_affine import rows_aff

    spec = limbs.spec_for("bls_fr")
    ops = curve.g1_ops()
    rng = np.random.default_rng(0)
    n = 1 << args.size
    c = args.c

    pool = 64
    g = bls.G1Affine.generator()
    pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    base = curve.g1_to_device(pts)
    reps = n // pool
    dev_pts = tuple(
        jnp.asarray(
            np.tile(np.asarray(jax.device_get(x)), (1,) * (x.ndim - 1) + (reps,))
        )
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
    jax.block_until_ready(packed.packed)

    L = 16
    nw = msm2.num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    levels = msm2._width_levels(W0)

    t_sched = timeit(
        lambda: msm2._schedule(
            L, c, nw, half, W0, len(levels), sl, packed.inf_mask
        )
    )
    print(f"schedule (sort+hist+argsort): {t_sched*1e3:9.1f} ms", flush=True)

    fenc_sorted, starts_s, occ_s, lane_order, probe_dev = msm2._schedule(
        L, c, nw, half, W0, len(levels), sl, packed.inf_mask
    )
    probe = np.asarray(jax.device_get(probe_dev))
    segs = msm2._plan_segments(probe, levels)
    print(f"segments: {segs}", flush=True)

    def run_all():
        acc = jnp.zeros((rows_aff(ops), W0), jnp.uint32)
        for r0, nr, width in segs:
            acc = msm2._run_seg(
                ops, width, W0, "pallas", packed.packed, fenc_sorted,
                starts_s, occ_s, jnp.uint32(r0), acc, jnp.int32(nr)
            )
        return acc

    t_acc = timeit(run_all)
    nrounds = sum(s[1] for s in segs)
    print(
        f"accumulate ({nrounds} rounds, {len(segs)} segs): {t_acc*1e3:9.1f} ms"
        f"  ({t_acc/nrounds*1e3:.1f} ms/round)",
        flush=True,
    )

    # single full-width segment of 32 rounds, isolated
    acc0 = jnp.zeros((rows_aff(ops), W0), jnp.uint32)
    t_seg = timeit(
        lambda: msm2._run_seg(
            ops, W0, W0, "pallas", packed.packed, fenc_sorted,
            starts_s, occ_s, jnp.uint32(0),
            jnp.zeros((rows_aff(ops), W0), jnp.uint32), jnp.int32(32)
        )
    )
    print(
        f"one full-width 32-round seg: {t_seg*1e3:9.1f} ms "
        f"({t_seg/32*1e3:.2f} ms/round at W0={W0})",
        flush=True,
    )

    acc = run_all()
    jax.block_until_ready(acc)
    t_tot = timeit(
        lambda: msm2._bucket_and_tot(ops, nw, half, acc, lane_order)
    )
    print(f"bucket totals (2 seg scans): {t_tot*1e3:9.1f} ms", flush=True)

    tot = msm2._bucket_and_tot(ops, nw, half, acc, lane_order)
    jax.block_until_ready(tot)
    t0 = time.time()
    tot_pts = curve.jacobian_to_host(ops, msm2._unpack1(ops, tot), bls.G1Affine)
    r = msm2.fold_host(tot_pts, nw, c, bls.G1Affine.identity())
    t_fold = time.time() - t0
    print(f"host pull + window fold: {t_fold*1e3:9.1f} ms", flush=True)

    total = t_sched + t_acc + t_tot + t_fold
    print(
        f"TOTAL {total*1e3:9.1f} ms -> {n/total/1e6:.3f} M points/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
