"""G1/G2 MSM throughput sweep (the reference benches a single 2^16 G1 MSM,
/root/reference/benches/slow.rs; BASELINE.json asks for 2^16-2^24).

Usage: python benches/msm_bench.py [--sizes 16,18,20] [--g2] [--c 16]
Runs on the default JAX backend (the real TPU chip under axon).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,18,20")
    ap.add_argument("--g2", action="store_true")
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm

    spec = limbs.spec_for("bls_fr")
    fq = limbs.spec_for("bls_fq")
    ops = curve.g2_ops() if args.g2 else curve.g1_ops()
    name = "G2" if args.g2 else "G1"
    rng = np.random.default_rng(0)

    for size_log in (int(s) for s in args.sizes.split(",")):
        n = 1 << size_log
        # synthetic base pool tiled to n (arithmetic cost is scalar-driven)
        pool = 64
        if args.g2:
            g = bls.G2Affine.generator()
            pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
            base = curve.g2_to_device(pts)
        else:
            g = bls.G1Affine.generator()
            pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
            base = curve.g1_to_device(pts)
        reps = n // pool
        dev_pts = tuple(
            jnp.asarray(np.tile(np.asarray(jax.device_get(c)), (1,) * (c.ndim - 1) + (reps,)))
            for c in base
        )
        scalars = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(n, 16).T.astype(np.uint32)
        scalars[15] = 0
        sl = jnp.asarray(scalars)

        t0 = time.time()
        r = msm.msm(ops, dev_pts, sl, c=args.c)
        jax.block_until_ready(r)
        compile_s = time.time() - t0

        t0 = time.time()
        for _ in range(args.iters):
            r = msm.msm(ops, dev_pts, sl, c=args.c)
            jax.block_until_ready(r)
        dt = (time.time() - t0) / args.iters
        print(
            f"{name} MSM 2^{size_log}: {dt*1e3:9.1f} ms  "
            f"{n/dt/1e6:7.3f} M points/s  (first call {compile_s:.0f}s)"
        )


if __name__ == "__main__":
    main()
