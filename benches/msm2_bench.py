"""msm3 (tree-fold pipeline) throughput on the chip.

Usage: python benches/msm2_bench.py [--sizes 18,20] [--c 16] [--g2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="18,20")
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--g2", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2, msm3

    spec = limbs.spec_for("bls_fr")
    ops = curve.g2_ops() if args.g2 else curve.g1_ops()
    name = "G2" if args.g2 else "G1"
    cls = bls.G2Affine if args.g2 else bls.G1Affine
    rng = np.random.default_rng(0)

    for size_log in (int(s) for s in args.sizes.split(",")):
        n = 1 << size_log
        pool = 64
        g = cls.generator()
        pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
        base = curve.g2_to_device(pts) if args.g2 else curve.g1_to_device(pts)
        reps = n // pool
        dev_pts = tuple(
            jnp.asarray(
                np.tile(
                    np.asarray(jax.device_get(c)), (1,) * (c.ndim - 1) + (reps,)
                )
            )
            for c in base
        )
        # uniform scalars < r: random 16-bit limbs with the top limb
        # drawn below r's top limb (realistic digit distribution — a
        # zeroed top limb funnels all carry digits into one bucket and
        # the occupancy-sorted schedule degrades to its narrow tail)
        scalars = (
            np.frombuffer(rng.bytes(n * 32), dtype="<u2")
            .reshape(n, 16)
            .T.astype(np.uint32)
        )
        top = int(bls.R >> 240)
        scalars[15] = rng.integers(0, top, n, dtype=np.uint32)
        sl = jnp.asarray(scalars)

        t0 = time.time()
        packed = msm2.PackedBases(ops, dev_pts)
        jax.block_until_ready(packed.packed)
        pack_s = time.time() - t0
        print(f"[{name} 2^{size_log}] packed in {pack_s:.1f}s", flush=True)

        t0 = time.time()
        fn = msm3.msm3
        r = fn(ops, packed, sl, c=args.c, point_cls=cls, verbose=True)
        compile_s = time.time() - t0
        print(f"[{name} 2^{size_log}] first call {compile_s:.1f}s",
              flush=True)

        t0 = time.time()
        for _ in range(args.iters):
            r = fn(ops, packed, sl, c=args.c, point_cls=cls)
        dt = (time.time() - t0) / args.iters
        print(f"[{name} 2^{size_log}] steady-state phase breakdown:",
              flush=True)
        fn(ops, packed, sl, c=args.c, point_cls=cls, verbose=True)
        print(
            f"{name} msm3 2^{size_log} c={args.c}: {dt*1e3:9.1f} ms  "
            f"{n/dt/1e6:7.3f} M points/s  "
            f"(first call {compile_s:.0f}s, pack {pack_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
