"""Fr FFT / h-pipeline throughput sweep (BASELINE.json: 2^12-2^24).

Usage: python benches/fft_bench.py [--sizes 12,16,20] [--pipeline]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="12,16,20")
    ap.add_argument("--pipeline", action="store_true",
                    help="bench the full 7-FFT h-pipeline instead")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import fft, limbs

    spec = limbs.spec_for("bls_fr")
    rng = np.random.default_rng(0)

    for size_log in (int(s) for s in args.sizes.split(",")):
        n = 1 << size_log
        plan = fft.get_plan(spec, bls.Fr, size_log)
        arrs = []
        for _ in range(3 if args.pipeline else 1):
            raw = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(n, 16).T.astype(np.uint32)
            raw[15] = 0
            arrs.append(jnp.asarray(raw))

        if args.pipeline:
            f = fft.h_pipeline_jit(plan)
            xs = arrs
            label = "h-pipeline"
            work = 7 * n * size_log  # butterflies
        else:
            f = jax.jit(plan.fft)
            xs = arrs[:1]
            label = "FFT"
            work = n * size_log

        r = f(*xs)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(args.iters):
            r = f(*xs)
            jax.block_until_ready(r)
        dt = (time.time() - t0) / args.iters
        print(
            f"Fr {label} 2^{size_log}: {dt*1e3:9.2f} ms  "
            f"{work/dt/1e6:8.1f} M butterflies/s"
        )


if __name__ == "__main__":
    main()
