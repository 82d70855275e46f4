"""Calibrate the per-chip u16-multiply peak for roofline reporting.

Times a pure elementwise Montgomery-multiply chain at large batch and
reports achieved u16-multiplies/s; benches use this as the denominator
for roofline fractions (bellman_tpu.utils.profiling).

Usage: python benches/microbench.py [--log2 20] [--chain 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=20)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--field", default="bls_fq", choices=["bls_fr", "bls_fq"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.ops import limbs
    from bellman_tpu.utils.profiling import mults_field_mul

    spec = limbs.spec_for(args.field)
    n = 1 << args.log2
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1 << 16, size=(spec.L, n), dtype=np.uint32)
    raw[-1] = 0  # keep < p
    a = jnp.asarray(raw)

    @jax.jit
    def chain(x):
        y = x
        for _ in range(args.chain):
            y = limbs.mont_mul_r(spec, y, x)
        return y

    r = chain(a)
    r.block_until_ready()
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        r = chain(a)
        r.block_until_ready()
    dt = (time.time() - t0) / iters

    total_mults = args.chain * n * mults_field_mul(spec.L)
    rate = total_mults / dt
    print(
        f"{args.field} mont_mul chain x{args.chain} @ 2^{args.log2}: "
        f"{dt*1e3:.2f} ms -> {rate/1e12:.3f} T u16-mults/s "
        f"({args.chain * n / dt / 1e6:.1f} M field-muls/s)"
    )


if __name__ == "__main__":
    main()
