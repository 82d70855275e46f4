"""Raw VPU op-rate probe: u32 multiply/add throughput inside a Pallas
kernel on VMEM-resident tiles, timed honestly (device_get on a checksum
— block_until_ready does NOT synchronize through the axon tunnel).

This calibrates the speed-of-light for limb arithmetic: an Fq (24x16-bit
limb) Montgomery mul costs ~1200 u32 multiplies + ~2400 adds/shifts, so
the achievable Fq-mul/s is bounded by these rates.

Usage: python benches/op_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, LANES = 512, 128          # block: 512x128 u32 = 256 KB
    G = 1024                      # grid steps (same block, dependent)

    def make(op, K):
        def kernel(a_ref, o_ref):
            x = a_ref[:]
            y = x | jnp.uint32(1)
            for i in range(K):
                if op == "mul":
                    x = x * y
                elif op == "mul16":
                    x = (x & jnp.uint32(0xFFFF)) * (y & jnp.uint32(0xFFFF))
                elif op == "add":
                    x = x + y
                elif op == "shift":
                    x = x >> jnp.uint32(3)
                y = y ^ x  # dependency so nothing folds away
            o_ref[:] = x + y

        @jax.jit
        def run(a):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
                grid=(G,),
                in_specs=[pl.BlockSpec((R, LANES), lambda g: (0, 0))],
                out_specs=pl.BlockSpec((R, LANES), lambda g: (0, 0)),
            )(a)

        return run

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(1, 1 << 31, (R, LANES), dtype=np.uint32))

    def bench(op, K, iters=4):
        run = make(op, K)
        jax.device_get(run(a)[0, :4])  # compile
        t0 = time.perf_counter()
        x = a
        for _ in range(iters):
            x = run(x)
        jax.device_get(x[0, :4])
        dt = (time.perf_counter() - t0) / iters
        nops = R * LANES * G * K * 2  # each iter: op + xor
        return dt, nops / dt

    # subtract fixed overhead via two K points
    for op in ("add", "mul", "mul16", "shift"):
        dt1, _ = bench(op, 64)
        dt2, _ = bench(op, 512)
        per_op = (dt2 - dt1) / (R * LANES * G * (512 - 64) * 2)
        rate = 1.0 / per_op
        print(
            f"{op:6s}: K=64 {dt1*1e3:7.2f} ms, K=512 {dt2*1e3:7.2f} ms "
            f"-> {rate/1e12:6.3f} T ops/s (marginal)"
        )


if __name__ == "__main__":
    main()
