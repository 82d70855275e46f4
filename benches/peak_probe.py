"""Probe the true on-chip Fq Montgomery-multiply peak.

Runs a K-deep chain of mont_mul_kernel (flat CIOS) over (L, N) tiles
three ways and reports Fq-muls/s for each:
  1. plain jit (XLA fuses the flat graph)
  2. one Pallas kernel with an in-kernel fori-ish chain (static unroll)
  3. the scan-CIOS mont_mul_r chain under jit (the round-1 default)

The result calibrates utils/profiling's roofline denominator with a
measured number instead of PERF.md's suspect 9.4G figure.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bellman_tpu.ops import limbs


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    spec = limbs.spec_for("bls_fq")
    L = spec.L
    N = 1 << 16
    K = 32  # chain depth
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(47), "little") % spec.p for _ in range(256)]
    a = jnp.asarray(np.tile(spec.to_mont_host(vals), (1, N // 256)))
    b = jnp.asarray(np.tile(spec.to_mont_host(vals[::-1]), (1, N // 256)))

    total = K * N

    # 1. plain jit flat chain
    @jax.jit
    def chain_flat(a, b):
        x = a
        for _ in range(K):
            x = limbs.mont_mul_kernel(spec, x, b)
        return x

    t = timeit(chain_flat, a, b)
    print(f"flat-jit      : {t*1e3:8.2f} ms  {total/t/1e9:7.3f} G Fq-mul/s")

    # 2. pallas kernel, in-kernel chain
    TILE = 512
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))

    def kernel(p_ref, a_ref, b_ref, o_ref):
        p = p_ref[:]
        x = a_ref[:]
        bb = b_ref[:]
        for _ in range(K):
            x = limbs.mont_mul_kernel(spec, x, bb, p)
        o_ref[:] = x

    @jax.jit
    def chain_pallas(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((L, 1), lambda i: (0, 0)),
                pl.BlockSpec((L, TILE), lambda i: (0, i)),
                pl.BlockSpec((L, TILE), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i)),
        )(p_arr, a, b)

    t = timeit(chain_pallas, a, b)
    print(f"pallas        : {t*1e3:8.2f} ms  {total/t/1e9:7.3f} G Fq-mul/s")

    # 3. scan-CIOS chain
    @jax.jit
    def chain_scan(a, b):
        x = a
        for _ in range(K):
            x = limbs.mont_mul_r(spec, x, b)
        return x

    t = timeit(chain_scan, a, b)
    print(f"scan-jit      : {t*1e3:8.2f} ms  {total/t/1e9:7.3f} G Fq-mul/s")


if __name__ == "__main__":
    main()
