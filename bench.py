"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Headline metric: single-chip G1 Pippenger MSM throughput (points/s) at
2^SIZE points — the prover's dominant kernel (the reference benches the
same kernel: /root/reference/benches/slow.rs at 2^16; BASELINE.json asks
for 2^20+). Kernel: ops/msm3.py tree-fold pipeline (signed windows,
occupancy-grouped gathers, log-depth Pallas folds).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is the reference's measured-class CPU throughput for the same
kernel: bellman's multicore Pippenger at ~1.0e6 points/s for 2^20 G1 MSM
on a modern many-core CPU (criterion harness class, documented estimate).

``roofline_frac``: measured vs the speed-of-light arithmetic bound at the
chip's honestly-calibrated u32 VPU-op peak (benches/op_probe.py: ~1.55e12
marginal u32 ops/s on v5e; block_until_ready does not synchronize through
the axon tunnel, so the calibration uses device_get) — the BASELINE.json
north star is defined in these units (2^24 >= 70%).

Extra sub-metrics (FFT throughput, per-phase timings) are printed to
stderr; the driver consumes only the JSON line.

Env knobs: BENCH_MSM_LOG2 (default 20), BENCH_MSM_C (default 16),
BENCH_PEAK_U32_PER_S (default 1.55e12, the v5e calibration).
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_MSM_POINTS_PER_S = 1.0e6  # bellman multicore CPU class (see above)


def msm_roofline_u32_ops(n: int, c: int) -> int:
    from bellman_tpu.utils import profiling

    return profiling.ops_msm_g1(n, c)


def fft_roofline_u32_ops(n: int) -> int:
    from bellman_tpu.utils import profiling

    return profiling.ops_fft(n)


def main():
    size_log = int(os.environ.get("BENCH_MSM_LOG2", "20"))
    c = int(os.environ.get("BENCH_MSM_C", "16"))
    peak = float(os.environ.get("BENCH_PEAK_U32_PER_S", "1.55e12"))
    n = 1 << size_log

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, fft, limbs, msm2, msm3

    spec = limbs.spec_for("bls_fr")
    spec_fq = limbs.spec_for("bls_fq")
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
            jnp.asarray(spec_fq.to_mont_host([int(p.x) for p in pool_pts]))
        )
    )
    ys = np.asarray(
        jax.device_get(
            jnp.asarray(spec_fq.to_mont_host([int(p.y) for p in pool_pts]))
        )
    )
    reps = n // pool
    X = jnp.asarray(np.tile(xs, (1, reps)))
    Y = jnp.asarray(np.tile(ys, (1, reps)))
    pts = ops.from_affine(X, Y)

    # uniform scalars < r: random 16-bit limbs, top limb below r's top
    # limb (a zeroed top limb would skew the digit distribution)
    scalars_np = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
        n, 16
    ).T.astype(np.uint32)
    scalars_np[15] = rng.integers(0, int(bls.R >> 240), n, dtype=np.uint32)
    sl = jnp.asarray(scalars_np)

    nw = msm2.num_windows(16, c)

    t0 = time.time()
    packed = msm2.PackedBases(ops, pts)
    jax.block_until_ready(packed.packed)
    pack_s = time.time() - t0

    # warmup (compile)
    t0 = time.time()
    r = msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        r = msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    dt = (time.time() - t0) / iters
    points_per_s = n / dt
    msm_frac = (msm_roofline_u32_ops(n, c) / peak) / dt

    print(
        f"[bench] G1 MSM 2^{size_log} c={c}: {dt*1e3:.1f} ms/iter "
        f"({points_per_s/1e6:.3f} M points/s; roofline {msm_frac*100:.2f}%; "
        f"first-call {compile_s:.1f}s, pack {pack_s:.1f}s)",
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

    def run_fft():
        # block_until_ready does not synchronize through the axon
        # tunnel; device_get of a checksum slice is the honest sync
        out = f(a)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])

    run_fft()
    t0 = time.time()
    for _ in range(iters):
        run_fft()
    fft_dt = (time.time() - t0) / iters
    fft_frac = (fft_roofline_u32_ops(m) / peak) / fft_dt
    print(
        f"[bench] Fr FFT 2^{fft_log}: {fft_dt*1e3:.1f} ms "
        f"({m/fft_dt/1e6:.2f} M coeffs/s; roofline {fft_frac*100:.2f}%)",
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
                "roofline_frac": round(msm_frac, 4),
                "fft_roofline_frac": round(fft_frac, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
