"""Adversarial MSM scalar distributions at non-toy n (on-chip).

The reference's Pippenger has an O(n) per-bucket guarantee by
construction (every scalar lands in exactly one bucket per window;
buckets are summed sequentially — /root/reference/src/multiexp.rs:242-265).
The v3 tree-fold pipeline instead groups lanes by occupancy and the
docstring advertises the heavy-lane path for pathological skew
(ops/msm3.py:26-28). This bench measures those claims at scale:

  uniform      baseline (same generator as bench.py)
  same-scalar  all n scalars identical: every window collapses to ONE
               lane of occupancy n -> nw heavy lanes, V = pow2ceil(n)
  hot-bucket   90% of scalars share one value, 10% uniform: one heavy
               lane per window PLUS a normal residue schedule
  low-entropy  scalars < 2^16: only window 0 populated

Usage: python benches/msm_adversarial_bench.py [--log2 18] [--c 16]
           [--iters 2] [--dists uniform,same-scalar,hot-bucket,low-entropy]
Emits one JSON line per distribution; correctness is cross-checked
against the uniform-path result structure by recomputing a small
prefix (n=4096) against the host oracle for each distribution.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scalars(dist: str, n: int, rng) -> np.ndarray:
    import bellman_tpu.algebra.bls12_381 as bls

    if dist == "uniform":
        sl = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
            n, 16).T.astype(np.uint32)
        sl[15] = rng.integers(0, int(bls.R >> 240), n, dtype=np.uint32)
        return sl
    if dist == "same-scalar":
        one = build_scalars("uniform", 1, rng)
        return np.tile(one, (1, n))
    if dist == "hot-bucket":
        sl = build_scalars("uniform", n, rng)
        hot = build_scalars("uniform", 1, rng)
        mask = rng.random(n) < 0.9
        sl[:, mask] = hot
        return sl
    if dist == "low-entropy":
        sl = np.zeros((16, n), dtype=np.uint32)
        sl[0] = rng.integers(0, 1 << 16, n, dtype=np.uint32)
        return sl
    raise SystemExit(f"unknown dist {dist}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=18)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--check-n", type=int, default=4096)
    ap.add_argument(
        "--dists", default="uniform,same-scalar,hot-bucket,low-entropy")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2, msm3

    spec_fq = limbs.spec_for("bls_fq")
    ops = curve.g1_ops()
    rng = np.random.default_rng(7)
    n = 1 << args.log2

    pool = 64
    g = bls.G1Affine.generator()
    pool_pts = [g.mul_int(int(k) + 1)
                for k in rng.integers(1, 2 ** 62, pool)]
    xs = np.asarray(spec_fq.to_mont_host([int(p.x) for p in pool_pts]),
                    dtype=np.uint32)
    ys = np.asarray(spec_fq.to_mont_host([int(p.y) for p in pool_pts]),
                    dtype=np.uint32)
    X = jnp.asarray(np.tile(xs, (1, n // pool)))
    Y = jnp.asarray(np.tile(ys, (1, n // pool)))
    packed = msm2.PackedBases(ops, ops.from_affine(X, Y))
    jax.block_until_ready(packed.packed)

    mismatches = []
    for dist in args.dists.split(","):
        sl_np = build_scalars(dist, n, np.random.default_rng(11))
        sl = jnp.asarray(sl_np)

        t0 = time.time()
        r = msm3.msm3(ops, packed, sl, c=args.c, point_cls=bls.G1Affine)
        first_s = time.time() - t0

        t0 = time.time()
        for _ in range(args.iters):
            r = msm3.msm3(ops, packed, sl, c=args.c,
                          point_cls=bls.G1Affine)
        dt = (time.time() - t0) / args.iters

        # correctness: host oracle over a prefix with the same shape of
        # skew (full-n oracle at 2^18 would take hours on host)
        m = min(args.check_n, n)
        prefix = msm3.msm3(ops, packed.slice(0, m), sl[:, :m],
                           c=args.c, point_cls=bls.G1Affine)
        idx = np.arange(m) % pool
        # reconstruct scalar ints from 16x16-bit limbs
        ints = [sum(int(sl_np[k, j]) << (16 * k) for k in range(16))
                for j in range(m)]
        want = bls.G1Affine.identity()
        for i, s in zip(idx, ints):
            if s:
                want = want + pool_pts[i].mul_int(s)
        ok = (prefix == want)
        if not ok:
            mismatches.append(dist)

        print(json.dumps({
            "metric": f"g1_msm_2e{args.log2}_{dist}_points_per_s",
            "value": round(n / dt, 1),
            "unit": "points/s",
            "first_call_s": round(first_s, 1),
            "prefix_check": bool(ok),
        }), flush=True)
        print(f"[adv] {dist}: {dt*1e3:.1f} ms/iter "
              f"({n/dt/1e6:.3f} M points/s; first {first_s:.1f}s; "
              f"prefix@{m} {'ok' if ok else 'MISMATCH'})",
              file=sys.stderr, flush=True)

    if mismatches:
        # scripted consumers must not record throughput from a
        # wrong-answer pipeline (ADVICE r3)
        print(f"[adv] FAILED prefix checks: {mismatches}",
              file=sys.stderr, flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
