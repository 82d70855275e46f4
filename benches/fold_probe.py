"""Probe the Pallas fold kernels' per-add cost on the chip.

Times level0_fold (mixed add from prep) and pair_fold (full Jacobian
add) at a fixed lane width and reports G1-adds/s plus the implied
Fq-mul throughput — comparing against the pure mont_mul chain peak
(benches/peak_probe.py) isolates how much of the MSM gap is the add
formula/kernel body vs the schedule around it.

Usage: python benches/fold_probe.py [--log2w 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, iters=5):
    """Honest device timing: block_until_ready does NOT synchronize
    through the axon tunnel — sync with a device_get of a checksum."""
    import jax

    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2w", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, pallas_fold
    from bellman_tpu.utils.profiling import mults_field_mul

    ops = curve.g1_ops()
    W = 1 << args.log2w
    RP = pallas_fold.rows_prep(ops)
    spec_q = limbs.spec_for("bls_fq")
    C = spec_q.L
    rng = np.random.default_rng(0)

    # random-ish valid prep lanes from a small pool of points
    g = bls.G1Affine.generator()
    pool = [g.mul_int(int(k) + 2) for k in rng.integers(1, 2**62, 64)]
    xs = spec_q.to_mont_host([int(p.x) for p in pool])
    ys = spec_q.to_mont_host([int(p.y) for p in pool])
    reps = W // 64
    prep = np.zeros((RP, W), np.uint32)
    prep[0:C] = np.tile(xs, (1, reps))
    prep[C : 2 * C] = np.tile(ys, (1, reps))
    prep[2 * C] = 1
    prep_dev = jnp.asarray(prep)

    t = timeit(lambda p: pallas_fold.level0_fold(ops, p), prep_dev)
    n_adds = W // 2
    fqmul_per_mixed = 14  # mixed madd-2007-bl class
    print(
        f"level0_fold 2^{args.log2w} lanes: {t*1e3:8.2f} ms  "
        f"{n_adds/t/1e6:7.2f} M adds/s  "
        f"(~{n_adds*fqmul_per_mixed/t/1e9:6.2f} G Fq-mul/s equiv)"
    )

    jac = pallas_fold.level0_fold(ops, prep_dev)  # (RJ, W/2)
    t = timeit(lambda j: pallas_fold.pair_fold(ops, j), jac)
    n_adds = jac.shape[-1] // 2
    fqmul_per_full = 16  # add-2007-bl full Jacobian class
    print(
        f"pair_fold  2^{args.log2w - 1} lanes: {t*1e3:8.2f} ms  "
        f"{n_adds/t/1e6:7.2f} M adds/s  "
        f"(~{n_adds*fqmul_per_full/t/1e9:6.2f} G Fq-mul/s equiv)"
    )


if __name__ == "__main__":
    main()
