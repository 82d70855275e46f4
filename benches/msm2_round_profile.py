"""Micro-profile of one msm2 accumulate round's pieces at full width.

Usage: python benches/msm2_round_profile.py [--w0 524288]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, iters=5):
    import jax

    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w0", type=int, default=524288)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2, pallas_affine
    from bellman_tpu.ops.pallas_madd import rows_add, _pad8
    from bellman_tpu.ops.pallas_affine import rows_aff

    ops = curve.g1_ops()
    W0 = args.w0
    C = 24
    RAFF = rows_aff(ops)
    RD = rows_add(ops)
    rng = np.random.default_rng(0)

    g = bls.G1Affine.generator()
    pool = 64
    pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    base = curve.g1_to_device(pts)
    spec_q = limbs.spec_for("bls_fq")

    # build a plausible acc (nonempty lanes with valid points) and addend
    xs = np.asarray(jax.device_get(base[0])).reshape(C, pool)
    ys = np.asarray(jax.device_get(base[1])).reshape(C, pool)
    reps = W0 // pool
    acc = np.zeros((RAFF, W0), np.uint32)
    acc[0:C] = np.tile(xs, (1, reps))
    acc[C:2 * C] = np.tile(ys, (1, reps))
    acc[2 * C] = 1
    add = np.zeros((RD, W0), np.uint32)
    perm = rng.permutation(W0)
    add[0:C] = np.tile(xs, (1, reps))[:, perm]
    add[C:2 * C] = np.tile(ys, (1, reps))[:, perm]
    add[_pad8(2 * C)] = 1
    acc = jnp.asarray(acc)
    add = jnp.asarray(add)

    # full point packed array + random indices: the per-round gather
    n = 1 << 20
    reps_n = n // pool
    dev_pts = tuple(
        jnp.asarray(np.tile(np.asarray(jax.device_get(x)), (1, reps_n)))
        for x in base
    )
    packed, _ = msm2.pack_points(ops, dev_pts)
    jax.block_until_ready(packed)
    idx = jnp.asarray(rng.integers(0, n, W0).astype(np.int32))

    t = timeit(lambda: jnp.take(packed, idx, axis=1))
    print(f"gather (24, {W0}) from 2^20 cols: {t*1e3:8.2f} ms", flush=True)

    tab = jnp.take(packed, idx, axis=1)

    def unpack_round(coords):
        x, y = msm2._unpack_coords(C, coords)
        aux = jnp.zeros((8, W0), jnp.uint32).at[0].set(1)
        return jnp.concatenate(
            [x, y, jnp.zeros((_pad8(2 * C) - 2 * C, W0), jnp.uint32), aux],
            axis=0,
        )

    up = jax.jit(unpack_round)
    t = timeit(lambda: up(tab))
    print(f"unpack+concat addend:          {t*1e3:8.2f} ms", flush=True)

    t = timeit(lambda: pallas_affine.ba_tree_up(ops, acc, add))
    print(f"K1 tree_up:                    {t*1e3:8.2f} ms", flush=True)

    tree = pallas_affine.ba_tree_up(ops, acc, add)
    roots = pallas_affine.ba_roots(ops, tree)
    t = timeit(lambda: pallas_affine.ba_invert_roots(ops, roots))
    print(f"K2 invert_roots (nb={W0//2048}):      {t*1e3:8.2f} ms", flush=True)

    invroots = pallas_affine.ba_invert_roots(ops, roots)
    allbut = pallas_affine.ba_semi_allbut(ops, tree)
    nb = W0 // 2048
    SEMI = pallas_affine.SEMI
    rep = jnp.broadcast_to(
        invroots[:, :, None], (invroots.shape[0], nb, SEMI)
    ).reshape(invroots.shape[0], nb * SEMI)
    t = timeit(lambda: pallas_affine.mul_lazy(ops, allbut, rep))
    print(f"K2c mul_lazy:                  {t*1e3:8.2f} ms", flush=True)

    semi_inv = pallas_affine.mul_lazy(ops, allbut, rep)
    t = timeit(
        lambda: pallas_affine.ba_apply(
            ops, jnp.asarray(acc), add, tree, semi_inv
        )
    )
    print(f"K3 apply:                      {t*1e3:8.2f} ms", flush=True)

    t = timeit(lambda: pallas_affine.affine_round(ops, jnp.asarray(acc), add))
    print(f"full affine_round:             {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
