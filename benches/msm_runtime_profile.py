"""Warm per-phase RUNTIME attribution for the msm3 pipeline.

Companion to lowering_profile.py (which attributes the first call):
this one times each phase's warm dispatch — schedule, per-group fold
pipelines, window totals, host finish — plus the end-to-end warm
iteration, so optimization effort lands on the phase that actually
dominates (PERF.md round-4 question: why is 2^18 at ~24% roofline?).

Honest sync through the axon tunnel = jax.device_get of a result
slice (block_until_ready does not synchronize; PERF.md).

Usage: python benches/msm_runtime_profile.py [--log2 18] [--c 16]
       [--iters 3]
Emits one JSON line per phase.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=18)
    ap.add_argument("--c", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2, msm3

    spec_fq = limbs.spec_for("bls_fq")
    ops = curve.g1_ops()
    rng = np.random.default_rng(0)
    n = 1 << args.log2
    c = args.c
    L = 16
    nw = msm2.num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    mode = msm2.default_mode()
    fold = msm3.default_fold()
    kind = msm3.default_totals()

    def emit(phase, dt, **kw):
        print(json.dumps({"phase": phase, "s": round(dt, 4), **kw}),
              flush=True)

    # same input generator as bench.py
    pool = 64
    g = bls.G1Affine.generator()
    pool_pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    xs = np.asarray(spec_fq.to_mont_host([int(p.x) for p in pool_pts]),
                    dtype=np.uint32)
    ys = np.asarray(spec_fq.to_mont_host([int(p.y) for p in pool_pts]),
                    dtype=np.uint32)
    X = jnp.asarray(np.tile(xs, (1, n // pool)))
    Y = jnp.asarray(np.tile(ys, (1, n // pool)))
    packed = msm2.PackedBases(ops, ops.from_affine(X, Y))
    sl_np = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
        n, 16).T.astype(np.uint32)
    sl_np[15] = rng.integers(0, int(bls.R >> 240), n, dtype=np.uint32)
    sl = jnp.asarray(sl_np)
    jax.device_get(packed.packed[:1, :1])

    # full warm-up (compiles/loads everything once)
    t0 = time.time()
    msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    emit("first_in_process", time.time() - t0)

    def timeit(label, fn, sync, **kw):
        fn(); sync()  # shape/dispatch warm-up
        t0 = time.time()
        for _ in range(args.iters):
            r = fn()
        sync()
        emit(label, (time.time() - t0) / args.iters, **kw)
        return r

    # -- schedule ----------------------------------------------------------
    def run_sched():
        return msm2._schedule(L, c, nw, half, sl, packed.inf_mask)

    fenc, starts, occ, lane_order, inv_order = timeit(
        "schedule", run_sched,
        lambda: jax.device_get(occ[:4]) if isinstance(occ, jnp.ndarray)
        else None,
    )
    fenc, starts, occ, lane_order, inv_order = run_sched()

    t0 = time.time()
    counts = np.asarray(jax.device_get(msm3._occ_counts(occ,
                                                        msm3.MAX_LOG_CAP)))
    emit("occ_counts+sync", time.time() - t0)

    groups = msm3._plan_groups(counts)
    emit("plan", 0.0, groups=[[int(x) for x in g_] for g_ in groups])

    # -- group pipelines ---------------------------------------------------
    heavy_cap_limit = msm3.CHUNK_SLOTS // msm3.TILE
    total_group_s = 0.0
    for cap, lo, hi in groups:
        lg = hi - lo
        if cap > heavy_cap_limit or lg * max(2 * msm3.TILE, cap) < \
                cap * msm3.TILE:
            emit("group.heavy.skip", 0.0, cap=cap, lanes=lg)
            continue
        lsub = max(msm3.TILE, min(msm3._pow2ceil(lg),
                                  msm3.CHUNK_SLOTS // cap))
        args_ = (jnp.uint32(lo), jnp.uint32(hi), starts, occ, fenc,
                 packed.packed)
        exe = msm3._group_exec(ops, cap, lsub, mode, fold, args_)
        out = [None]

        def run_group():
            out[0] = exe(*args_)
            return out[0]

        timeit(f"group cap={cap}", run_group,
               lambda: jax.device_get(out[0][:1, :1]),
               cap=cap, lanes=lg, lsub=lsub,
               slots=cap * lsub)
        total_group_s += 0  # per-line output is the record

    # -- totals ------------------------------------------------------------
    from bellman_tpu.ops.pallas_fold import rows_jac

    RJ = rows_jac(ops)
    acc_sorted = jnp.zeros((RJ, W0), jnp.uint32)
    tot_exe = msm3._totals_exec(ops, nw, half, c, mode, kind)
    lo32 = inv_order.astype(jnp.int32)
    tout = [None]

    def run_tot():
        tout[0] = tot_exe(acc_sorted, lo32)
        return tout[0]

    timeit(f"totals.{kind}", run_tot,
           lambda: jax.device_get(tout[0][:1, :1, :1]))

    # -- host finish -------------------------------------------------------
    pend = msm3.msm3_start(ops, packed, sl, c=c)
    jax.device_get(pend.U[:1, :1, :1])
    t0 = time.time()
    msm3.msm3_finish(ops, pend, bls.G1Affine)
    emit("finish_host", time.time() - t0)

    # -- end to end --------------------------------------------------------
    t0 = time.time()
    for _ in range(args.iters):
        r = msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    dt = (time.time() - t0) / args.iters
    emit("msm3.warm_e2e", dt, points_per_s=round(n / dt, 1))


if __name__ == "__main__":
    main()
