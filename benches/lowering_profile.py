"""Where does the MSM first call go? Trace/lower vs XLA-compile vs run.

The driver bench pays a first call per stage even with a fully warm
persistent compile cache (round 4: 742 s at 2^16 with cache) — that
cost is LOCAL (tracing + StableHLO lowering + cache hashing), and this
script attributes it: for each jitted piece of the msm3 pipeline it
times .lower() and .compile() separately (cache on), then one dispatch.

Usage: python benches/lowering_profile.py [--log2 16] [--c 16]
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
    ap.add_argument("--log2", type=int, default=16)
    ap.add_argument("--c", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm2, msm3
    from bellman_tpu.ops.pallas_fold import rows_jac

    spec = limbs.spec_for("bls_fr")
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
        print(json.dumps({"phase": phase, "s": round(dt, 2), **kw}),
              flush=True)

    # bases + scalars (same generator as bench.py)
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
    jax.block_until_ready(packed.packed)

    t0 = time.time()
    sched_l = msm2._schedule.lower(
        L, c, nw, half, sl, packed.inf_mask
    )
    emit("schedule.lower", time.time() - t0)
    t0 = time.time()
    sched_e = sched_l.compile()
    emit("schedule.compile", time.time() - t0)
    t0 = time.time()
    fenc, starts, occ, lane_order, _probe = sched_e(sl, packed.inf_mask)
    counts = np.asarray(jax.device_get(msm3._occ_counts(occ, msm3.MAX_LOG_CAP)))
    emit("schedule.run+counts", time.time() - t0)

    groups = msm3._plan_groups(counts)
    emit("plan", 0.0, groups=[[int(x) for x in g_] for g_ in groups])

    heavy_cap_limit = msm3.CHUNK_SLOTS // msm3.TILE
    for cap, lo, hi in groups:
        lg = hi - lo
        if cap > heavy_cap_limit or lg * max(2 * msm3.TILE, cap) < cap * msm3.TILE:
            emit("group.heavy", 0.0, cap=cap, lanes=lg)
            continue
        lsub = max(msm3.TILE, min(msm3._pow2ceil(lg), msm3.CHUNK_SLOTS // cap))
        args_ = (jnp.uint32(lo), jnp.uint32(hi), starts, occ, fenc,
                 packed.packed)
        t0 = time.time()
        low = msm3._group_pipeline.lower(ops, cap, lsub, mode, fold, *args_)
        dt_l = time.time() - t0
        t0 = time.time()
        exe = low.compile()
        dt_c = time.time() - t0
        emit("group.lower+compile", dt_l + dt_c, cap=cap, lsub=lsub,
             lower_s=round(dt_l, 2), compile_s=round(dt_c, 2))

    t0 = time.time()
    tot_l = msm3._lower_totals.__wrapped__ if hasattr(
        msm3._lower_totals, "__wrapped__") else None
    RJ = rows_jac(ops)
    fn = msm3._totals_hier if kind == "hier" else msm3._totals_bits
    low = fn.lower(
        ops, nw, half, c, mode,
        jax.ShapeDtypeStruct((RJ, W0), jnp.uint32),
        jax.ShapeDtypeStruct((W0,), jnp.int32),
    )
    dt_l = time.time() - t0
    t0 = time.time()
    exe = low.compile()
    dt_c = time.time() - t0
    emit("totals.lower+compile", dt_l + dt_c, kind=kind,
         lower_s=round(dt_l, 2), compile_s=round(dt_c, 2))

    # end-to-end warm dispatch for reference
    t0 = time.time()
    r = msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    emit("msm3.first_in_process", time.time() - t0)
    t0 = time.time()
    r = msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)
    emit("msm3.warm_iter", time.time() - t0)


if __name__ == "__main__":
    main()
