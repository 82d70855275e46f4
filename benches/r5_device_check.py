"""Round-5 on-device validation pass, one process (one grant wait):

1. tiny G1/G2 MSMs (the prover's b-input queries) — exercises the
   jnp-on-TPU small-MSM routing that replaces the Mosaic-crashing
   tiny Pallas pipelines (r4 logs/prover_bench_20e.err);
2. mid-size G2 MSM through the Pallas group pipelines (the b_g2_aux
   query's shape family at prover scale) vs host linearity oracle;
3. fused-FFT device parity at 2^16 vs the CPU jnp path (the fused
   kernels' first on-TPU compile);
4. G1 MSM at 2^18 (direct) and 2^20 (chunked, dense-accumulation
   flow) vs the linearity oracle, with warm timing.

Usage: python benches/r5_device_check.py [--steps 1,2,3,4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="1,2,3,4")
    args = ap.parse_args()
    steps = set(int(s) for s in args.steps.split(","))
    t_all = time.time()

    def log(msg):
        print(f"[r5check +{time.time() - t_all:.0f}s] {msg}", flush=True)

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, fft, limbs, msm2, msm3

    spec = limbs.spec_for("bls_fr")
    t0 = time.time()
    jax.device_get(jnp.zeros((1,), jnp.uint32))
    log(f"device contact in {time.time() - t0:.1f}s")

    def chain_points(gen, k):
        pts, acc = [], gen
        for _ in range(k):
            pts.append(acc)
            acc = acc + gen
        return pts  # gen*1 .. gen*k

    def run_msm(ops, cls, gen, n, c=None, chunked=False, label=""):
        pts = chain_points(gen, n) if n <= (1 << 16) else None
        rng = np.random.default_rng(n)
        scalars = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
        sl = jnp.asarray(spec.to_limbs(scalars))
        if pts is not None:
            dev = (curve.g1_to_device if cls is bls.G1Affine
                   else curve.g2_to_device)(pts)
            bases = msm2.PackedBases(ops, dev)
        else:
            # device additive chain is impractical; tile a 64-pool and
            # fold the linearity factor into the oracle
            pool = chain_points(gen, 64)
            dev = (curve.g1_to_device if cls is bls.G1Affine
                   else curve.g2_to_device)(pool)
            pb = msm2.PackedBases(ops, dev)
            bases = msm2.PackedBases(
                None, None, _packed=jnp.tile(pb.packed, (1, n // 64)),
                _inf=jnp.zeros((n,), bool))
        t0 = time.time()
        if chunked:
            got = msm3.msm3_chunked(ops, bases, sl, cls, c=c,
                                    chunk=1 << 18)
        else:
            got = msm3.msm3(ops, bases, sl, c=c, point_cls=cls)
        first = time.time() - t0
        t0 = time.time()
        if chunked:
            got2 = msm3.msm3_chunked(ops, bases, sl, cls, c=c,
                                     chunk=1 << 18)
        else:
            got2 = msm3.msm3(ops, bases, sl, c=c, point_cls=cls)
        warm = time.time() - t0
        if pts is not None:
            k = sum((i + 1) * s for i, s in enumerate(scalars)) % bls.R
        else:
            k = sum(((i % 64) + 1) * s
                    for i, s in enumerate(scalars)) % bls.R
        want = gen.mul_int(k)
        ok = got == want and got2 == want
        log(f"{label}: {'OK' if ok else 'MISMATCH'} first={first:.1f}s "
            f"warm={warm:.3f}s ({n/warm/1e6:.3f} M pts/s)")
        assert ok, label
        return warm

    g1 = bls.G1Affine.generator()
    g2 = bls.G2Affine.generator()
    ops1 = curve.g1_ops()
    ops2 = curve.g2_ops()

    if 1 in steps:
        run_msm(ops1, bls.G1Affine, g1, 2, label="tiny G1 n=2")
        run_msm(ops2, bls.G2Affine, g2, 2, label="tiny G2 n=2")
        run_msm(ops2, bls.G2Affine, g2, 64, label="tiny G2 n=64")

    if 2 in steps:
        run_msm(ops2, bls.G2Affine, g2, 1 << 12,
                label="mid G2 n=2^12 (pallas groups)")

    if 3 in steps:
        exp = 16
        n = 1 << exp
        rng = np.random.default_rng(3)
        vals = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
            n, 16).T.astype(np.uint32)
        vals[15] &= 0x3FFF
        plan = fft.get_plan(spec, bls.Fr, exp)
        am = limbs.to_mont(spec, jnp.asarray(vals))
        t0 = time.time()
        got = plan.fft(am)   # TPU: fused kernels via the AOT store
        got_h = np.asarray(jax.device_get(got))
        log(f"fused FFT 2^{exp} first call {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(3):
            jax.device_get(plan.fft(am)[0, :4])
        log(f"fused FFT 2^{exp} warm {(time.time() - t0)/3*1e3:.1f} ms")
        # CPU reference via a subprocess-free jnp path: temporarily
        # disable the pallas gate
        from bellman_tpu.ops import pallas_kernels as pk

        orig = pk.enabled
        pk.enabled = lambda: False
        try:
            plan2 = fft.DomainPlan(spec, bls.Fr, exp)
            ref = jax.jit(lambda x: plan2._fft_impl(
                x, inverse=False, scale=False))
            want = np.asarray(jax.device_get(ref(am)))
        finally:
            pk.enabled = orig
        assert (got_h == want).all(), "fused FFT != jnp reference"
        log("fused FFT parity vs jnp reference OK")

    if 4 in steps:
        run_msm(ops1, bls.G1Affine, g1, 1 << 16, c=16,
                label="G1 2^16 direct")
        run_msm(ops1, bls.G1Affine, g1, 1 << 18, c=16,
                label="G1 2^18 direct")
        run_msm(ops1, bls.G1Affine, g1, 1 << 20, c=16, chunked=True,
                label="G1 2^20 chunked dense")

    log("ALL OK")


if __name__ == "__main__":
    main()
