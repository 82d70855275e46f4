"""Probe: which G2 msm3 pipeline shapes crash the Mosaic compiler?

Round-4 forensics (logs/prover_bench_20e.err): the 2^20 full prover
died in the b_g2_inputs MSM — a TINY (n~1) G2 MSM routed through the
small-n single-group Pallas pipeline (cap=2), whose compile aborts with
`Check failed: limits[i] <= dim(i) (2 vs. 1)`. This probe compiles (and
runs) the suspect shapes one by one, in increasing risk order, each
guarded so one abort doesn't hide the others' status.

Usage: python benches/g2_compile_probe.py [--cases tiny_g1,tiny_g2,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="tiny_g1,tiny_g2_jac,tiny_g2,mid_g2")
    args = ap.parse_args()
    cases = args.cases.split(",")

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, limbs, msm3

    spec = limbs.spec_for("bls_fr")

    def run(name, ops_name, point_cls, n, fold, c=None):
        ops = curve.g1_ops() if ops_name == "g1" else curve.g2_ops()
        gen = point_cls.generator()
        rng = np.random.default_rng(1)
        pts = [gen.mul_int(int(k)) for k in rng.integers(1, 2**62, n)]
        scalars = [int(k) for k in rng.integers(1, 2**62, n)]
        dev = (curve.g1_to_device if ops_name == "g1" else
               curve.g2_to_device)(pts)
        sl = jnp.asarray(spec.to_limbs(scalars))
        t0 = time.time()
        try:
            got = msm3.msm3(ops, dev, sl, c=c, point_cls=point_cls,
                            fold=fold)
            want = point_cls.identity()
            for p, s in zip(pts, scalars):
                want = want + p.mul_int(s)
            ok = got == want
            print(f"[probe] {name}: {'OK' if ok else 'WRONG RESULT'} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — survey all cases
            print(f"[probe] {name}: FAIL {type(e).__name__}: "
                  f"{str(e)[:300]} ({time.time() - t0:.1f}s)", flush=True)

    if "tiny_g1" in cases:
        run("tiny_g1 n=2 affine", "g1", bls.G1Affine, 2, "affine")
    if "tiny_g2_jac" in cases:
        run("tiny_g2 n=2 jacobian", "g2", bls.G2Affine, 2, "jacobian")
    if "tiny_g2" in cases:
        run("tiny_g2 n=2 affine", "g2", bls.G2Affine, 2, "affine")
    if "mid_g2" in cases:
        run("mid_g2 n=4096 affine", "g2", bls.G2Affine, 4096, "affine")


if __name__ == "__main__":
    main()
