"""Full-prover scale bench: BASELINE config "single host, full prover
@ 2^20 constraints" (BASELINE.md). The reference's analog is the MiMC
e2e harness (/root/reference/groth16/tests/mimc.rs:23-103) at 644
constraints; this drives the same pipeline at domain 2^LOG2 via
WideMiMC (B independent MiMC-322 chains, workloads.py).

Phases timed separately:
  compile    one-pass symbolic synthesis -> sparse R1CS matrices
             (bellman_tpu/compiled.py; per-circuit, amortized over proofs)
  setup      trusted setup on device (ops/generator.py)
  witness    vectorized device witness (workloads.wide_mimc_witness)
  prove      h-pipeline (7 FFTs) + 8 MSMs + assembly
             (ops/prover.create_proof_compiled)
  verify     host pairing check

Usage: python benches/prover_bench.py [--log2 20] [--samples 1]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=20)
    ap.add_argument("--samples", type=int, default=1)
    args = ap.parse_args()

    from bellman_tpu.algebra.engine import Bls12_381Engine as E
    from bellman_tpu.compiled import compile_circuit
    from bellman_tpu.groth16 import prepare_verifying_key, verify_proof
    from bellman_tpu.ops.generator import (
        generate_random_parameters_device_crs,
    )
    from bellman_tpu.ops.prover import create_proof_compiled, get_backend
    from bellman_tpu.workloads import MIMC_ROUNDS, WideMiMC, mimc_host, \
        wide_mimc_witness

    Fr = E.Fr
    R = MIMC_ROUNDS
    # constraints = B*2R, +B+1 input dummies; keep total <= 2^log2 so the
    # evaluation domain is exactly 2^log2
    B = (1 << args.log2) // (2 * R + 1)
    n_constraints = B * 2 * R
    print(
        f"[prover_bench] domain 2^{args.log2}: B={B} MiMC-{R} instances, "
        f"{n_constraints} constraints, {B * (2 * R + 1)} aux vars",
        file=sys.stderr,
    )

    rng = random.Random(0x57696465)
    constants = [Fr.random(rng) for _ in range(R)]

    t0 = time.time()
    compiled = compile_circuit(E, WideMiMC(constants, B))
    t_compile = time.time() - t0
    print(f"[prover_bench] compile: {t_compile:.1f}s "
          f"({compiled.num_constraints} constraints)", file=sys.stderr)

    t0 = time.time()
    # device-resident CRS end to end: no host point objects at 2^20
    # (VERDICT r3 missing #2 — the per-point upload loop was hours)
    dev = generate_random_parameters_device_crs(
        E, WideMiMC(constants, B), rng
    )
    t_setup = time.time() - t0
    print(f"[prover_bench] setup (device CRS): {t_setup:.1f}s",
          file=sys.stderr)
    pvk = prepare_verifying_key(E, dev.vk)
    backend = get_backend(E)
    spec = backend.fr_spec

    t_wit = t_prove = t_verify = 0.0
    for it in range(args.samples):
        xl0 = [rng.randrange(Fr.MODULUS) for _ in range(B)]
        xr0 = [rng.randrange(Fr.MODULUS) for _ in range(B)]

        t0 = time.time()
        inp, aux = wide_mimc_witness(spec, Fr, constants, xl0, xr0)
        dt = time.time() - t0
        t_wit += dt
        print(f"[prover_bench] witness: {dt:.2f}s", file=sys.stderr)

        r = Fr.random(rng)
        s = Fr.random(rng)
        t0 = time.time()
        proof = create_proof_compiled(E, compiled, inp, aux, dev, r, s)
        dt = time.time() - t0
        t_prove += dt
        print(f"[prover_bench] prove: {dt:.2f}s"
              + (" (incl. compile)" if it == 0 else ""), file=sys.stderr)

        images = [
            mimc_host(Fr, Fr(xl0[b]), Fr(xr0[b]), constants) for b in range(B)
        ]
        t0 = time.time()
        verify_proof(pvk, proof, images)
        t_verify += time.time() - t0

    n = args.samples
    print(
        f"[prover_bench] avg over {n}: witness {t_wit/n:.2f}s  "
        f"prove {t_prove/n:.2f}s  verify {t_verify/n:.2f}s  "
        f"({n_constraints/(t_prove/n):.0f} constraints/s proving)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
