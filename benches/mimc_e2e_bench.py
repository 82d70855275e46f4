"""MiMC end-to-end timing: the reference's harness prints average prove
and verify seconds over SAMPLES proofs (/root/reference/groth16/tests/
mimc.rs:53,93-102, SAMPLES=50).

Usage: python benches/mimc_e2e_bench.py [--samples 50] [--host-prover]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=50)
    ap.add_argument("--host-prover", action="store_true")
    args = ap.parse_args()

    from bellman_tpu.algebra.engine import Bls12_381Engine as E
    from bellman_tpu.groth16 import (
        create_proof, generate_random_parameters, prepare_verifying_key,
        verify_proof, Proof,
    )
    from bellman_tpu.workloads import MIMC_ROUNDS, MiMCDemo, mimc_host
    from bellman_tpu.ops.prover import DeviceParameters, create_proof_on_device

    Fr = E.Fr
    rng = random.Random(0x4D694D43)
    constants = [Fr.random(rng) for _ in range(MIMC_ROUNDS)]

    t0 = time.time()
    params = generate_random_parameters(E, MiMCDemo(constants), rng)
    print(f"CRS generation: {time.time()-t0:.2f}s")
    pvk = prepare_verifying_key(E, params.vk)
    dev_params = None if args.host_prover else DeviceParameters(E, params)

    total_prove = 0.0
    total_verify = 0.0
    proof_bytes = b""
    for i in range(args.samples):
        xl = Fr.random(rng)
        xr = Fr.random(rng)
        image = mimc_host(Fr, xl, xr, constants)
        r = Fr.random(rng)
        s = Fr.random(rng)
        circuit = MiMCDemo(constants, xl=xl, xr=xr)

        t0 = time.time()
        if args.host_prover:
            proof = create_proof(E, circuit, params, r, s)
        else:
            proof = create_proof_on_device(E, circuit, dev_params, r, s)
        proof_bytes = proof.to_bytes()
        total_prove += time.time() - t0

        t0 = time.time()
        verify_proof(pvk, Proof.from_bytes(proof_bytes, E), [image])
        total_verify += time.time() - t0

    n = args.samples
    print(f"prover ({'host' if args.host_prover else 'device'}): "
          f"{total_prove/n*1e3:.1f} ms/proof avg over {n}")
    print(f"verifier: {total_verify/n*1e3:.1f} ms/proof avg")
    print(f"proof size: {len(proof_bytes)} bytes")


if __name__ == "__main__":
    main()
