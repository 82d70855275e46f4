"""Batched vs unbatched verification (the reference's criterion bench
sweeps n in {8,16,...,64} MiMC proofs — /root/reference/groth16/benches/
batch.rs:19,67-91).

Usage: python benches/batch_verify_bench.py [--max 64]
"""

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max", type=int, default=64)
    args = ap.parse_args()

    from bellman_tpu.algebra.engine import Bls12_381Engine as E
    from bellman_tpu.groth16 import (
        batch, generate_random_parameters, prepare_verifying_key,
        verify_proof,
    )
    from bellman_tpu.workloads import MIMC_ROUNDS, MiMCDemo, mimc_host
    from bellman_tpu.ops.prover import DeviceParameters, create_random_proof_on_device

    Fr = E.Fr
    rng = random.Random(0xBA7C4)
    constants = [Fr.random(rng) for _ in range(MIMC_ROUNDS)]
    params = generate_random_parameters(E, MiMCDemo(constants), rng)
    pvk = prepare_verifying_key(E, params.vk)
    dev_params = DeviceParameters(E, params)

    print(f"generating {args.max} proofs...")
    items = []
    for _ in range(args.max):
        xl = Fr.random(rng)
        xr = Fr.random(rng)
        image = mimc_host(Fr, xl, xr, constants)
        proof = create_random_proof_on_device(
            E, MiMCDemo(constants, xl=xl, xr=xr), dev_params, rng
        )
        items.append((proof, [image]))

    n = 8
    while n <= args.max:
        t0 = time.time()
        for proof, inputs in items[:n]:
            verify_proof(pvk, proof, inputs)
        t_unbatched = time.time() - t0

        v = batch.Verifier(E)
        for proof, inputs in items[:n]:
            v.queue(proof, inputs)
        t0 = time.time()
        v.verify(rng, params.vk)
        t_batched = time.time() - t0

        print(
            f"n={n:3d}: unbatched {t_unbatched*1e3:8.1f} ms  "
            f"batched {t_batched*1e3:8.1f} ms  "
            f"speedup {t_unbatched/t_batched:5.2f}x"
        )
        n *= 2


if __name__ == "__main__":
    main()
