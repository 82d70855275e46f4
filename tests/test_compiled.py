"""Compiled-circuit proving (bellman_tpu.compiled + ops.r1cs_eval):
bit-identical proofs vs the ProvingAssignment oracle.

The compiled path replaces per-proof Python LC evaluation with a device
sparse matvec; these tests pin (a) matrix/density structure parity with
the symbolic semantics of prover.rs:19-55, and (b) end-to-end proof
bit-parity through the device prover."""

import random

import numpy as np
import pytest

from bellman_tpu.algebra.engine import DummyEngine, Bls12_381Engine
from bellman_tpu.compiled import compile_circuit
from bellman_tpu.groth16 import (
    create_proof, generate_random_parameters, prepare_verifying_key,
    verify_proof,
)
from bellman_tpu.groth16.prover import synthesize_for_proving
from bellman_tpu.ops.prover import (
    DeviceParameters, create_proof_compiled, get_backend,
)
from bellman_tpu.workloads import MiMCDemo, mimc_host


def witness_limbs(spec, prover):
    inp = spec.to_limbs([int(v) for v in prover.input_assignment])
    aux = spec.to_limbs([int(v) for v in prover.aux_assignment])
    return inp, aux


def run_parity(engine, circuit_factory, rounds):
    rng = random.Random(42)
    field = engine.Fr
    constants = [field(rng.randrange(field.MODULUS)) for _ in range(rounds)]
    params = generate_random_parameters(
        engine, circuit_factory(constants), rng
    )
    pvk = prepare_verifying_key(engine, params.vk)

    xl = field(rng.randrange(field.MODULUS))
    xr = field(rng.randrange(field.MODULUS))
    image = mimc_host(field, xl, xr, constants)
    circuit = circuit_factory(constants, xl=xl, xr=xr)

    r = field(rng.randrange(field.MODULUS))
    s = field(rng.randrange(field.MODULUS))
    want = create_proof(engine, circuit, params, r, s)

    compiled = compile_circuit(engine, circuit_factory(constants))
    prover = synthesize_for_proving(engine, circuit)
    # structure parity with the proving assignment
    assert compiled.num_inputs == len(prover.input_assignment)
    assert compiled.num_aux == len(prover.aux_assignment)
    assert compiled.num_constraints == len(prover.a)
    assert compiled.a_aux_density.bv == prover.a_aux_density.bv
    assert compiled.b_input_density.bv == prover.b_input_density.bv
    assert compiled.b_aux_density.bv == prover.b_aux_density.bv

    backend = get_backend(engine)
    dev = DeviceParameters(engine, params)
    inp, aux = witness_limbs(backend.fr_spec, prover)
    got = create_proof_compiled(engine, compiled, inp, aux, dev, r, s)

    assert got.a == want.a and got.b == want.b and got.c == want.c
    verify_proof(pvk, got, [image])


class TestCompiledDummy:
    def test_mimc_parity(self):
        run_parity(DummyEngine, MiMCDemo, 12)

    def test_wide_mimc_vectorized_witness(self):
        """WideMiMC + wide_mimc_witness == the oracle's synthesis, and
        the compiled proof is bit-identical to the host proof."""
        from bellman_tpu.workloads import WideMiMC, wide_mimc_witness

        engine = DummyEngine
        field = engine.Fr
        rng = random.Random(7)
        R, B = 5, 3
        constants = [field(rng.randrange(field.MODULUS)) for _ in range(R)]
        xl0 = [rng.randrange(field.MODULUS) for _ in range(B)]
        xr0 = [rng.randrange(field.MODULUS) for _ in range(B)]
        circuit = WideMiMC(
            constants, B,
            xl=[field(v) for v in xl0], xr=[field(v) for v in xr0],
        )
        params = generate_random_parameters(
            engine, WideMiMC(constants, B), rng
        )
        r = field(rng.randrange(field.MODULUS))
        s = field(rng.randrange(field.MODULUS))
        want = create_proof(engine, circuit, params, r, s)

        backend = get_backend(engine)
        spec = backend.fr_spec
        inp, aux = wide_mimc_witness(spec, field, constants, xl0, xr0)
        # witness parity with the oracle's synthesis
        prover = synthesize_for_proving(engine, circuit)
        winp, waux = witness_limbs(spec, prover)
        assert (np.asarray(winp) == np.asarray(inp)).all()
        assert (np.asarray(waux) == np.asarray(aux)).all()

        compiled = compile_circuit(engine, WideMiMC(constants, B))
        dev = DeviceParameters(engine, params)
        got = create_proof_compiled(engine, compiled, inp, aux, dev, r, s)
        assert got.a == want.a and got.b == want.b and got.c == want.c


@pytest.mark.slow
class TestCompiledBls:
    def test_mimc_parity(self):
        run_parity(Bls12_381Engine, MiMCDemo, 6)


class TestEvalMatrixDepth:
    """eval_matrix must accept ANY row depth K — the prover passes the
    max LC term count of the circuit (compiled.py), an arbitrary
    integer; the lane-fold path (K > 64) pads to a multiple of the fold
    factor with zero-coeff rows (ADVICE r4 high)."""

    @pytest.mark.parametrize("K", [1, 64, 65, 100, 130, 255, 256])
    def test_any_depth_matches_host(self, K):
        import jax.numpy as jnp
        from bellman_tpu.ops import limbs as L, r1cs_eval

        spec = L.spec_for("dummy")
        p = spec.p
        rng = np.random.default_rng(K)
        m, nvars = 8, 11
        idx = rng.integers(0, nvars, (K, m)).astype(np.int32)
        coeff = rng.integers(0, p, (K, m))
        wit = rng.integers(0, p, nvars)

        want = [
            sum(int(wit[idx[k, j]]) * int(coeff[k, j]) for k in range(K))
            % p
            for j in range(m)
        ]

        coeff_mont = np.stack(
            [spec.to_mont_host(list(map(int, coeff[k]))) for k in range(K)]
        )
        wit_mont = jnp.asarray(spec.to_mont_host(list(map(int, wit))))
        out = r1cs_eval.eval_matrix(
            spec, K, jnp.asarray(idx), jnp.asarray(coeff_mont), wit_mont
        )
        got = spec.from_mont_host(np.asarray(out))
        assert got == want
