"""Device CRS generator vs the host oracle: byte-identical Parameters."""

import random

import pytest

from bellman_tpu.algebra.engine import Bls12_381Engine
from bellman_tpu.groth16 import generate_parameters, prepare_verifying_key, verify_proof
from bellman_tpu.ops.generator import (
    generate_parameters_device_crs, generate_parameters_on_device,
)
from bellman_tpu.ops.prover import DeviceParameters, create_proof_on_device
from bellman_tpu.r1cs import Circuit, get_value


class SmallMiMC(Circuit):
    def __init__(self, constants, xl=None, xr=None):
        self.constants = constants
        self.xl = xl
        self.xr = xr

    def synthesize(self, cs):
        xl_val, xr_val = self.xl, self.xr
        xl = cs.alloc("xl", lambda: get_value(self.xl))
        xr = cs.alloc("xr", lambda: get_value(self.xr))
        for i, c in enumerate(self.constants):
            with cs.namespace(f"round {i}"):
                tmp_val = (xl_val + c).square() if xl_val is not None else None
                tmp = cs.alloc("tmp", lambda tv=tmp_val: get_value(tv))
                cs.enforce(
                    "tmp", cs.lc() + xl + (c, cs.one),
                    cs.lc() + xl + (c, cs.one), cs.lc() + tmp,
                )
                nv = (
                    xr_val + tmp_val * (xl_val + c)
                    if xl_val is not None else None
                )
                last = i == len(self.constants) - 1
                new_xl = (
                    cs.alloc_input("image", lambda v=nv: get_value(v))
                    if last
                    else cs.alloc("new_xl", lambda v=nv: get_value(v))
                )
                cs.enforce(
                    "new_xL", cs.lc() + tmp, cs.lc() + xl + (c, cs.one),
                    cs.lc() + new_xl - xr,
                )
                xr, xr_val = xl, xl_val
                xl, xl_val = new_xl, nv


@pytest.mark.slow
def test_device_generator_matches_host():
    E = Bls12_381Engine
    Fr = E.Fr
    rng = random.Random(0xC5)
    constants = [Fr.random(rng) for _ in range(8)]
    circuit = SmallMiMC(constants)

    g1 = E.G1.generator().mul_int(rng.randrange(1, Fr.MODULUS))
    g2 = E.G2.generator().mul_int(rng.randrange(1, Fr.MODULUS))
    trapdoors = [Fr.random(rng) for _ in range(5)]

    host_params = generate_parameters(E, circuit, g1, g2, *trapdoors)
    dev_params = generate_parameters_on_device(E, circuit, g1, g2, *trapdoors)
    assert dev_params.to_bytes() == host_params.to_bytes()

    # and the CRS actually works end-to-end with the device prover
    xl, xr = Fr.random(rng), Fr.random(rng)
    from bellman_tpu.workloads import mimc_host  # noqa: F401

    v = xl
    w = xr
    for c in constants:
        t = (v + c).square() * (v + c) + w
        w, v = v, t
    proof = create_proof_on_device(
        E, SmallMiMC(constants, xl=xl, xr=xr),
        DeviceParameters(E, dev_params),
        Fr.random(rng), Fr.random(rng),
    )
    pvk = prepare_verifying_key(E, dev_params.vk)
    verify_proof(pvk, proof, [v])


@pytest.mark.slow
def test_device_crs_generator_matches_host():
    """The all-device CRS path (generate_parameters_device_crs — no host
    point objects at any step) produces a byte-identical Parameters when
    pulled back, and proves directly from the device queries."""
    E = Bls12_381Engine
    Fr = E.Fr
    rng = random.Random(0xD6)
    constants = [Fr.random(rng) for _ in range(8)]
    circuit = SmallMiMC(constants)

    g1 = E.G1.generator().mul_int(rng.randrange(1, Fr.MODULUS))
    g2 = E.G2.generator().mul_int(rng.randrange(1, Fr.MODULUS))
    trapdoors = [Fr.random(rng) for _ in range(5)]

    host_params = generate_parameters(E, circuit, g1, g2, *trapdoors)
    dev = generate_parameters_device_crs(E, circuit, g1, g2, *trapdoors)
    assert dev.to_host_parameters().to_bytes() == host_params.to_bytes()

    xl, xr = Fr.random(rng), Fr.random(rng)
    v, w = xl, xr
    for c in constants:
        t = (v + c).square() * (v + c) + w
        w, v = v, t
    proof = create_proof_on_device(
        E, SmallMiMC(constants, xl=xl, xr=xr), dev,
        Fr.random(rng), Fr.random(rng),
    )
    pvk = prepare_verifying_key(E, dev.vk)
    verify_proof(pvk, proof, [v])
