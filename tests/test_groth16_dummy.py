"""Known-answer Groth16 tests over the F_64513 DummyEngine.

Golden values ported from /root/reference/groth16/src/tests/mod.rs:91-373
(test_xordemo) and :375-440 (zero_coeff regression). These pin every CRS
element, the Lagrange evaluations u_i/v_i/w_i, and the exact proof values,
making the whole protocol exactly checkable."""

import pytest

from bellman_tpu.r1cs import Circuit, SynthesisError, AssignmentMissing
from bellman_tpu.algebra.engine import DummyEngine, FrD, DummyG
from bellman_tpu.groth16 import (
    generate_parameters, create_proof, prepare_verifying_key, verify_proof,
)


class XorDemo(Circuit):
    def __init__(self, a=None, b=None):
        self.a = a
        self.b = b

    def synthesize(self, cs):
        f = cs.field

        def bit_val(v):
            if v is None:
                raise AssignmentMissing()
            return f.one() if v else f.zero()

        a_var = cs.alloc("a", lambda: bit_val(self.a))
        cs.enforce(
            "a_boolean_constraint",
            cs.lc() + cs.one - a_var,
            cs.lc() + a_var,
            cs.lc(),
        )
        b_var = cs.alloc("b", lambda: bit_val(self.b))
        cs.enforce(
            "b_boolean_constraint",
            cs.lc() + cs.one - b_var,
            cs.lc() + b_var,
            cs.lc(),
        )

        def c_val():
            if self.a is None or self.b is None:
                raise AssignmentMissing()
            return f.one() if (self.a ^ self.b) else f.zero()

        c_var = cs.alloc_input("c", c_val)
        cs.enforce(
            "c_xor_constraint",
            cs.lc() + a_var + a_var,
            cs.lc() + b_var,
            cs.lc() + a_var + b_var - c_var,
        )


# fixed trapdoors (tests/mod.rs:93-99)
G1 = DummyG(1)
G2 = DummyG(1)
ALPHA = FrD(48577)
BETA = FrD(22580)
GAMMA = FrD(53332)
DELTA = FrD(5481)
TAU = FrD(3673)


def _params():
    return generate_parameters(
        DummyEngine, XorDemo(), G1, G2, ALPHA, BETA, GAMMA, DELTA, TAU
    )


def test_xordemo_crs_golden():
    params = _params()

    # H query has 7 elements (domain 8, quotient poly)
    assert len(params.h) == 7

    root_of_unity = FrD.ROOT_OF_UNITY
    assert root_of_unity ** (1 << 10) == FrD.one()
    root_of_unity = root_of_unity ** (1 << 7)
    assert root_of_unity ** (1 << 3) == FrD.one()
    assert root_of_unity == FrD(20201)

    # t(tau) = tau^8 - 1 equals the product over the domain points
    t_at_tau = TAU ** 8 - FrD.one()
    tmp = FrD.one()
    for i in range(8):
        tmp = tmp * (TAU - root_of_unity ** i)
    assert tmp == t_at_tau

    # H query elements: {tau^i t(tau)/delta}
    delta_inverse = DELTA.invert()
    gamma_inverse = GAMMA.invert()
    coeff = delta_inverse * t_at_tau
    cur = FrD.one()
    for h in params.h:
        assert h == DummyG(cur * coeff)
        cur = cur * TAU

    # query densities (tests/mod.rs:175-186)
    assert len(params.vk.ic) == 2
    assert len(params.l) == 2
    assert len(params.a) == 4
    assert len(params.b_g1) == 2
    assert len(params.b_g2) == 2

    # Lagrange evaluations pinned by sage (tests/mod.rs:216-227)
    u_i = [FrD(x) for x in (59158, 48317, 21767, 10402)]
    v_i = [FrD(x) for x in (0, 0, 60619, 30791)]
    w_i = [FrD(x) for x in (0, 23320, 41193, 41193)]

    for u, a in zip(u_i, params.a):
        assert a == DummyG(u)
    nz_v = [v for v in v_i if not v.is_zero()]
    for v, b in zip(nz_v, params.b_g1):
        assert b == DummyG(v)
    for v, b in zip(nz_v, params.b_g2):
        assert b == DummyG(v)

    for i in range(4):
        tmp = BETA * u_i[i] + ALPHA * v_i[i] + w_i[i]
        if i < 2:
            assert params.vk.ic[i] == DummyG(tmp * gamma_inverse)
        else:
            assert params.l[i - 2] == DummyG(tmp * delta_inverse)

    # consistency of trapdoor elements
    assert params.vk.alpha_g1 == DummyG(ALPHA)
    assert params.vk.beta_g1 == DummyG(BETA)
    assert params.vk.beta_g2 == DummyG(BETA)
    assert params.vk.gamma_g2 == DummyG(GAMMA)
    assert params.vk.delta_g1 == DummyG(DELTA)
    assert params.vk.delta_g2 == DummyG(DELTA)


def test_xordemo_proof_golden():
    params = _params()
    pvk = prepare_verifying_key(DummyEngine, params.vk)

    r = FrD(27134)
    s = FrD(17146)
    proof = create_proof(DummyEngine, XorDemo(a=True, b=False), params, r, s)

    u_i = [FrD(x) for x in (59158, 48317, 21767, 10402)]
    v_i = [FrD(x) for x in (0, 0, 60619, 30791)]

    # proof A = alpha + A(tau) + delta*r, with a_0=1, a_1=1, a_2=1, a_3=0
    expected_a = DELTA * r + ALPHA + u_i[0] + u_i[1] + u_i[2]
    assert proof.a == DummyG(expected_a)

    # proof B = beta + B(tau) + delta*s
    expected_b = DELTA * s + BETA + v_i[0] + v_i[1] + v_i[2]
    assert proof.b == DummyG(expected_b)

    # proof C closed form with the pinned h(x) coefficients
    expected_c = FrD.zero()
    expected_c = expected_c + proof.a.v * s
    expected_c = expected_c + proof.b.v * r
    expected_c = expected_c - DELTA * r * s
    expected_c = expected_c + params.l[0].v  # a_2 = 1, a_3 = 0
    for i, coeff in enumerate([5040, 11763, 10755, 63633, 128, 9747, 8739]):
        expected_c = expected_c + params.h[i].v * FrD(coeff)
    assert proof.c == DummyG(expected_c)

    # verifies with public input [1]
    verify_proof(pvk, proof, [FrD.one()])


def test_xordemo_wrong_input_rejected():
    from bellman_tpu.r1cs import VerificationError

    params = _params()
    pvk = prepare_verifying_key(DummyEngine, params.vk)
    proof = create_proof(
        DummyEngine, XorDemo(a=True, b=False), params, FrD(27134), FrD(17146)
    )
    with pytest.raises(VerificationError):
        verify_proof(pvk, proof, [FrD.zero()])


class MultWithZeroCoeffs(Circuit):
    """Regression circuit for the zero-coefficient density rule
    (tests/mod.rs:375-440, CHANGELOG 0.11.2)."""

    def __init__(self, a, b, c, one_var):
        self.a, self.b, self.c, self.one_var = a, b, c, one_var

    def synthesize(self, cs):
        f = cs.field
        a = cs.alloc("a", lambda: self.a)
        b = cs.alloc("b", lambda: self.b)
        c = cs.alloc("c", lambda: self.c)
        zero_on = cs.one if self.one_var else a
        cs.enforce(
            "cs",
            cs.lc() + a,
            cs.lc() + (f.zero(), zero_on) + b,
            cs.lc() + c,
        )


@pytest.mark.parametrize("one_var", [True, False])
def test_zero_coeff(one_var):
    m = MultWithZeroCoeffs(FrD(5), FrD(6), FrD(30), one_var)
    pk = generate_parameters(
        DummyEngine, m, G1, G2, ALPHA, BETA, GAMMA, DELTA, TAU
    )
    pf = create_proof(DummyEngine, m, pk, FrD(27134), FrD(17146))
    pvk = prepare_verifying_key(DummyEngine, pk.vk)
    verify_proof(pvk, pf, [])


def test_xordemo_device_prover_matches_golden():
    """The DEVICE prover (h-pipeline FFTs + MSM kernels) reproduces the
    reference's pinned proof bit-for-bit (tests/mod.rs:274-370)."""
    from bellman_tpu.ops.prover import DeviceParameters, create_proof_on_device

    params = _params()
    dev_params = DeviceParameters(DummyEngine, params)
    r = FrD(27134)
    s = FrD(17146)
    host_proof = create_proof(DummyEngine, XorDemo(a=True, b=False), params, r, s)
    dev_proof = create_proof_on_device(
        DummyEngine, XorDemo(a=True, b=False), dev_params, r, s
    )
    assert dev_proof.to_bytes() == host_proof.to_bytes()

    u_i = [FrD(x) for x in (59158, 48317, 21767, 10402)]
    expected_a = DELTA * r + ALPHA + u_i[0] + u_i[1] + u_i[2]
    assert dev_proof.a == DummyG(expected_a)
    pvk = prepare_verifying_key(DummyEngine, params.vk)
    verify_proof(pvk, dev_proof, [FrD.one()])
