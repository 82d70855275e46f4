"""Groth16 trusted-setup parameter generation (host oracle).

Behavioral equivalent of /root/reference/groth16/src/generator.rs:19-507:
KeypairAssembly records the R1CS symbolically (per-variable lists of
(coeff, constraint_idx), never evaluating assignments); per-input dummy
constraints x*0=0 force full IC density; the H query is
g1^(tau^i t(tau)/delta); an inverse FFT turns tau powers into Lagrange
coefficients; eval() computes per-variable u_i(tau), v_i(tau), w_i(tau)
and emits the A/B/IC/L queries with zero points filtered from A/B;
unconstrained aux variables are rejected.

The device-accelerated generator (fixed-base MSM kernels) lives in
``bellman_tpu.ops``; it must produce identical CRSs.
"""

from __future__ import annotations

from ..r1cs import (
    ConstraintSystem, Variable, INPUT, SynthesisError, UnexpectedIdentity,
    UnconstrainedVariable,
)
from ..domain import EvaluationDomain, ScalarOps
from .types import Parameters, VerifyingKey


class KeypairAssembly(ConstraintSystem):
    """Records the circuit symbolically: for each variable, the list of
    (coefficient, constraint index) pairs per QAP polynomial."""

    def __init__(self, field):
        super().__init__(field)
        self.num_inputs = 0
        self.num_aux = 0
        self.num_constraints = 0
        self.at_inputs, self.bt_inputs, self.ct_inputs = [], [], []
        self.at_aux, self.bt_aux, self.ct_aux = [], [], []

    def alloc(self, annotation, f):
        index = self.num_aux
        self.num_aux += 1
        self.at_aux.append([])
        self.bt_aux.append([])
        self.ct_aux.append([])
        return Variable.aux(index)

    def alloc_input(self, annotation, f):
        index = self.num_inputs
        self.num_inputs += 1
        self.at_inputs.append([])
        self.bt_inputs.append([])
        self.ct_inputs.append([])
        return Variable.input(index)

    def enforce(self, annotation, a, b, c):
        def record(lc, inputs, aux):
            for var, coeff in self._coerce_lc(lc).terms.items():
                if var.kind == INPUT:
                    inputs[var.index].append((coeff, self.num_constraints))
                else:
                    aux[var.index].append((coeff, self.num_constraints))

        record(a, self.at_inputs, self.at_aux)
        record(b, self.bt_inputs, self.bt_aux)
        record(c, self.ct_inputs, self.ct_aux)
        self.num_constraints += 1


def generate_random_parameters(engine, circuit, rng) -> Parameters:
    field = engine.Fr
    g1 = engine.G1.generator().mul_int(rng.randrange(1, field.MODULUS))
    g2 = engine.G2.generator().mul_int(rng.randrange(1, field.MODULUS))
    alpha = field(rng.randrange(1, field.MODULUS))
    beta = field(rng.randrange(1, field.MODULUS))
    gamma = field(rng.randrange(1, field.MODULUS))
    delta = field(rng.randrange(1, field.MODULUS))
    tau = field(rng.randrange(1, field.MODULUS))
    return generate_parameters(engine, circuit, g1, g2, alpha, beta, gamma, delta, tau)


def generate_parameters(
    engine, circuit, g1, g2, alpha, beta, gamma, delta, tau
) -> Parameters:
    """Create a CRS from explicit toxic waste. ``g1``/``g2`` are group
    elements (not necessarily the standard generators)."""
    field = engine.Fr
    assembly = KeypairAssembly(field)

    # Allocate the "one" input variable
    assembly.alloc_input("", lambda: field.one())

    circuit.synthesize(assembly)

    # Input constraints x * 0 = 0 ensure full density of the IC query
    for i in range(assembly.num_inputs):
        assembly.enforce("", assembly.lc() + Variable.input(i),
                         assembly.lc(), assembly.lc())

    gamma_inverse = gamma.invert()
    delta_inverse = delta.invert()
    if gamma_inverse is None or delta_inverse is None:
        raise UnexpectedIdentity("gamma/delta must be invertible")

    # Evaluation domain sized to the constraint count
    domain = EvaluationDomain.from_coeffs(
        [field.zero()] * assembly.num_constraints, ScalarOps(field), field
    )
    m = len(domain)

    # Powers of tau 1, tau, ..., tau^(m-1)
    powers_of_tau = []
    cur = field.one()
    for _ in range(m):
        powers_of_tau.append(cur)
        cur = cur * tau

    # H query: g1^(tau^i * t(tau) / delta) for i in 0..m-1
    coeff = domain.z(tau) * delta_inverse
    h = [g1.mul_int(int(p * coeff)) for p in powers_of_tau[: m - 1]]

    # Inverse FFT: tau powers -> Lagrange coefficients L_i(tau)
    domain.coeffs = powers_of_tau
    domain.ifft()
    lagrange = domain.into_coeffs()

    def eval_query(at, bt, ct, inv):
        """Per-variable CRS elements for one variable class."""
        a_pts, b1_pts, b2_pts, ext_pts = [], [], [], []

        def eval_at_tau(terms):
            acc = field.zero()
            for coeff, idx in terms:
                acc = acc + lagrange[idx] * coeff
            return acc

        for at_i, bt_i, ct_i in zip(at, bt, ct):
            u = eval_at_tau(at_i)
            v = eval_at_tau(bt_i)
            w = eval_at_tau(ct_i)
            a_pts.append(None if u.is_zero() else g1.mul_int(int(u)))
            if v.is_zero():
                b1_pts.append(None)
                b2_pts.append(None)
            else:
                b1_pts.append(g1.mul_int(int(v)))
                b2_pts.append(g2.mul_int(int(v)))
            e = (u * beta + v * alpha + w) * inv
            ext_pts.append(g1.mul_int(int(e)))
        return a_pts, b1_pts, b2_pts, ext_pts

    a_in, b1_in, b2_in, ic = eval_query(
        assembly.at_inputs, assembly.bt_inputs, assembly.ct_inputs, gamma_inverse
    )
    a_aux, b1_aux, b2_aux, l = eval_query(
        assembly.at_aux, assembly.bt_aux, assembly.ct_aux, delta_inverse
    )

    # L query must be fully dense: unconstrained aux variables are rejected
    for e in l:
        if e.is_identity():
            raise UnconstrainedVariable("auxiliary variable is unconstrained")

    vk = VerifyingKey(
        alpha_g1=g1.mul_int(int(alpha)),
        beta_g1=g1.mul_int(int(beta)),
        beta_g2=g2.mul_int(int(beta)),
        gamma_g2=g2.mul_int(int(gamma)),
        delta_g1=g1.mul_int(int(delta)),
        delta_g2=g2.mul_int(int(delta)),
        ic=ic,
    )

    # Filter zero points from the A/B queries (generator.rs:490-505)
    def dense(xs):
        return [x for x in xs if x is not None]

    return Parameters(
        vk=vk,
        h=h,
        l=l,
        a=dense(a_in) + dense(a_aux),
        b_g1=dense(b1_in) + dense(b1_aux),
        b_g2=dense(b2_in) + dense(b2_aux),
    )
