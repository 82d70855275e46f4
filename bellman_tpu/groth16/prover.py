"""Groth16 prover (host oracle).

Behavioral equivalent of /root/reference/groth16/src/prover.rs:19-361:
ProvingAssignment evaluates LCs into per-constraint a/b/c scalars while
tracking query densities (zero coefficients are skipped and do NOT mark
density — the 0.11.2 zero-coeff rule, prover.rs:31); per-input dummy
constraints give A-inputs full density; the h(x) pipeline is
3 iFFTs + 3 coset FFTs, pointwise a*b - c, coset division by z,
icoset-FFT, and truncation of the highest coefficient; then 8 MSMs
(h, l, a_in, a_aux, b1_in, b1_aux, b2_in, b2_aux) feed the proof assembly
A = alpha + A(tau) + r delta, B = beta + B(tau) + s delta,
C = sA + rB - rs delta + H/delta + L/delta.

The TPU prover (``bellman_tpu.ops.prover``) runs the same schedule with
device FFT/MSM kernels and must produce bit-identical proofs.
"""

from __future__ import annotations

from ..r1cs import ConstraintSystem, Variable, INPUT, UnexpectedIdentity
from ..domain import EvaluationDomain, ScalarOps
from ..multiexp import DensityTracker, FULL_DENSITY, multiexp
from .types import Proof


class ProvingAssignment(ConstraintSystem):
    def __init__(self, field):
        super().__init__(field)
        self.a_aux_density = DensityTracker()
        self.b_input_density = DensityTracker()
        self.b_aux_density = DensityTracker()
        self.a = []
        self.b = []
        self.c = []
        self.input_assignment = []
        self.aux_assignment = []

    def alloc(self, annotation, f):
        self.aux_assignment.append(f())
        self.a_aux_density.add_element()
        self.b_aux_density.add_element()
        return Variable.aux(len(self.aux_assignment) - 1)

    def alloc_input(self, annotation, f):
        self.input_assignment.append(f())
        self.b_input_density.add_element()
        return Variable.input(len(self.input_assignment) - 1)

    def _eval(self, lc, input_density, aux_density):
        acc = self.field.zero()
        for var, coeff in lc.terms.items():
            if coeff.is_zero():
                continue  # zero coeffs don't contribute OR mark density
            if var.kind == INPUT:
                tmp = self.input_assignment[var.index]
                if input_density is not None:
                    input_density.inc(var.index)
            else:
                tmp = self.aux_assignment[var.index]
                if aux_density is not None:
                    aux_density.inc(var.index)
            acc = acc + tmp * coeff
        return acc

    def enforce(self, annotation, a, b, c):
        a = self._coerce_lc(a)
        b = self._coerce_lc(b)
        c = self._coerce_lc(c)
        # A-inputs are fully dense (dummy input constraints) -> not tracked
        self.a.append(self._eval(a, None, self.a_aux_density))
        self.b.append(self._eval(b, self.b_input_density, self.b_aux_density))
        # No C query exists; the (beta A + alpha B + C) query is fully dense
        self.c.append(self._eval(c, None, None))


def synthesize_for_proving(engine, circuit) -> ProvingAssignment:
    """Run witness synthesis + the per-input dummy constraints."""
    field = engine.Fr
    prover = ProvingAssignment(field)
    prover.alloc_input("", lambda: field.one())
    circuit.synthesize(prover)
    for i in range(len(prover.input_assignment)):
        prover.enforce("", prover.lc() + Variable.input(i),
                       prover.lc(), prover.lc())
    return prover


def compute_h_coeffs(field, a, b, c):
    """The QAP quotient pipeline: returns the coefficients of h(x) with the
    highest coefficient dropped (prover.rs:221-241)."""
    ops = ScalarOps(field)
    da = EvaluationDomain.from_coeffs(list(a), ops, field)
    db = EvaluationDomain.from_coeffs(list(b), ops, field)
    dc = EvaluationDomain.from_coeffs(list(c), ops, field)
    da.ifft(); da.coset_fft()
    db.ifft(); db.coset_fft()
    dc.ifft(); dc.coset_fft()
    da.mul_assign(db)
    da.sub_assign(dc)
    da.divide_by_z_on_coset()
    da.icoset_fft()
    coeffs = da.into_coeffs()
    return coeffs[:-1]


def create_proof(engine, circuit, params, r, s) -> Proof:
    prover = synthesize_for_proving(engine, circuit)
    field = engine.Fr

    vk = params.get_vk(len(prover.input_assignment))

    # h(x) MSM
    h_coeffs = compute_h_coeffs(field, prover.a, prover.b, prover.c)
    h = multiexp(params.get_h(len(h_coeffs)), FULL_DENSITY, h_coeffs, group=engine.G1)

    input_assignment = prover.input_assignment
    aux_assignment = prover.aux_assignment

    l = multiexp(params.get_l(len(aux_assignment)), FULL_DENSITY, aux_assignment,
                 group=engine.G1)

    a_inputs_src, a_aux_src = params.get_a(
        len(input_assignment), prover.a_aux_density.get_total_density()
    )
    a_inputs = multiexp(a_inputs_src, FULL_DENSITY, input_assignment, group=engine.G1)
    a_aux = multiexp(a_aux_src, prover.a_aux_density, aux_assignment, group=engine.G1)

    b_input_total = prover.b_input_density.get_total_density()
    b1_in_src, b1_aux_src = params.get_b_g1(b_input_total, None)
    b_g1_inputs = multiexp(b1_in_src, prover.b_input_density, input_assignment,
                           group=engine.G1)
    b_g1_aux = multiexp(b1_aux_src, prover.b_aux_density, aux_assignment, group=engine.G1)

    b2_in_src, b2_aux_src = params.get_b_g2(b_input_total, None)
    b_g2_inputs = multiexp(b2_in_src, prover.b_input_density, input_assignment,
                           group=engine.G2)
    b_g2_aux = multiexp(b2_aux_src, prover.b_aux_density, aux_assignment, group=engine.G2)

    if vk.delta_g1.is_identity() or vk.delta_g2.is_identity():
        # Subversion-CRS attack check (prover.rs:320-324)
        raise UnexpectedIdentity("delta is the identity; CRS is subverted")

    g_a = vk.delta_g1.mul_int(int(r)) + vk.alpha_g1
    g_b = vk.delta_g2.mul_int(int(s)) + vk.beta_g2
    g_c = (
        vk.delta_g1.mul_int(int(r * s))
        + vk.alpha_g1.mul_int(int(s))
        + vk.beta_g1.mul_int(int(r))
    )

    a_answer = a_inputs + a_aux
    g_a = g_a + a_answer
    g_c = g_c + a_answer.mul_int(int(s))

    b1_answer = b_g1_inputs + b_g1_aux
    b2_answer = b_g2_inputs + b_g2_aux
    g_b = g_b + b2_answer
    g_c = g_c + b1_answer.mul_int(int(r)) + h + l

    return Proof(a=g_a, b=g_b, c=g_c)


def create_random_proof(engine, circuit, params, rng) -> Proof:
    r = engine.Fr(rng.randrange(engine.Fr.MODULUS))
    s = engine.Fr(rng.randrange(engine.Fr.MODULUS))
    return create_proof(engine, circuit, params, r, s)
