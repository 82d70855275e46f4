"""Compiled circuits: one-time symbolic synthesis -> device-evaluable R1CS.

The reference re-runs witness synthesis per proof inside
ProvingAssignment, evaluating every LinearCombination in serial host code
(/root/reference/groth16/src/prover.rs:19-55,182-215). That is fine in
Rust; in Python at 2^20 constraints it is minutes of interpreter time.
The TPU-native design separates the two things that pass conflates:

* circuit STRUCTURE — the sparse constraint matrices M_a, M_b, M_c and
  the query densities. These depend only on the circuit, never on the
  witness, and the zero-coefficient rule (zero coeffs neither contribute
  nor mark density, prover.rs:31 / CHANGELOG 0.11.2) is decidable at
  compile time. One symbolic synthesis pass (the same trick the
  generator's KeypairAssembly uses, groth16/src/generator.rs:43-155)
  records everything into padded numpy index/coefficient arrays.
* witness VALUES — supplied per proof as plain-form limb arrays
  ((L, n) uint32), typically computed vectorized on device or with
  numpy, never as per-element Python field objects.

Per proof, a/b/c = M_a w, M_b w, M_c w are evaluated on device: K
gathered Montgomery multiplies + modular adds at full lane width, where
K is the padded row width (max terms per constraint; 2-3 for MiMC-like
circuits). Proofs are bit-identical to the ProvingAssignment oracle —
see tests/test_compiled.py.
"""

from __future__ import annotations

import functools

import numpy as np

from .r1cs import ConstraintSystem, Variable, INPUT
from .multiexp import DensityTracker


class _Matrix:
    """Padded sparse rows of one constraint matrix.

    idx: (K, m) int32 — global witness index per slot (inputs first,
    then aux; slot padding points at index 0 with coefficient 0).
    coeff: (K, m) object/int list at build time; converted to Montgomery
    limb arrays by ``device_arrays``.
    """

    def __init__(self):
        self.rows = []  # per constraint: list[(global_idx, int_coeff)]

    def add_row(self, terms):
        self.rows.append(terms)

    def padded(self, num_constraints):
        K = max((len(r) for r in self.rows), default=0)
        K = max(K, 1)
        m = num_constraints
        idx = np.zeros((K, m), np.int32)
        coeff = [[0] * m for _ in range(K)]
        for j, row in enumerate(self.rows):
            for k, (gi, cv) in enumerate(row):
                idx[k, j] = gi
                coeff[k][j] = cv
        return K, idx, coeff


class CompilingAssembly(ConstraintSystem):
    """Symbolic synthesis: records matrix structure + densities.

    Value closures are never called (like KeypairAssembly: the generator
    never evaluates assignments, generator.rs:58-75)."""

    def __init__(self, field):
        super().__init__(field)
        self.num_inputs = 0
        self.num_aux = 0
        self.ma = _Matrix()
        self.mb = _Matrix()
        self.mc = _Matrix()
        self.a_aux_density = DensityTracker()
        self.b_input_density = DensityTracker()
        self.b_aux_density = DensityTracker()

    def alloc(self, annotation, f):
        i = self.num_aux
        self.num_aux += 1
        self.a_aux_density.add_element()
        self.b_aux_density.add_element()
        return Variable.aux(i)

    def alloc_input(self, annotation, f):
        i = self.num_inputs
        self.num_inputs += 1
        self.b_input_density.add_element()
        return Variable.input(i)

    def _terms(self, lc, mark=None):
        """(global_idx, coeff) pairs with the zero-coeff rule applied.
        Global index: inputs [0, num_inputs), aux offset by num_inputs
        (resolved later: aux recorded as (AUX, idx) then shifted)."""
        out = []
        for var, coeff in self._coerce_lc(lc).terms.items():
            if coeff.is_zero():
                continue
            out.append((var.kind, var.index, int(coeff)))
            if mark is not None:
                inp_d, aux_d = mark
                if var.kind == INPUT:
                    if inp_d is not None:
                        inp_d.inc(var.index)
                elif aux_d is not None:
                    aux_d.inc(var.index)
        return out

    def enforce(self, annotation, a, b, c):
        self.ma.add_row(self._terms(a, (None, self.a_aux_density)))
        self.mb.add_row(
            self._terms(b, (self.b_input_density, self.b_aux_density))
        )
        self.mc.add_row(self._terms(c))


class CompiledCircuit:
    """The result of compiling a circuit: padded device-ready matrices,
    densities, and counts. Reusable across proofs and witnesses."""

    def __init__(self, engine, circuit):
        field = engine.Fr
        asm = CompilingAssembly(field)
        asm.alloc_input("", lambda: None)  # ONE
        circuit.synthesize(asm)
        # per-input dummy constraints x * 0 = 0 (prover.rs:208-215);
        # A-inputs become fully dense by construction
        for i in range(asm.num_inputs):
            asm.ma.add_row([(INPUT, i, 1)])
            asm.mb.add_row([])
            asm.mc.add_row([])
        self.engine = engine
        self.num_inputs = asm.num_inputs
        self.num_aux = asm.num_aux
        self.num_constraints = len(asm.ma.rows)
        self.a_aux_density = asm.a_aux_density
        self.b_input_density = asm.b_input_density
        self.b_aux_density = asm.b_aux_density

        def resolve(mat):
            rows = [
                [
                    (idx if kind == INPUT else self.num_inputs + idx, cv)
                    for kind, idx, cv in row
                ]
                for row in mat.rows
            ]
            m = _Matrix()
            m.rows = rows
            return m.padded(self.num_constraints)

        self.a_padded = resolve(asm.ma)
        self.b_padded = resolve(asm.mb)
        self.c_padded = resolve(asm.mc)
        self._device = {}

    def device_matrices(self, spec):
        """(K, idx (K,m) int32 device, coeff_mont (K,L,m) device) per
        matrix, cached per field spec."""
        key = spec.name
        cached = self._device.get(key)
        if cached is not None:
            return cached
        import jax.numpy as jnp

        out = []
        for K, idx, coeff in (self.a_padded, self.b_padded, self.c_padded):
            cm = np.stack(
                [spec.to_mont_host(row) for row in coeff]
            )  # (K, L, m)
            out.append((K, jnp.asarray(idx), jnp.asarray(cm)))
        out = tuple(out)
        self._device[key] = out
        return out


def compile_circuit(engine, circuit) -> CompiledCircuit:
    return CompiledCircuit(engine, circuit)
