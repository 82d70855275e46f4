"""Device radix-2 FFT over prime-field limb vectors, and the QAP h-pipeline.

TPU-native evaluation-domain kernels with the exact semantics of the
reference's EvaluationDomain (/root/reference/src/domain.rs:81-189):
in-place fft/ifft (iterative bit-reversed Cooley-Tukey, serial_fft
:272-314), coset shifts via distribute_powers with the field's
multiplicative generator (:101-118), coset division by the vanishing
polynomial z(tau) = tau^m - 1 (:129-151), and pointwise mul/sub.

Design notes (TPU-first):
* Elements are Montgomery-form 16-bit-limb vectors (ops.limbs), shape
  (L, n) with n on the lane axis, so each butterfly stage is a reshape +
  one vectorized Montgomery multiply + add/sub over the whole domain.
* Twiddle tables are generated ON DEVICE in log n doubling steps
  (powers[0:2^k] -> concat(powers, powers * w^(2^k))) — no host big-int
  loops at plan-build time.
* All log n stages unroll under one jit; XLA fuses the elementwise
  chains between multiplies. Distributed stages (all-to-all across the
  mesh, the parallel_fft decomposition of domain.rs:316-372) live in
  bellman_tpu.parallel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .limbs import FieldSpec, W


def bitrev_indices(log_n: int) -> np.ndarray:
    """Vectorized bit-reversal permutation of 0..2^log_n-1."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros_like(idx)
    for i in range(log_n):
        rev |= ((idx >> i) & 1) << (log_n - 1 - i)
    return rev.astype(np.int32)


def geometric_powers(spec: FieldSpec, base_mont, log_n: int):
    """[base^0, base^1, ..., base^(2^log_n - 1)] in Montgomery form.

    base_mont: (L, 1) device array. log n doubling steps of device muls.
    """
    arr = jnp.asarray(spec.one_mont)  # (L, 1)
    cur = base_mont
    for _ in range(log_n):
        arr = jnp.concatenate([arr, limbs.mont_mul(spec, arr, cur)], axis=-1)
        cur = limbs.mont_mul(spec, cur, cur)
    return arr


class DomainPlan:
    """Precomputed constants for a 2^exp evaluation domain over a field.

    ``field`` is the host field class (provides S / ROOT_OF_UNITY /
    GENERATOR as in ff::PrimeField); ``spec`` the matching device spec.
    """

    def __init__(self, spec: FieldSpec, field, exp: int):
        if exp > field.S:
            from ..r1cs import PolynomialDegreeTooLarge

            raise PolynomialDegreeTooLarge(
                f"domain 2^{exp} exceeds field 2-adicity {field.S}"
            )
        self.spec = spec
        self.field = field
        self.exp = exp
        self.n = 1 << exp

        omega = field.ROOT_OF_UNITY
        for _ in range(exp, field.S):
            omega = omega.square()
        self.omega_int = int(omega)
        omega_inv = int(omega.invert()) if exp > 0 else 1
        g = int(field.GENERATOR)
        g_inv = int(field.GENERATOR.invert())
        p = spec.p

        def mont1(v):
            return jnp.asarray(spec.to_mont_host([v]))

        half = max(exp - 1, 0)
        self.twiddles = geometric_powers(spec, mont1(self.omega_int), half)
        self.inv_twiddles = geometric_powers(spec, mont1(omega_inv), half)
        self.g_powers = geometric_powers(spec, mont1(g), exp)
        self.ginv_powers = geometric_powers(spec, mont1(g_inv), exp)
        self.minv = mont1(pow(self.n, -1, p))
        # 1 / z(g) = 1 / (g^n - 1), for divide_by_z_on_coset
        zg = (pow(g, self.n, p) - 1) % p
        self.zinv = mont1(pow(zg, -1, p))
        self.bitrev = jnp.asarray(bitrev_indices(exp))
        self._fft_jits = {}
        self._fft_aot = {}
        self._fused_tables = {}
        self._omega_inv_int = omega_inv
        self._key = (spec.name, field.__name__, exp)

    def fused_tables(self, inverse: bool):
        """Per-stage twiddle tables for the fused FFT kernels (built
        once per plan — see pallas_fft.stage_tables)."""
        t = self._fused_tables.get(inverse)
        if t is None:
            from . import pallas_fft

            t = pallas_fft.stage_tables(
                self.spec, self.exp,
                self._omega_inv_int if inverse else self.omega_int,
            )
            self._fused_tables[inverse] = t
        return t

    # -- core transforms (pure functions of (L, n) Montgomery arrays) -------
    def _fft_impl(self, a, inverse: bool, scale: bool):
        spec, n, log_n = self.spec, self.n, self.exp
        L = spec.L
        from . import pallas_kernels as pk

        # the butterfly multiply+carry chains run as one fused Pallas
        # VMEM pass per stage on TPU (serial_fft's inner loop,
        # domain.rs:292-313); XLA-CPU keeps the jnp twin
        use_pallas = pk.enabled() and (n // 2) % pk.TILE_N == 0

        a = jnp.take(a, self.bitrev, axis=-1)
        tw = self.inv_twiddles if inverse else self.twiddles

        # fused multi-stage kernels: the whole ladder in 2-4 VMEM passes
        # instead of one pass per stage (ops/pallas_fft.py)
        if use_pallas and n >= (1 << 8):
            from . import pallas_fft

            a = pallas_fft.fused_fft(
                spec, log_n, tw, a, tables=self.fused_tables(inverse)
            )
            if inverse and scale:
                a = self._mul_hot(a, self.minv)
            return a
        for s in range(log_n):
            m = 1 << s
            stride = n // (2 * m)
            x = a.reshape(L, n // (2 * m), 2, m)
            u = x[:, :, 0, :].reshape(L, n // 2)
            v = x[:, :, 1, :].reshape(L, n // 2)
            w = tw[:, ::stride][:, :m]  # omega^(j * n/(2m)), j < m
            wb = jnp.broadcast_to(
                w[:, None, :], (L, n // (2 * m), m)
            ).reshape(L, n // 2)
            if use_pallas:
                hi, lo = pk.butterfly(spec, u, v, wb)
            else:
                t = limbs.mont_mul_hot(spec, v, wb)
                hi = limbs.add_hot(spec, u, t)
                lo = limbs.sub_hot(spec, u, t)
            a = jnp.concatenate(
                [
                    hi.reshape(L, n // (2 * m), 1, m),
                    lo.reshape(L, n // (2 * m), 1, m),
                ],
                axis=2,
            ).reshape(L, n)
        if inverse and scale:
            a = self._mul_hot(a, self.minv)
        return a

    def fft(self, a, inverse: bool = False, scale: bool | None = None):
        """scale: apply the 1/n factor on inverse transforms (default);
        distributed callers pass scale=False and apply the global 1/n.

        Eager calls go through a cached per-plan jit; inside an outer
        trace the pjit inlines."""
        if scale is None:
            scale = inverse
        key = (inverse, scale)
        fn = self._fft_jits.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(self._fft_impl, inverse=inverse, scale=scale)
            )
            self._fft_jits[key] = fn
        # eager TPU calls route through the AOT artifact store: the
        # 20-stage butterfly trace is minutes of local lowering per
        # process (utils/aot.py); in-trace callers (h_pipeline_jit,
        # sharded shard_map bodies) see tracers and inline as before
        from . import pallas_kernels as pk

        if (pk.enabled() and not isinstance(a, jax.core.Tracer)
                and tuple(a.shape) == (self.spec.L, self.n)):
            from ..utils import aot

            if aot.enabled():
                exe = self._fft_aot.get(key)
                if exe is None:
                    exe = aot.compiled(
                        f"fft{self.exp}", self._key + key, (a,), fn
                    )
                    self._fft_aot[key] = exe
                return exe(a)
        return fn(a)

    def ifft(self, a):
        return self.fft(a, inverse=True)

    def _mul_hot(self, a, b):
        """Pointwise Montgomery mul, via the fused Pallas kernel on TPU
        when tile-aligned."""
        from . import pallas_kernels as pk

        if pk.enabled() and a.shape[-1] % pk.TILE_N == 0:
            return pk.mont_mul(self.spec, a, jnp.broadcast_to(b, a.shape))
        return limbs.mont_mul(self.spec, a, b)

    def distribute_powers(self, a, inverse: bool = False):
        pw = self.ginv_powers if inverse else self.g_powers
        return self._mul_hot(a, pw)

    def _distribute_powers_r(self, a, inverse: bool = False):
        pw = self.ginv_powers if inverse else self.g_powers
        return limbs.mont_mul_kernel(self.spec, a, pw)

    def coset_fft(self, a):
        return self.fft(self.distribute_powers(a))

    def icoset_fft(self, a):
        return self.distribute_powers(self.ifft(a), inverse=True)

    def divide_by_z_on_coset(self, a):
        return self._mul_hot(a, self.zinv)

    def mul_pointwise(self, a, b):
        return self._mul_hot(a, b)

    def sub_pointwise(self, a, b):
        return limbs.sub(self.spec, a, b)


_PLANS: dict = {}


def get_plan(spec: FieldSpec, field, exp: int) -> DomainPlan:
    key = (spec.name, field.__name__, field.MODULUS, exp)
    plan = _PLANS.get(key)
    if plan is None:
        plan = DomainPlan(spec, field, exp)
        _PLANS[key] = plan
    return plan


def h_pipeline(plan: DomainPlan, a, b, c):
    """The QAP quotient h(x) on device, semantics of
    /root/reference/groth16/src/prover.rs:221-241: 3 iFFTs + 3 coset FFTs,
    pointwise a*b - c, coset division by z, icoset-FFT; the caller drops
    the highest coefficient. Inputs/outputs (L, n) Montgomery.

    The pointwise middle runs as a fused Pallas VMEM kernel on TPU
    (one pass instead of three) when the domain is tile-aligned."""
    a = plan.coset_fft(plan.ifft(a))
    b = plan.coset_fft(plan.ifft(b))
    c = plan.coset_fft(plan.ifft(c))
    from . import pallas_kernels as pk

    if pk.enabled() and plan.n % pk.TILE_N == 0:
        ab = pk.h_pointwise(plan.spec, a, b, c, zinv=plan.zinv)
    else:
        ab = plan.mul_pointwise(a, b)
        ab = plan.sub_pointwise(ab, c)
        ab = plan.divide_by_z_on_coset(ab)
    return plan.icoset_fft(ab)


def h_pipeline_jit(plan: DomainPlan):
    """A jitted h-pipeline closure for this plan (compiled per domain)."""
    return jax.jit(lambda a, b, c: h_pipeline(plan, a, b, c))
