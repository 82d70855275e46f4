"""Structured per-kernel timing and an honest u32-op roofline model.

The reference's observability is a `log` crate hook and ad-hoc Instant
timers (SURVEY.md §5); for a TPU framework the useful invariants are
analytic kernel costs in *u32 VPU ops* plus wall-clock timers around
dispatches. Everything in the compute path (limb Montgomery arithmetic,
point formulas, FFT butterflies) ultimately executes 32-bit multiplies,
adds, shifts and masks on the 8x128 VPU, and the measured marginal
throughput for all of them is the same to ~2x (benches/op_probe.py on
v5e: mul 1.60 T/s, add 1.55 T/s, shift 3.0 T/s) — so a flat op count
against the measured peak is the speed-of-light denominator.

Calibration (v5e chip through the axon tunnel, honest device_get
timing — block_until_ready does NOT synchronize through the tunnel):
  U32_PEAK_V5E = 1.55e12 marginal u32 ops/s.

Field-multiply cost is derived from the limb spec (ops/limbs.py):
  w<=13 conv+REDC (mont_mul_conv):  L^2 products + (L-1)^2 adds
    + L*(2*p_nz + 4) REDC ops + 8L carry/cond-sub tail
  w=16 CIOS (mont_mul_kernel):      2L^2 products + L*(8L+4) + 8L
    (every u32 product is split lo/hi before accumulating)

Point-formula costs count field muls/adds from ops/curve.py and the
kernel twins in ops/kernel_ops.py:
  full Jacobian add (add-2007-bl + masked dbl path): 13M + 10S + ~28A
  mixed add from affine prep (madd-2007-bl class):    8M +  6S + ~18A
"""

from __future__ import annotations

import contextlib
import time

U32_PEAK_V5E = 1.55e12  # measured marginal u32 VPU ops/s (op_probe.py)


class KernelTimer:
    """Collects named wall-clock spans; ``report()`` returns a dict."""

    def __init__(self):
        self.spans = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans.setdefault(name, 0.0)
            self.spans[name] += time.perf_counter() - t0

    def report(self) -> dict:
        return dict(sorted(self.spans.items(), key=lambda kv: -kv[1]))


# -- analytic u32-op counts -------------------------------------------------


def _spec(name: str):
    from bellman_tpu.ops import limbs

    return limbs.spec_for(name)


def ops_field_mul(spec) -> int:
    """u32 VPU ops for one Montgomery multiply on ``spec`` limbs."""
    L = spec.L
    if getattr(spec, "conv_ok", False):
        conv = L * L + (L - 1) * (L - 1)
        redc = L * (2 * spec.p_nz + 4)
        return conv + redc + 8 * L
    return 2 * L * L + L * (8 * L + 4) + 8 * L


def ops_field_add(spec) -> int:
    """u32 ops for one modular add (carry propagate + cond-sub)."""
    return 9 * spec.L


def ops_fq_mul() -> int:
    return ops_field_mul(_spec("bls_fq"))


def ops_fr_mul() -> int:
    return ops_field_mul(_spec("bls_fr"))


def ops_g1_add_full() -> int:
    """Branchless full Jacobian add (curve.CurveOps.add): 13M+10S+~28A."""
    return 23 * ops_fq_mul() + 28 * ops_field_add(_spec("bls_fq"))


def ops_g1_madd() -> int:
    """Mixed add from affine prep (pallas fold level0): 8M+6S+~18A."""
    return 14 * ops_fq_mul() + 18 * ops_field_add(_spec("bls_fq"))


def ops_msm_g1(n: int, c: int, scalar_bits: int = 256) -> int:
    """Arithmetic lower bound for the bucket method: every point enters
    exactly one (window, bucket) accumulation per window -> nw*n mixed
    adds. Bucket-total/window-fold costs are o(n) and excluded (at
    2^20+, c<=16 they are <~35% and shrink with n)."""
    nw = -(-scalar_bits // c)
    return nw * n * ops_g1_madd()


def ops_fft(n: int) -> int:
    """(n/2) log2 n butterflies: one Fr mul + one add + one sub each."""
    import math

    spec = _spec("bls_fr")
    butt = ops_field_mul(spec) + 2 * ops_field_add(spec)
    return (n // 2) * int(math.log2(n)) * butt


def roofline_fraction(measured_seconds: float, total_u32_ops: int,
                      peak_ops_per_s: float = U32_PEAK_V5E) -> float:
    """measured vs speed-of-light at ``peak_ops_per_s`` u32 ops/s
    (calibrate with benches/op_probe.py once per chip type)."""
    ideal = total_u32_ops / peak_ops_per_s
    return ideal / measured_seconds if measured_seconds > 0 else 0.0
