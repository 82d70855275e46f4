"""Structured per-kernel timing and roofline cost model.

The reference's observability is a `log` crate hook and ad-hoc Instant
timers (SURVEY.md §5); for a TPU framework the useful invariants are
analytic kernel costs in u16-multiplies (everything rooflines through
the 16x16->32 lane multiply) plus wall-clock timers around dispatches.

Cost model (lazy-carry CIOS, ops.limbs):
  Fr/Fq mul:   2 * L^2 u16-multiplies   (L = 16 for Fr, 24 for Fq)
  Fq2 mul:     3 Fq muls (Karatsuba)
  G1 add:      ~12 Fq muls + 7 squares  (batched add-2007-bl + dbl path)
  FFT:         (n/2) log2 n butterflies, 1 Fr mul each
  MSM window:  ~2n G1 adds (segmented scan) + 2^c bucket adds
"""

from __future__ import annotations

import contextlib
import time


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


# -- analytic u16-multiply counts ------------------------------------------

L_FR = 16
L_FQ = 24


def mults_field_mul(limbs: int) -> int:
    return 2 * limbs * limbs


def mults_fq2_mul() -> int:
    return 3 * mults_field_mul(L_FQ)


def mults_g1_add() -> int:
    # batched add (11M + 5S in Fq, doubling path shares squares)
    return 19 * mults_field_mul(L_FQ)


def mults_g2_add() -> int:
    return 19 * mults_fq2_mul()


def mults_fft(n: int) -> int:
    import math

    return (n // 2) * int(math.log2(n)) * mults_field_mul(L_FR)


def mults_msm_g1(n: int, c: int) -> int:
    windows = -(-256 // c)
    per_window = 2 * n * mults_g1_add() + (1 << c) * 2 * mults_g1_add()
    return windows * per_window


def roofline_fraction(measured_seconds: float, total_mults: int,
                      peak_mults_per_s: float) -> float:
    """measured vs speed-of-light at `peak_mults_per_s` u16-multiplies/s
    (calibrate the peak with benches/microbench once per chip type)."""
    ideal = total_mults / peak_mults_per_s
    return ideal / measured_seconds if measured_seconds > 0 else 0.0
