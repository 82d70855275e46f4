"""Point-valued evaluation domains: the reference's FFT is generic over
Group (scalars or curve points — domain.rs:192-259); the host domain
here is too. The FFT of g^c_i must equal g^(FFT(c)_i) (the transform is
linear), checked over the DummyEngine group."""

import random

from bellman_tpu.algebra.engine import DummyEngine, DummyG, FrD
from bellman_tpu.domain import EvaluationDomain, PointOps, ScalarOps


def test_point_fft_matches_scalar_fft():
    rng = random.Random(3)
    n = 8
    coeffs = [FrD(rng.randrange(64513)) for _ in range(n)]

    sdom = EvaluationDomain.from_coeffs(list(coeffs), ScalarOps(FrD), FrD)
    sdom.fft()

    pts = [DummyG(1).mul_int(int(c)) for c in coeffs]
    pdom = EvaluationDomain.from_coeffs(pts, PointOps(DummyG), FrD)
    pdom.fft()

    assert pdom.coeffs == [DummyG(1).mul_int(int(v)) for v in sdom.coeffs]

    pdom.ifft()
    assert pdom.coeffs == pts
