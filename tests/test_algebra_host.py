"""Host BLS12-381 algebra: curve groups, serialization, pairing.

These pin the behaviors the reference delegates to the external
``bls12_381``/``group``/``pairing`` crates (SURVEY.md section 2.3)."""

import random

import pytest

from bellman_tpu.algebra.bls12_381 import (
    Fq, Fr, Fq2, Fq12, G1Affine, G2Affine, P, R, XI,
    pairing, miller_loop, final_exponentiation, multi_miller_loop,
    batch_normalize,
)


def test_field_constants():
    assert Fr.S == 32
    assert Fr.NUM_BITS == 255
    assert Fr.CAPACITY == 254
    assert Fr.REPR_BYTES == 32
    assert Fq.REPR_BYTES == 48
    # omega^(2^32) == 1, omega^(2^31) != 1
    w = Fr.ROOT_OF_UNITY
    assert w ** (1 << 32) == Fr.one()
    assert w ** (1 << 31) != Fr.one()


def test_fr_sqrt_and_inverse():
    rng = random.Random(7)
    for _ in range(10):
        a = Fr.random(rng)
        if a.is_zero():
            continue
        assert a * a.invert() == Fr.one()
        s = (a * a).sqrt()
        assert s is not None and (s == a or s == -a)


def test_generators_on_curve_and_order():
    g1 = G1Affine.generator()
    g2 = G2Affine.generator()
    assert g1.is_on_curve() and g2.is_on_curve()
    assert g1.mul_int(R).is_identity()
    assert g2.mul_int(R).is_identity()


def test_group_laws():
    g1 = G1Affine.generator()
    g2 = G2Affine.generator()
    a, b = 1234567, 89101112
    assert g1.mul_int(a) + g1.mul_int(b) == g1.mul_int(a + b)
    assert g2.mul_int(a) + g2.mul_int(b) == g2.mul_int(a + b)
    assert (g1 + (-g1)).is_identity()
    assert g1.double() == g1 + g1


def test_serialization_roundtrip():
    g1 = G1Affine.generator()
    g2 = G2Affine.generator()
    for pt in [g1, g1.mul_int(777), G1Affine.identity()]:
        assert len(pt.to_compressed()) == 48
        assert len(pt.to_uncompressed()) == 96
        assert G1Affine.from_compressed(pt.to_compressed()) == pt
        assert G1Affine.from_uncompressed(pt.to_uncompressed()) == pt
    for pt in [g2, g2.mul_int(777), G2Affine.identity()]:
        assert len(pt.to_compressed()) == 96
        assert len(pt.to_uncompressed()) == 192
        assert G2Affine.from_compressed(pt.to_compressed()) == pt
        assert G2Affine.from_uncompressed(pt.to_uncompressed()) == pt


def test_compressed_rejects_bad_points():
    # x not on curve: flip bits until decompression fails
    g1c = bytearray(G1Affine.generator().to_compressed())
    g1c[47] ^= 1
    with pytest.raises(ValueError):
        G1Affine.from_compressed(bytes(g1c))


def test_fq12_tower():
    f = Fq12([Fq2(i + 1, 2 * i + 3) for i in range(6)])
    assert f * f.invert() == Fq12.one()
    assert f.frobenius(1) == f.pow(P)
    assert f.frobenius(6) == f.conjugate()
    x = Fq2(3, 5)
    assert x * x.invert() == Fq2.one()
    s = (x * x).sqrt()
    assert s == x or s == -x


def test_batch_normalize():
    g1 = G1Affine.generator()
    jacs = [g1.mul_int(i + 1)._to_jac() for i in range(5)] + [None]
    out = batch_normalize(jacs, G1Affine)
    for i in range(5):
        assert out[i] == g1.mul_int(i + 1)
    assert out[5].is_identity()


@pytest.mark.slow
def test_pairing_bilinearity():
    g1 = G1Affine.generator()
    g2 = G2Affine.generator()
    e = pairing(g1, g2)
    assert e != Fq12.one()
    assert e.pow(R) == Fq12.one()
    a, b = 12345, 67890
    assert pairing(g1.mul_int(a), g2.mul_int(b)) == e.pow(a * b % R)
    # e(P, -Q) = e(P, Q)^-1
    assert pairing(g1, -g2) == e.invert()
    # identity input
    assert pairing(G1Affine.identity(), g2) == Fq12.one()


@pytest.mark.slow
def test_multi_miller_loop_matches_product():
    g1 = G1Affine.generator()
    g2 = G2Affine.generator()
    pairs = [(g1, g2), (g1.mul_int(3), g2.mul_int(5))]
    lhs = multi_miller_loop(pairs).final_exponentiation()
    rhs = pairing(*pairs[0]) * pairing(*pairs[1])
    assert lhs == rhs
