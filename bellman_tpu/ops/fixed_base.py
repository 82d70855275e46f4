"""Fixed-base batch exponentiation: g^{s_i} for many scalars, one base.

TPU-native equivalent of the generator's shared wNAF window tables
(group::Wnaf at /root/reference/groth16/src/generator.rs:209-226,
271-297, 397-415; SURVEY.md §2.3): a host-precomputed window table
T[w][d] = (d * 2^(c*w)) * g  (d < 2^c) is uploaded once; each scalar's
point is the sum over windows of one table gather — entirely
data-parallel, no per-scalar doubling chains on device.

Batched projective->affine normalization (group::batch_normalize,
generator.rs:293) runs on device with the Montgomery-trick batch
inversion from ops.limbs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .curve import CurveOps, pack_jac, unpack_jac


class FixedBaseTable:
    """Window table for one base point on one curve."""

    def __init__(self, ops: CurveOps, base, scalar_bits: int, c: int = 8):
        """base: a HOST point (G1Affine/G2Affine-style); builds the
        (num_windows * 2^c) table host-side and uploads it packed."""
        self.ops = ops
        self.c = c
        self.num_windows = -(-scalar_bits // c)
        rows = []
        step = base  # (2^(c*w)) * base after w iterations
        for _ in range(self.num_windows):
            cur = type(base).identity()
            row = []
            for _ in range(1 << c):
                row.append(cur)
                cur = cur + step
            rows.append(row)
            step = self._shift(step, c)
        flat = [p for row in rows for p in row]
        self.table = self._upload(flat)  # packed (3C, nw * 2^c)

    @staticmethod
    def _shift(p, c):
        for _ in range(c):
            p = p.double()
        return p

    def _upload(self, points):
        from . import curve as curve_mod

        ops = self.ops
        if ops is curve_mod.g1_ops():
            dev = curve_mod.g1_to_device(points)
        else:
            dev = curve_mod.g2_to_device(points)
        return pack_jac(ops, dev)

    def apply(self, scalar_limbs):
        """scalar_limbs: (L, n) plain form -> Jacobian point batch (n,)."""
        return _apply_table(self.ops, self.c, self.num_windows, self.table,
                            scalar_limbs)


def _extract_digits(scalar_limbs, window: int, c: int):
    """Digit ``window`` of each scalar: bits [w*c, (w+1)*c); c | 16.
    scalar_limbs: (L, n) uint32 plain-form 16-bit limbs."""
    assert 16 % c == 0, "window size must divide the 16-bit limb width"
    per = 16 // c
    limb = scalar_limbs[window // per]
    shift = (window % per) * c
    return (limb >> shift) & ((1 << c) - 1)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _apply_table(ops: CurveOps, c: int, num_windows: int, table, scalar_limbs):
    """Sum over windows of table lookups, as a lax.scan so the Jacobian
    add is traced once (a Python loop over 32 windows made XLA's CPU
    compile pathological)."""
    n = scalar_limbs.shape[-1]
    digit_rows = jnp.stack(
        [
            jnp.uint32(w << c) + _extract_digits(scalar_limbs, w, c)
            for w in range(num_windows)
        ]
    )  # (nw, n) global table indices

    def body(acc, idx):
        pts = jnp.take(table, idx, axis=-1)
        merged = pack_jac(
            ops, ops.add(unpack_jac(ops, acc), unpack_jac(ops, pts))
        )
        return merged, None

    init = jnp.take(table, digit_rows[0], axis=-1)
    acc, _ = jax.lax.scan(body, init, digit_rows[1:])
    return acc


@functools.partial(jax.jit, static_argnums=0)
def batch_to_affine(ops: CurveOps, packed):
    """Jacobian batch -> affine coords + infinity mask, on device
    (batch-normalize: one field inversion for the whole batch)."""
    X, Y, Z = unpack_jac(ops, packed)
    f = ops.f
    spec = f.spec
    if len(f.coeff_shape) == 1:
        zinv = limbs.batch_inv_r(spec, Z)
        zinv2 = limbs.mont_mul_r(spec, zinv, zinv)
        zinv3 = limbs.mont_mul_r(spec, zinv2, zinv)
        xa = limbs.mont_mul_r(spec, X, zinv2)
        ya = limbs.mont_mul_r(spec, Y, zinv3)
    else:
        # Fq2: invert via norm: (a+bu)^-1 = (a-bu)/(a^2+b^2)
        norm = limbs.add_r(
            spec,
            limbs.mont_mul_r(spec, Z[0], Z[0]),
            limbs.mont_mul_r(spec, Z[1], Z[1]),
        )
        ninv = limbs.batch_inv_r(spec, norm)
        zinv = jnp.stack(
            [
                limbs.mont_mul_r(spec, Z[0], ninv),
                limbs.neg_r(spec, limbs.mont_mul_r(spec, Z[1], ninv)),
            ]
        )
        zinv2 = f.sqr(zinv)
        zinv3 = f.mul(zinv2, zinv)
        xa = f.mul(X, zinv2)
        ya = f.mul(Y, zinv3)
    inf = f.is_zero(Z)
    return xa, ya, inf


def to_host_affine(ops: CurveOps, xa, ya, inf, point_cls):
    """Device affine coords -> host affine point list."""
    f = ops.f
    xs = f.from_mont_host(xa)
    ys = f.from_mont_host(ya)
    infs = np.asarray(jax.device_get(inf))
    fld = point_cls.FIELD

    def wrap(v):
        return fld(*v) if isinstance(v, tuple) else fld(v)

    out = []
    for x, y, i in zip(xs, ys, infs):
        out.append(
            point_cls.identity() if bool(i) else point_cls(wrap(x), wrap(y))
        )
    return out
