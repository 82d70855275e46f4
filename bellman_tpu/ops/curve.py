"""Device elliptic-curve point arithmetic: branchless Jacobian add/double.

TPU-native replacement for the `group` crate the reference leans on
(SURVEY.md §2.3): batched G1 (over Fq) and G2 (over Fq2) Jacobian point
operations as vectorized limb arithmetic. The exceptional cases the Rust
curve crate handles with branches (P = Q, P = -Q, infinities —
SURVEY.md §7 "hard parts" #3) are resolved with lane masks: both the
generic addition and the doubling are computed and the result is
selected per lane.

Point representation: a tuple (X, Y, Z) of field-element arrays (each
(coeff..., *batch) uint32 Montgomery limbs); infinity is encoded Z = 0.
Formulas: add-2007-bl and dbl-2009-l (a = 0 short Weierstrass), which
never divide, so the whole MSM pipeline runs inversion-free; conversion
to affine happens once at the end via Montgomery batch inversion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .limbs import FieldOps, Fq2Ops


class CurveOps:
    """Jacobian point ops over a FieldOps bundle (works for Fq and Fq2)."""

    def __init__(self, fops: FieldOps):
        self.f = fops

    # -- constructors -------------------------------------------------------
    def infinity(self, batch):
        f = self.f
        return (f.one(batch), f.one(batch), f.zeros(batch))

    def from_affine(self, x, y, inf_mask=None):
        """Affine (x, y) -> Jacobian; inf_mask marks identity lanes."""
        f = self.f
        batch = x.shape[len(f.coeff_shape):]
        z = f.one(batch)
        if inf_mask is not None:
            z = f.select(inf_mask, f.zeros(batch), z)
        return (x, y, z)

    def is_identity(self, p):
        return self.f.is_zero(p[2])

    def select(self, mask, p, q):
        f = self.f
        return tuple(f.select(mask, a, b) for a, b in zip(p, q))

    # -- batched field-op helpers (fewer, wider multiply graphs: smaller
    #    traces/compiles AND better vector-unit utilization) ----------------
    def _mul_many(self, xs, ys):
        n = xs[0].shape[-1]
        z = self.f.mul(
            jnp.concatenate(xs, axis=-1), jnp.concatenate(ys, axis=-1)
        )
        return [z[..., i * n : (i + 1) * n] for i in range(len(xs))]

    def _sqr_many(self, xs):
        n = xs[0].shape[-1]
        z = self.f.sqr(jnp.concatenate(xs, axis=-1))
        return [z[..., i * n : (i + 1) * n] for i in range(len(xs))]

    def _sub_many(self, xs, ys):
        n = xs[0].shape[-1]
        z = self.f.sub(
            jnp.concatenate(xs, axis=-1), jnp.concatenate(ys, axis=-1)
        )
        return [z[..., i * n : (i + 1) * n] for i in range(len(xs))]

    def _add_many(self, xs, ys):
        n = xs[0].shape[-1]
        z = self.f.add(
            jnp.concatenate(xs, axis=-1), jnp.concatenate(ys, axis=-1)
        )
        return [z[..., i * n : (i + 1) * n] for i in range(len(xs))]

    # -- group law ----------------------------------------------------------
    def double(self, p):
        """dbl-2009-l (a=0), with the independent multiplies batched.
        Identity doubles to identity (Z=0 propagates through Z3=2*Y1*Z1)."""
        f = self.f
        X1, Y1, Z1 = p
        A, B = self._sqr_many([X1, Y1])
        E = f.add(f.add(A, A), A)
        C, T, F = self._sqr_many([B, f.add(X1, B), E])
        D = f.sub(T, f.add(A, C))
        D = f.add(D, D)
        X3 = f.sub(F, f.add(D, D))
        eight_c = f.add(C, C)
        eight_c = f.add(eight_c, eight_c)
        eight_c = f.add(eight_c, eight_c)
        t2, yz = self._mul_many([E, Y1], [f.sub(D, X3), Z1])
        Y3 = f.sub(t2, eight_c)
        Z3 = f.add(yz, yz)
        return (X3, Y3, Z3)

    def add(self, p, q):
        """Full branchless Jacobian addition (add-2007-bl + masked special
        cases); the doubling path is computed alongside and selected per
        lane, with all independent multiplies batched into 6 wide calls."""
        f = self.f
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)

        # squares batch 1 (add: Z1^2 Z2^2; dbl: X1^2 Y1^2)
        Z1Z1, Z2Z2, A_d, B_d = self._sqr_many([Z1, Z2, X1, Y1])
        # muls batch 1
        U1, U2, YZ2, YZ1 = self._mul_many(
            [X1, X2, Y1, Y2], [Z2Z2, Z1Z1, Z2, Z1]
        )
        # muls batch 2 (add: S1 S2; dbl: Y1*Z1)
        S1, S2, YZ_d = self._mul_many([YZ2, YZ1, Y1], [Z2Z2, Z1Z1, Z1])
        H, rr = self._sub_many([U2, S2], [U1, S1])
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(rr)
        two_h, r2, zsum = self._add_many([H, rr, Z1], [H, rr, Z2])
        E_d = f.add(f.add(A_d, A_d), A_d)
        # squares batch 2 (add: I r2^2 (Z1+Z2)^2; dbl: C T F)
        I, R2SQ, ZZ, C_d, T_d, F_d = self._sqr_many(
            [two_h, r2, zsum, B_d, f.add(X1, B_d), E_d]
        )
        # muls batch 3
        J, V = self._mul_many([H, I], [I, U1])
        X3 = f.sub(R2SQ, f.add(J, f.add(V, V)))
        D_d = f.sub(T_d, f.add(A_d, C_d))
        D_d = f.add(D_d, D_d)
        Xd = f.sub(F_d, f.add(D_d, D_d))
        Zfac = f.sub(ZZ, f.add(Z1Z1, Z2Z2))
        # muls batch 4
        t1, S1J, Z3, t2_d = self._mul_many(
            [r2, S1, Zfac, E_d], [f.sub(V, X3), J, H, f.sub(D_d, Xd)]
        )
        Y3 = f.sub(t1, f.add(S1J, S1J))
        res = (X3, Y3, Z3)

        # doubling result (shares batches above)
        eight_c = f.add(C_d, C_d)
        eight_c = f.add(eight_c, eight_c)
        eight_c = f.add(eight_c, eight_c)
        Yd = f.sub(t2_d, eight_c)
        Zd = f.add(YZ_d, YZ_d)
        dbl = (Xd, Yd, Zd)

        both = ~p_inf & ~q_inf
        res = self.select(both & h_zero & r_zero, dbl, res)
        # P == -Q -> infinity
        batch = jnp.broadcast_shapes(p_inf.shape, q_inf.shape)
        inf = self.infinity(batch)
        res = self.select(both & h_zero & ~r_zero, inf, res)
        # identities
        res = self.select(p_inf & ~q_inf, q, res)
        res = self.select(q_inf & ~p_inf, p, res)
        res = self.select(p_inf & q_inf, inf, res)
        return res

    # -- helpers ------------------------------------------------------------
    def scale_by_int(self, p, k: int):
        """p * k for a small host integer k (double-and-add, unrolled)."""
        if k == 0:
            batch = p[2].shape[len(self.f.coeff_shape):]
            return self.infinity(batch)
        bits = bin(k)[3:]  # skip leading 1
        acc = p
        for b in bits:
            acc = self.double(acc)
            if b == "1":
                acc = self.add(acc, p)
        return acc

    def tree_reduce(self, p):
        """Sum all points along the LAST (batch) axis via pairwise folds.

        p: point with batch (..., n); returns point with batch (..., 1).
        """
        n = p[2].shape[-1]
        while n > 1:
            half = n // 2
            if n % 2:
                lo = tuple(c[..., : half + 1] for c in p)
                hi = tuple(
                    jnp.concatenate(
                        [c[..., half + 1 :], self.infinity(c.shape[len(self.f.coeff_shape):-1] + (1,))[i]],
                        axis=-1,
                    )
                    for i, c in enumerate(p)
                )
                p = self.add(lo, hi)
                n = half + 1
            else:
                lo = tuple(c[..., :half] for c in p)
                hi = tuple(c[..., half:] for c in p)
                p = self.add(lo, hi)
                n = half
        return p


# ---------------------------------------------------------------------------
# Host <-> device marshalling for the concrete BLS12-381 groups
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def g1_ops() -> CurveOps:
    return CurveOps(FieldOps(limbs.spec_for("bls_fq")))


@functools.lru_cache(maxsize=None)
def g2_ops() -> CurveOps:
    return CurveOps(Fq2Ops(limbs.spec_for("bls_fq")))


def g1_to_device(points) -> tuple:
    """Host G1Affine list -> device Jacobian point batch (Montgomery)."""
    ops = g1_ops()
    spec = ops.f.spec
    xs, ys, infs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append(0)
            ys.append(1)
            infs.append(True)
        else:
            xs.append(int(pt.x))
            ys.append(int(pt.y))
            infs.append(False)
    x = jnp.asarray(spec.to_mont_host(xs))
    y = jnp.asarray(spec.to_mont_host(ys))
    inf = jnp.asarray(np.array(infs))
    return ops.from_affine(x, y, inf)


def g2_to_device(points) -> tuple:
    ops = g2_ops()
    f = ops.f
    xs, ys, infs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append((0, 0))
            ys.append((1, 0))
            infs.append(True)
        else:
            xs.append((int(pt.x.c0), int(pt.x.c1)))
            ys.append((int(pt.y.c0), int(pt.y.c1)))
            infs.append(False)
    x = jnp.asarray(f.to_mont_host(xs))
    y = jnp.asarray(f.to_mont_host(ys))
    inf = jnp.asarray(np.array(infs))
    return ops.from_affine(x, y, inf)


def jacobian_to_host(ops: CurveOps, p, point_cls):
    """Device Jacobian batch -> host affine points.

    Z inversions use the Montgomery batch trick (one field inversion +
    3(n-1) multiplies) so pulling hundreds of points costs one invert.
    point_cls: host G1Affine / G2Affine class (FIELD is Fq or Fq2)."""
    f = ops.f
    xs = f.from_mont_host(p[0])
    ys = f.from_mont_host(p[1])
    zs = f.from_mont_host(p[2])
    fld = point_cls.FIELD

    def wrap(v):
        return fld(*v) if isinstance(v, tuple) else fld(v)

    zes = [wrap(z) for z in zs]
    # batch inversion of the nonzero Zs
    nz = [(i, z) for i, z in enumerate(zes) if not z.is_zero()]
    invs = {}
    if nz:
        prefix = []
        acc = None
        for _, z in nz:
            acc = z if acc is None else acc * z
            prefix.append(acc)
        inv_acc = prefix[-1].invert()
        for j in range(len(nz) - 1, -1, -1):
            i, z = nz[j]
            if j == 0:
                invs[i] = inv_acc
            else:
                invs[i] = inv_acc * prefix[j - 1]
                inv_acc = inv_acc * z

    out = []
    for i, (x, y, ze) in enumerate(zip(xs, ys, zes)):
        if ze.is_zero():
            out.append(point_cls.identity())
            continue
        zinv = invs[i]
        zinv2 = zinv.square()
        xe, ye = wrap(x), wrap(y)
        out.append(point_cls(xe * zinv2, ye * zinv2 * zinv))
    return out


def pack_jac(ops: CurveOps, p):
    """Jacobian point tuple (X, Y, Z) -> one (3*C, n) uint32 array.

    A pytree-uniform layout for code that carries point batches through
    gathers/concats (fixed-base tables, tests); the MSM pipelines use
    the affine 16-bit-packed layout of ops.msm2.pack_points instead."""
    n = p[0].shape[-1]
    C = int(np.prod(ops.f.coeff_shape))
    return jnp.concatenate([c.reshape(C, n) for c in p], axis=0)


def unpack_jac(ops: CurveOps, a):
    """Inverse of pack_jac: (3*C, n) -> (X, Y, Z) coefficient tuples."""
    C = int(np.prod(ops.f.coeff_shape))
    n = a.shape[-1]
    cs = ops.f.coeff_shape + (n,)
    return (
        a[:C].reshape(cs),
        a[C : 2 * C].reshape(cs),
        a[2 * C :].reshape(cs),
    )
