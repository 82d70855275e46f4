"""Pallas TPU kernels: batch-affine MSM accumulate rounds.

The Jacobian mixed add (ops/pallas_madd.py) costs ~17 field muls per
lane. With an AFFINE accumulator and a batched inversion the unified
affine add/double costs ~6 muls plus ~2 for the shared-inverse tree:

  round r, lane l:  acc_l += P_(l,r)   via   λ = num / den,
     den = x2-x1 (add) | 2*y1 (double) | 1 (degenerate lanes)
     num = y2-y1 (add) | 3*x1^2 (double)
     x3 = λ² - x1 - x2 ;  y3 = λ(x1-x3) - y1

The divisions are batched Montgomery-trick style with a fold-in-half
product tree per lane block (K1), one parallel Fermat inversion of the
block roots (K2, width = #blocks — same wall time as width 1), and the
down-sweep + point math (K3). All field muls run LAZY (no trailing
conditional subtraction; values live in [0, 2p), zero tests compare
against both 0 and p) — the CIOS output bound 4p²/R + p < 2p makes the
representation stable. See /root/reference/src/multiexp.rs:242-265 for
the serial scatter this replaces.

Accumulator layout (RAFF, W) u32: rows [0,C) x, [C,2C) y, row 2C a
nonempty flag. Addend layout matches ops/pallas_madd.py: x, y rows plus
an aux block (row 0 valid, row 1 sign).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs
from .curve import CurveOps
from .kernel_ops import _kernel_curve_ops, _C
from .pallas_madd import TILE, _pad8, rows_add


def rows_aff(ops: CurveOps) -> int:
    return _pad8(2 * _C(ops) + 1)


def _raw_limbs(spec, v: int) -> np.ndarray:
    """Unreduced little-endian limbs of v (to_limbs reduces mod p)."""
    return np.array(
        [(v >> (spec.w * i)) & spec.mask for i in range(spec.L)],
        dtype=np.uint32,
    ).reshape(spec.L, 1)


# ---------------------------------------------------------------------------
# Lazy field ops: [0, 2p) representation
# ---------------------------------------------------------------------------


def mont_mul_nsc(spec, a, b, p):
    """Montgomery multiply WITHOUT the trailing cond-sub.

    Inputs/outputs in [0, 2p). Dispatches to the conv+REDC form when
    the limb width admits it (w <= 13: ~2.4x fewer VPU ops at L=32
    than the lo/hi-splitting CIOS); w=16 limbs take the CIOS loop."""
    if spec.conv_ok:
        return limbs.mont_mul_conv_nsc(spec, a, b, p)
    L = spec.L
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (L,) + batch)
    ninv = np.uint32(spec.ninv)
    pu = p.reshape((L,) + (1,) * len(batch)).astype(jnp.uint32)
    t = jnp.zeros((L + 2,) + batch, dtype=jnp.uint32)

    def acc(t, vec):
        lo = t[:L] + (vec & spec.mask)
        mid = jnp.concatenate([lo[1:], t[L : L + 1]], axis=0) + (vec >> spec.w)
        return jnp.concatenate([lo[:1], mid, t[L + 1 :]], axis=0)

    for i in range(L):
        t = acc(t, a[i][None] * b)
        m = (t[0] * ninv) & spec.mask
        t = acc(t, m[None] * pu)
        carry = t[0] >> spec.w
        head = (t[1] + carry)[None]
        t = jnp.concatenate(
            [head, t[2:], jnp.zeros((1,) + batch, dtype=jnp.uint32)], axis=0
        )
    return limbs._propagate_unrolled(t, spec.w)[:L]


class _LazyFieldOps:
    """Field ops on [0, 2p): muls skip the cond-sub; add/sub reduce
    against 2p (one cond-sub keeps the range stable)."""

    def __init__(self, spec, p, p2, one):
        self.spec = spec
        self.p = p      # (L, 1) canonical modulus
        self.p2 = p2    # (L, 1) 2p
        self.one_arr = one
        self.coeff_shape = (spec.L,)

    def add(self, a, b):
        return limbs.add_kernel(self.spec, a, b, self.p2)

    def sub(self, a, b):
        return limbs.sub_kernel(self.spec, a, b, self.p2)

    def neg(self, a):
        return limbs.sub_kernel(self.spec, jnp.zeros_like(a), a, self.p2)

    def mul(self, a, b):
        return mont_mul_nsc(self.spec, a, b, self.p)

    def sqr(self, a):
        return mont_mul_nsc(self.spec, a, a, self.p)

    def is_zero(self, a):
        """Zero mod p: representative 0 or p."""
        pz = self.p.reshape((self.spec.L,) + (1,) * (a.ndim - 1))
        return jnp.all(a == 0, axis=0) | jnp.all(a == pz, axis=0)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def zeros(self, batch):
        return jnp.zeros(self.coeff_shape + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        one = self.one_arr.reshape(self.coeff_shape + (1,) * len(batch))
        return jnp.broadcast_to(one, self.coeff_shape + tuple(batch))


class _LazyFq2Ops(_LazyFieldOps):
    def __init__(self, spec, p, p2, one):
        super().__init__(spec, p, p2, one)
        self.coeff_shape = (2, spec.L)

    def add(self, a, b):
        s = super()
        return jnp.stack([s.add(a[0], b[0]), s.add(a[1], b[1])])

    def sub(self, a, b):
        s = super()
        return jnp.stack([s.sub(a[0], b[0]), s.sub(a[1], b[1])])

    def neg(self, a):
        s = super()
        return jnp.stack([s.neg(a[0]), s.neg(a[1])])

    def mul(self, a, b):
        s = super()
        t0 = s.mul(a[0], b[0])
        t1 = s.mul(a[1], b[1])
        t2 = s.mul(s.add(a[0], a[1]), s.add(b[0], b[1]))
        return jnp.stack([s.sub(t0, t1), s.sub(s.sub(t2, t0), t1)])

    def sqr(self, a):
        s = super()
        t0 = s.mul(s.add(a[0], a[1]), s.sub(a[0], a[1]))
        t1 = s.mul(a[0], a[1])
        return jnp.stack([t0, s.add(t1, t1)])

    def is_zero(self, a):
        s = super()
        return s.is_zero(a[0]) & s.is_zero(a[1])

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def zeros(self, batch):
        return jnp.zeros((2, self.spec.L) + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        s = self.spec
        c0 = self.one_arr.reshape((s.L,) + (1,) * len(batch))
        c0 = jnp.broadcast_to(c0, (s.L,) + tuple(batch))
        return jnp.stack([c0, jnp.zeros_like(c0)])


def _lazy_ops(ops: CurveOps, p, p2, one):
    spec = ops.f.spec
    if len(ops.f.coeff_shape) == 1:
        return _LazyFieldOps(spec, p, p2, one)
    return _LazyFq2Ops(spec, p, p2, one)


# ---------------------------------------------------------------------------
# Case analysis shared by K1 and K3
# ---------------------------------------------------------------------------


def _cases(f, x1, y1, nonempty, x2, y2, valid, sign):
    """Per-lane case masks and the batched denominator.

    Returns (y2s, dx, dy, normal, dbl, cancel, fresh, keep, den)."""
    y2s = f.select(sign != 0, f.neg(y2), y2)
    dx = f.sub(x2, x1)
    dy = f.sub(y2s, y1)
    eqx = f.is_zero(dx)
    eqy = f.is_zero(dy)
    v = valid != 0
    ne = nonempty != 0
    normal = v & ne & ~eqx
    dbl = v & ne & eqx & eqy
    cancel = v & ne & eqx & ~eqy
    fresh = v & ~ne            # first point into this lane
    keep = ~v
    batch = valid.shape
    den = f.select(normal, dx, f.select(dbl, f.add(y1, y1), f.one(batch)))
    return y2s, dx, dy, normal, dbl, cancel, fresh, keep, den


def _split_acc(f, C, a, T):
    cs = f.coeff_shape
    x1 = a[:C].reshape(cs + (T,))
    y1 = a[C : 2 * C].reshape(cs + (T,))
    nonempty = a[2 * C]
    return x1, y1, nonempty


def _split_add(f, C, d, T):
    cs = f.coeff_shape
    x2 = d[:C].reshape(cs + (T,))
    y2 = d[C : 2 * C].reshape(cs + (T,))
    valid = d[_pad8(2 * C)]
    sign = d[_pad8(2 * C) + 1]
    return x2, y2, valid, sign


# ---------------------------------------------------------------------------
# K1: cases + per-block fold product tree
#
# Mosaic constraint: every vector op must stay >= 128 lanes wide and all
# tree-slab offsets 128-aligned (narrower slices produce layouts the
# compiler cannot concatenate — "result/input offset mismatch"). So the
# fold-in-half up-sweep stops at the SEMI=128-wide level; the remaining
# 128 -> 1 product (and the all-but-self products needed for the
# down-sweep) run as an in-register XOR-butterfly of roll-muls over
# those 128 lanes.
# ---------------------------------------------------------------------------

SEMI = TILE // 16          # 128: the narrowest stored tree level
# stored level widths (lvl1 = TILE//2 is cheap to recompute in K3 and is
# not stored); per-block slab offsets within the (C, TILE) tree block
_STORED = [TILE // 4, TILE // 8, SEMI]           # 512, 256, 128
_O2 = 0
_O3 = _O2 + _STORED[0]
_O4 = _O3 + _STORED[1]
_OAB = _O4 + _STORED[2]    # all-but-self products of the SEMI level
_OROOT = _OAB + SEMI       # block root, replicated across SEMI lanes
assert all(o % 128 == 0 for o in (_O2, _O3, _O4, _OAB, _OROOT))
assert _OROOT + SEMI <= TILE


def _semi_butterfly(f, x):
    """XOR-butterfly over a SEMI-wide vector: returns (root_rep, allbut)
    where root_rep[i] = prod(x) and allbut[i] = prod_{j != i} x[j].

    allbut[i] = prod_s x_s[i ^ 2^s]: at step s the partner lane holds
    the product of the whole opposite 2^s-subtree."""

    def partner(v, s):
        d = 1 << s
        # masks built in-kernel (Pallas forbids captured constants)
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, SEMI), 1)
        bit = ((ii >> s) & 1) != 0
        bitb = bit.reshape((1,) * (v.ndim - 1) + (SEMI,))
        return jnp.where(
            bitb,
            pltpu.roll(v, d, axis=v.ndim - 1),
            pltpu.roll(v, SEMI - d, axis=v.ndim - 1),
        )

    allbut = None
    cur = x
    for s in range(7):  # log2(SEMI)
        p = partner(cur, s)
        allbut = p if allbut is None else f.mul(allbut, p)
        cur = f.mul(cur, p)
    return cur, allbut


@functools.partial(jax.jit, static_argnums=(0, 3))
def ba_tree_up(ops: CurveOps, acc, addend, interpret: bool = False):
    """Per block: denominator leaves + fold product tree + semi butterfly.

    Returns tree (C, W): per block
    [lvl2 (T/4) | lvl3 (T/8) | semi (SEMI) | allbut (SEMI) |
     root_rep (SEMI) | zeros]. lvl1 is recomputed in ba_apply."""
    spec = ops.f.spec
    C = _C(ops)
    RAFF = rows_aff(ops)
    RD = rows_add(ops)
    W = acc.shape[-1]
    nb = W // TILE
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    p2_arr = jnp.asarray(_raw_limbs(spec, 2 * spec.p))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))

    def kernel(p_ref, p2_ref, one_ref, acc_ref, add_ref, tree_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], one_ref[:])
        x1, y1, nonempty = _split_acc(f, C, acc_ref[:], TILE)
        x2, y2, valid, sign = _split_add(f, C, add_ref[:], TILE)
        _, _, _, _, _, _, _, _, den = _cases(
            f, x1, y1, nonempty, x2, y2, valid, sign
        )
        cs = ops.f.coeff_shape

        def fold(v):
            w = v.shape[-1] // 2
            ax = v.ndim - 1
            return f.mul(
                jax.lax.slice_in_dim(v, 0, w, axis=ax),
                jax.lax.slice_in_dim(v, w, 2 * w, axis=ax),
            )

        lvl1 = fold(den)               # TILE/2, not stored
        lvl2 = fold(lvl1)
        tree_ref[:, _O2:_O3] = lvl2.reshape(C, _STORED[0])
        lvl3 = fold(lvl2)
        tree_ref[:, _O3:_O4] = lvl3.reshape(C, _STORED[1])
        semi = fold(lvl3)
        tree_ref[:, _O4:_OAB] = semi.reshape(C, SEMI)
        root_rep, allbut = _semi_butterfly(f, semi)
        tree_ref[:, _OAB:_OROOT] = allbut.reshape(C, SEMI)
        tree_ref[:, _OROOT:_OROOT + SEMI] = root_rep.reshape(C, SEMI)
        pad = TILE - (_OROOT + SEMI)
        if pad:
            tree_ref[:, _OROOT + SEMI:] = jnp.zeros((C, pad), jnp.uint32)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, W), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RAFF, TILE), lambda i: (0, i)),
            pl.BlockSpec((RD, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((C, TILE), lambda i: (0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, one_arr, acc, addend)


def ba_roots(ops: CurveOps, tree):
    """Block roots (C, nb) from the packed tree."""
    C = tree.shape[0]
    W = tree.shape[-1]
    nb = W // TILE
    return tree.reshape(C, nb, TILE)[:, :, _OROOT]


def ba_semi_allbut(ops: CurveOps, tree):
    """All-but-self products of the SEMI level, flattened (C, nb*SEMI)."""
    C = tree.shape[0]
    W = tree.shape[-1]
    nb = W // TILE
    return tree.reshape(C, nb, TILE)[:, :, _OAB:_OROOT].reshape(
        C, nb * SEMI
    )


# ---------------------------------------------------------------------------
# K2: invert the block roots (parallel Fermat; Fq2 via conj/norm)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 2))
def ba_invert_roots(ops: CurveOps, roots, interpret: bool = False):
    """roots (C, nb) -> inverses (C, nb), lazy representation."""
    spec = ops.f.spec
    C = _C(ops)
    nb = roots.shape[-1]
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))
    ebits = limbs.exp_bits_host(spec.p - 2)  # MSB first
    nbits = len(ebits)
    bits = jnp.asarray(ebits.reshape(1, nbits))  # (1, nbits) in SMEM

    def kernel(bits_ref, p_ref, one_ref, r_ref, o_ref):
        p = p_ref[:]
        spec_ = spec

        def fq_pow(base):
            def body(i, acc):
                b = bits_ref[0, i]
                acc = limbs.mont_mul_kernel(spec_, acc, acc, p)
                am = limbs.mont_mul_kernel(spec_, acc, base, p)
                return jnp.where(b != 0, am, acc)

            acc0 = jnp.broadcast_to(
                one_ref[:].reshape((spec_.L, 1)), base.shape
            )
            return jax.lax.fori_loop(0, nbits, body, acc0)

        if len(ops.f.coeff_shape) == 1:
            o_ref[:] = fq_pow(r_ref[:])
        else:
            # Fq2: x^-1 = conj(x) / norm(x), norm = a0^2 + a1^2 in Fq
            x = r_ref[:].reshape((2, spec_.L, nb))
            a0, a1 = x[0], x[1]
            n0 = limbs.mont_mul_kernel(spec_, a0, a0, p)
            n1 = limbs.mont_mul_kernel(spec_, a1, a1, p)
            norm = limbs.add_kernel(spec_, n0, n1, p)
            ninv = fq_pow(norm)
            c0 = limbs.mont_mul_kernel(spec_, a0, ninv, p)
            c1m = limbs.mont_mul_kernel(spec_, a1, ninv, p)
            c1 = limbs.sub_kernel(spec_, jnp.zeros_like(c1m), c1m, p)
            o_ref[:] = jnp.concatenate([c0, c1], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, nb), jnp.uint32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((spec.L, 1), lambda i, b: (0, 0)),
                pl.BlockSpec((spec.L, 1), lambda i, b: (0, 0)),
                pl.BlockSpec((C, nb), lambda i, b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, nb), lambda i, b: (0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(bits, p_arr, one_arr, roots)


# ---------------------------------------------------------------------------
# K2c: lazy elementwise Montgomery multiply (semi_inv = allbut * root_inv)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 3))
def mul_lazy(ops: CurveOps, a, b, interpret: bool = False):
    """Elementwise lazy Montgomery multiply, (C, M) coefficient slabs."""
    spec = ops.f.spec
    C, M = a.shape
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))

    T = min(M, TILE)
    assert M % T == 0
    grid = (M // T,)

    def kernel(p_ref, p2_ref, a_ref, b_ref, o_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], None)
        cs = ops.f.coeff_shape
        r = f.mul(
            a_ref[:].reshape(cs + (T,)), b_ref[:].reshape(cs + (T,))
        )
        o_ref[:] = r.reshape(C, T)

    p2_arr = jnp.asarray(_raw_limbs(spec, 2 * spec.p))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, M), jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
            pl.BlockSpec((C, T), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((C, T), lambda i: (0, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, a, b)


# ---------------------------------------------------------------------------
# K3: down-sweep + affine point update
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 5), donate_argnums=(1,))
def ba_apply(ops: CurveOps, acc, addend, tree, semi_inv,
             interpret: bool = False):
    """Down-sweep the SEMI-level inverses through the stored wide levels,
    then the unified affine add/double with all special cases; writes the
    new acc. semi_inv: (C, nb*SEMI) inverses of the SEMI-level nodes."""
    spec = ops.f.spec
    C = _C(ops)
    RAFF = rows_aff(ops)
    RD = rows_add(ops)
    W = acc.shape[-1]
    nb = W // TILE
    p_arr = jnp.asarray(spec.p_limbs.reshape(spec.L, 1))
    p2_arr = jnp.asarray(_raw_limbs(spec, 2 * spec.p))
    one_arr = jnp.asarray(spec.one_mont.reshape(spec.L, 1))

    def kernel(p_ref, p2_ref, one_ref, acc_ref, add_ref, tree_ref, si_ref,
               o_ref):
        f = _lazy_ops(ops, p_ref[:], p2_ref[:], one_ref[:])
        cs = ops.f.coeff_shape
        x1, y1, nonempty = _split_acc(f, C, acc_ref[:], TILE)
        x2, y2, valid, sign = _split_add(f, C, add_ref[:], TILE)
        y2s, dx, dy, normal, dbl, cancel, fresh, keep, den = _cases(
            f, x1, y1, nonempty, x2, y2, valid, sign
        )

        def fold(v):
            w = v.shape[-1] // 2
            ax = v.ndim - 1
            return f.mul(
                jax.lax.slice_in_dim(v, 0, w, axis=ax),
                jax.lax.slice_in_dim(v, w, 2 * w, axis=ax),
            )

        def down(inv_parent, child):
            cw = child.shape[-1]
            ax = child.ndim - 1
            left = jax.lax.slice_in_dim(child, 0, cw // 2, axis=ax)
            right = jax.lax.slice_in_dim(child, cw // 2, cw, axis=ax)
            return jnp.concatenate(
                [f.mul(inv_parent, right), f.mul(inv_parent, left)],
                axis=ax,
            )

        lvl1 = fold(den)  # TILE/2 (not stored by K1)
        lvl2 = tree_ref[:, _O2:_O3].reshape(cs + (_STORED[0],))
        lvl3 = tree_ref[:, _O3:_O4].reshape(cs + (_STORED[1],))
        inv4 = si_ref[:].reshape(cs + (SEMI,))
        inv3 = down(inv4, lvl3)
        inv2 = down(inv3, lvl2)
        inv1 = down(inv2, lvl1)
        dinv = down(inv1, den)  # (cs, TILE): per-leaf denominator inverse

        xx = f.sqr(x1)
        three_xx = f.add(f.add(xx, xx), xx)
        num = f.select(dbl, three_xx, dy)
        lam = f.mul(num, dinv)
        x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
        y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)

        active = normal | dbl
        nx = f.select(active, x3, x1)
        ny = f.select(active, y3, y1)
        nx = f.select(fresh, x2, nx)
        ny = f.select(fresh, y2s, ny)
        nflag = jnp.where(
            cancel, jnp.uint32(0),
            jnp.where(fresh | active, jnp.uint32(1),
                      (nonempty != 0).astype(jnp.uint32)),
        )
        parts = [nx.reshape(C, TILE), ny.reshape(C, TILE), nflag[None]]
        pad = RAFF - 2 * C - 1
        if pad:
            parts.append(jnp.zeros((pad, TILE), jnp.uint32))
        o_ref[:] = jnp.concatenate(parts, axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((RAFF, W), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((spec.L, 1), lambda i: (0, 0)),
            pl.BlockSpec((RAFF, TILE), lambda i: (0, i)),
            pl.BlockSpec((RD, TILE), lambda i: (0, i)),
            pl.BlockSpec((C, TILE), lambda i: (0, i)),
            pl.BlockSpec((C, SEMI), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((RAFF, TILE), lambda i: (0, i)),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, p2_arr, one_arr, acc, addend, tree, semi_inv)


def affine_round(ops: CurveOps, acc, addend, interpret: bool = False):
    """One batch-affine accumulate round:
    K1 (cases + tree + semi butterfly) -> K2 (Fermat on block roots) ->
    K2c (semi inverses) -> K3 (down-sweep + point update)."""
    nb = acc.shape[-1] // TILE
    tree = ba_tree_up(ops, acc, addend, interpret)
    roots = ba_roots(ops, tree)
    invroots = ba_invert_roots(ops, roots, interpret)        # (C, nb)
    allbut = ba_semi_allbut(ops, tree)                       # (C, nb*SEMI)
    rep = jnp.broadcast_to(
        invroots[:, :, None], (invroots.shape[0], nb, SEMI)
    ).reshape(invroots.shape[0], nb * SEMI)
    semi_inv = mul_lazy(ops, allbut, rep, interpret)
    return ba_apply(ops, acc, addend, tree, semi_inv, interpret)


# ---------------------------------------------------------------------------
# jnp twin (CPU tests): same semantics via limbs.batch_inv
# ---------------------------------------------------------------------------


def _field_inv(f, x):
    """Single-element field inverse (Fermat; Fq2 via conj/norm)."""
    spec = f.spec
    if len(f.coeff_shape) == 1:
        return limbs.inv_r(spec, x)
    n0 = limbs.mont_mul_r(spec, x[0], x[0])
    n1 = limbs.mont_mul_r(spec, x[1], x[1])
    ninv = limbs.inv_r(spec, limbs.add_r(spec, n0, n1))
    c0 = limbs.mont_mul_r(spec, x[0], ninv)
    c1 = limbs.neg_r(spec, limbs.mont_mul_r(spec, x[1], ninv))
    return jnp.stack([c0, c1])


def tree_batch_inv(f, den):
    """Batch inversion via a fold-in-half product tree: ~3 muls/lane +
    one Fermat at the root. O(log W) traced muls (associative-scan-free:
    its per-level retracing is what makes batch_inv_r untraceable at
    MSM widths). den must have power-of-two width and no zeros."""
    levels = []
    cur = den
    while cur.shape[-1] > 1:
        w = cur.shape[-1] // 2
        levels.append(cur)
        cur = f.mul(cur[..., :w], cur[..., w:])
    inv_cur = _field_inv(f, cur)
    for child in reversed(levels):
        w = child.shape[-1] // 2
        inv_l = f.mul(inv_cur, child[..., w:])
        inv_r = f.mul(inv_cur, child[..., :w])
        inv_cur = jnp.concatenate([inv_l, inv_r], axis=child.ndim - 1)
    return inv_cur


def affine_round_jnp(ops: CurveOps, acc, addend):
    """Pure-jnp twin of affine_round (canonical representation)."""
    f = ops.f
    C = _C(ops)
    RAFF = rows_aff(ops)
    W = acc.shape[-1]
    x1, y1, nonempty = _split_acc(f, C, acc, W)
    x2, y2, valid, sign = _split_add(f, C, addend, W)
    y2s, dx, dy, normal, dbl, cancel, fresh, keep, den = _cases(
        f, x1, y1, nonempty, x2, y2, valid, sign
    )
    dinv = tree_batch_inv(f, den)
    xx = f.sqr(x1)
    three_xx = f.add(f.add(xx, xx), xx)
    num = f.select(dbl, three_xx, dy)
    lam = f.mul(num, dinv)
    x3 = f.sub(f.sub(f.sqr(lam), x1), x2)
    y3 = f.sub(f.mul(lam, f.sub(x1, x3)), y1)
    active = normal | dbl
    nx = f.select(active, x3, x1)
    ny = f.select(active, y3, y1)
    nx = f.select(fresh, x2, nx)
    ny = f.select(fresh, y2s, ny)
    nflag = jnp.where(
        cancel, jnp.uint32(0),
        jnp.where(fresh | active, jnp.uint32(1),
                  (nonempty != 0).astype(jnp.uint32)),
    )
    parts = [nx.reshape(C, W), ny.reshape(C, W), nflag[None]]
    pad = RAFF - 2 * C - 1
    if pad:
        parts.append(jnp.zeros((pad, W), jnp.uint32))
    return jnp.concatenate(parts, axis=0)
