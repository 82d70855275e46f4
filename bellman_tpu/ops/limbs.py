"""Device (JAX/TPU) fixed-limb Montgomery field arithmetic.

TPU-first design of the arithmetic layer the reference delegates to the
`ff` crate (/root/reference/Cargo.toml:26-27; SURVEY.md L0). There is no
64-bit scalar unit on the TPU VPU, so field elements are vectors of
16-bit limbs stored in uint32 lanes: a 16x16->32-bit product is exact in
a uint32, and a lazy-carry CIOS Montgomery multiply accumulates entire
limb rows as vector ops, deferring carry propagation to one final pass.

Layout convention: an element batch is a uint32 array of shape
``(L, *batch)`` — limb axis FIRST (little-endian limbs), batch axes last
so the batch lands on TPU lanes and every op vectorizes on the VPU.

Overflow analysis for the lazy CIOS (per outer iteration each accumulator
gains at most 4*(2^16-1) from the lo/hi halves of a_i*b and m*p plus a
shifted-in carry): with L <= 24 outer iterations the accumulators stay
under 2^24 << 2^32, so uint32 lanes never overflow and carries are exact.

Everything here is shape-polymorphic pure-jnp; Pallas kernels for the
fused hot paths live alongside in this package and are cross-checked
against these ops, which in turn are cross-checked against the host
big-int oracle (bellman_tpu.algebra.field).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

W = 16                 # default limb width in bits (per-spec: FieldSpec.w)
MASK = (1 << W) - 1    # 0xffff


class FieldSpec:
    """Static (trace-time) description of a prime field in limb form.

    Montgomery constants: R = 2^(w*L) mod p, R2 = R^2 mod p, and
    ninv = -p^{-1} mod 2^w (the per-limb Montgomery factor).

    Limb width ``w`` is per-spec: w=16 packs tightest (u32 products are
    exact but must be split into lo/hi halves before accumulating);
    w<=13 admits the conv+REDC multiply (``mont_mul_conv``) where full
    u32 products accumulate directly — ~1.5x fewer VPU ops per multiply.
    ``nlimbs`` may exceed the minimum to align rows (e.g. 32 for Fq so
    coordinate slabs land on 8-row sublane boundaries).
    """

    def __init__(self, name: str, modulus: int, mul_unroll: int = 4,
                 w: int = W, nlimbs: int | None = None):
        self.name = name
        self.p = modulus
        self.w = w
        self.mask = (1 << w) - 1
        # One spare bit so intermediate values in [0, 2p) fit in L limbs
        self.L = nlimbs if nlimbs else -(-(modulus.bit_length() + 1) // w)
        assert (1 << (w * self.L)) > 2 * modulus
        self.mul_unroll = mul_unroll
        L = self.L
        self.R = (1 << (w * L)) % modulus
        self.R2 = (self.R * self.R) % modulus
        self.ninv = (-pow(modulus, -1, 1 << w)) % (1 << w)
        self.p_limbs = np.array(
            [(modulus >> (w * i)) & self.mask for i in range(L)],
            dtype=np.uint32,
        )
        # conv+REDC overflow bound: every accumulator limb gathers at
        # most L conv products + (#nonzero p limbs) REDC products, each
        # < 2^(2w), plus one carry (< 2^(32-w)) — must fit in u32
        self.p_nz = int(np.max(np.nonzero(self.p_limbs)[0])) + 1 \
            if modulus > 0 else 0
        self.conv_ok = (
            (L + self.p_nz) * ((1 << w) - 1) ** 2 + (1 << (32 - w))
            < (1 << 32)
        )
        # Montgomery forms of 0/1 as numpy columns (L, 1)
        self.zero_limbs = np.zeros((L, 1), dtype=np.uint32)
        self.one_mont = self.to_limbs([self.R % modulus])
        self.mont_inv_exp = modulus - 2  # for Fermat inversion

    # -- host <-> limb conversion (numpy, not traced) -----------------------
    def to_limbs(self, ints) -> np.ndarray:
        """Python ints -> (L, n) uint32 limb array (plain, NOT Montgomery)."""
        p, w, mask = self.p, self.w, self.mask
        if w == 16:
            nbytes = self.L * 2
            buf = b"".join(
                (int(v) % p).to_bytes(nbytes, "little") for v in ints
            )
            n = len(buf) // nbytes
            return (
                np.frombuffer(buf, dtype="<u2")
                .reshape(n, self.L)
                .T.astype(np.uint32)
            )
        out = np.empty((self.L, len(ints)), dtype=np.uint32)
        for j, v in enumerate(ints):
            v = int(v) % p
            for i in range(self.L):
                out[i, j] = (v >> (w * i)) & mask
        return out

    def from_limbs(self, arr) -> list[int]:
        """(L, n) limb array -> list of Python ints (plain form)."""
        arr = np.asarray(jax.device_get(arr))
        flat = arr.reshape(self.L, -1)
        n = flat.shape[1]
        w = self.w
        if w == 16:
            buf = flat.T.astype("<u2").tobytes()
            nbytes = self.L * 2
            return [
                int.from_bytes(buf[j * nbytes : (j + 1) * nbytes], "little")
                for j in range(n)
            ]
        return [
            sum(int(flat[i, j]) << (w * i) for i in range(self.L))
            for j in range(n)
        ]

    def to_mont_host(self, ints) -> np.ndarray:
        """ints -> Montgomery-form limb array, conversion done on host."""
        r = self.R
        return self.to_limbs([(int(v) * r) % self.p for v in ints])

    def from_mont_host(self, arr) -> list[int]:
        rinv = pow(self.R, -1, self.p)
        return [(v * rinv) % self.p for v in self.from_limbs(arr)]

    def __repr__(self):
        return f"FieldSpec({self.name}, L={self.L})"


# ---------------------------------------------------------------------------
# Carry handling
# ---------------------------------------------------------------------------


def _propagate(t, w: int = W):
    """Full carry propagation along the limb axis (axis 0).

    Input limbs may hold up to 32-bit accumulators; output limbs < 2^w.
    Returns an array of the same shape; the final carry out of the top
    limb is dropped (callers guarantee it is zero).
    """
    mask = jnp.uint32((1 << w) - 1)

    def body(carry, tj):
        cur = tj + carry
        return cur >> w, cur & mask

    carry0 = jnp.zeros(t.shape[1:], dtype=jnp.uint32)
    _, out = jax.lax.scan(body, carry0, t)
    return out


def _propagate_unrolled(t, w: int = W):
    """Carry propagation with a static Python loop (Pallas-lowerable)."""
    L = t.shape[0]
    mask = jnp.uint32((1 << w) - 1)
    outs = []
    carry = jnp.zeros(t.shape[1:], dtype=jnp.uint32)
    for j in range(L):
        cur = t[j] + carry
        outs.append(cur & mask)
        carry = cur >> w
    return jnp.stack(outs)


def _cond_sub_p_unrolled(spec: FieldSpec, t, p):
    w = spec.w
    p32 = p.reshape(spec.L).astype(jnp.int32)
    borrow = jnp.zeros(t.shape[1:], dtype=jnp.int32)
    subs = []
    for j in range(spec.L):
        cur = t[j].astype(jnp.int32) - p32[j] - borrow
        neg = (cur < 0).astype(jnp.int32)
        subs.append((cur + (neg << w)).astype(jnp.uint32))
        borrow = neg
    sub = jnp.stack(subs)
    keep = borrow != 0
    return jnp.where(keep[None], t, sub)


def _cond_sub_p(spec: FieldSpec, t, p=None):
    """Conditionally subtract p: returns t mod p given t in [0, 2p).

    t: (L, *batch) with limbs < 2^W. ``p`` may be passed explicitly
    (Pallas kernels thread it as an input ref to avoid constant capture).
    """
    if p is None:
        p = spec.p_limbs.astype(np.int32)  # numpy: inlined as a literal
    else:
        p = p.reshape(spec.L).astype(jnp.int32)

    w = spec.w

    def body(borrow, args):
        tj, pj = args
        cur = tj.astype(jnp.int32) - pj - borrow
        neg = (cur < 0).astype(jnp.int32)
        return neg, (cur + (neg << w)).astype(jnp.uint32)

    borrow0 = jnp.zeros(t.shape[1:], dtype=jnp.int32)
    pb = jnp.broadcast_to(p.reshape((spec.L,) + (1,) * (t.ndim - 1)), t.shape)
    borrow, sub = jax.lax.scan(body, borrow0, (t, pb))
    keep = (borrow != 0)  # t < p -> keep t
    return jnp.where(keep[None], t, sub)


# ---------------------------------------------------------------------------
# Core ops (all Montgomery-form unless noted)
# ---------------------------------------------------------------------------


def add_r(spec: FieldSpec, a, b, p=None):
    """a + b mod p. Limbs < 2^w in, < 2^w out."""
    s = _propagate(a + b, spec.w)
    return _cond_sub_p(spec, s, p)


def sub_r(spec: FieldSpec, a, b, p=None):
    """a - b mod p."""
    pi = p
    p = (
        spec.p_limbs.astype(np.int32)
        if pi is None
        else pi.reshape(spec.L).astype(jnp.int32)
    )
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    pb = jnp.broadcast_to(p.reshape((spec.L,) + (1,) * (len(shape) - 1)), shape)

    w, mask = spec.w, spec.mask

    def body(carry, args):
        aj, bj, pj = args
        cur = aj.astype(jnp.int32) + pj - bj.astype(jnp.int32) + carry
        out = cur & mask
        return cur >> w, out.astype(jnp.uint32)

    carry0 = jnp.zeros(shape[1:], dtype=jnp.int32)
    _, out = jax.lax.scan(body, carry0, (a, b, pb))
    return _cond_sub_p(spec, out, pi)


def neg_r(spec: FieldSpec, a):
    """-a mod p."""
    zero = jnp.zeros_like(a)
    return sub_r(spec, zero, a)


def double_r(spec: FieldSpec, a):
    return add_r(spec, a, a)


def mont_mul_kernel(spec: FieldSpec, a, b, p=None):
    """mont_mul with static loops only: flat vector ops XLA can fuse
    (the lax.scan variant runs ~50 sequential while-iterations per mul,
    whose loop overhead dominates on TPU) and the only form Mosaic can
    lower inside Pallas kernels. Dispatches to the conv+REDC form when
    the limb width admits it (spec.conv_ok) — ~1.5x fewer VPU ops."""
    if spec.conv_ok:
        return mont_mul_conv(spec, a, b, p)
    L, w, mask = spec.L, spec.w, spec.mask
    if p is None:
        p = spec.p_limbs.reshape(L, 1)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (L,) + batch)
    ninv = jnp.uint32(spec.ninv)
    pu = p.reshape((L,) + (1,) * len(batch)).astype(jnp.uint32)
    # static slice+concat instead of scatter-add (Mosaic has no scatter)
    t = jnp.zeros((L + 2,) + batch, dtype=jnp.uint32)

    def acc(t, vec):
        lo = t[:L] + (vec & mask)
        mid = jnp.concatenate([lo[1:], t[L : L + 1]], axis=0) + (vec >> w)
        return jnp.concatenate([lo[:1], mid, t[L + 1 :]], axis=0)

    for i in range(L):
        t = acc(t, a[i][None] * b)
        m = (t[0] * ninv) & mask
        t = acc(t, m[None] * pu)
        carry = t[0] >> w
        head = (t[1] + carry)[None]
        t = jnp.concatenate(
            [head, t[2:], jnp.zeros((1,) + batch, dtype=jnp.uint32)], axis=0
        )
    t = _propagate_unrolled(t, w)[:L]
    return _cond_sub_p_unrolled(spec, t, p)


def _mont_mul_conv_raw(spec: FieldSpec, a, b, p=None):
    """conv+REDC body shared by the canonical and lazy variants: returns
    carry-propagated limbs in [0, 2p) (REDC bound 4p²/R + p < 2p, valid
    for inputs in [0, 2p) — the conv_ok accumulator bound is per-limb
    and range-independent)."""
    assert spec.conv_ok, spec
    L, w, mask = spec.L, spec.w, spec.mask
    nz = spec.p_nz
    if p is None:
        p_host = spec.p_limbs  # numpy: inlined as literals
        pj = [jnp.uint32(int(p_host[j])) for j in range(nz)]
    else:
        pr = p.reshape(L)
        pj = [pr[j] for j in range(nz)]
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    av = [jnp.broadcast_to(a[i], batch) for i in range(L)]
    bv = [jnp.broadcast_to(b[i], batch) for i in range(L)]
    ninv = jnp.uint32(spec.ninv)

    # full product: t[k] = sum_{i+j=k} a_i * b_j (each < 2^2w, <= L terms)
    t = [None] * (2 * L)
    for i in range(L):
        for j in range(L):
            prod = av[i] * bv[j]
            k = i + j
            t[k] = prod if t[k] is None else t[k] + prod
    t[2 * L - 1] = jnp.zeros(batch, dtype=jnp.uint32)

    # limb-serial REDC: zero low limbs one at a time
    for i in range(L):
        m = (t[i] * ninv) & mask
        for j in range(nz):
            t[i + j] = t[i + j] + m * pj[j]
        t[i + 1] = t[i + 1] + (t[i] >> w)

    return _propagate_unrolled(jnp.stack(t[L:]), w)


def mont_mul_conv(spec: FieldSpec, a, b, p=None):
    """Montgomery product via full-product convolution + limb-serial
    REDC, for limb widths w <= 13 (spec.conv_ok).

    The w=16 CIOS must split every u32 product into lo/hi halves before
    accumulating (4 extra ops per product); with w <= 13 each product is
    < 2^26 and an accumulator limb gathers at most L conv products +
    p_nz REDC products + one shifted carry — all exact in u32 (asserted
    at spec construction). Ops per mul: L^2 products + L*(p_nz+5) REDC
    vs the CIOS ~L*(2L+8) w/ splitting: ~1.5x fewer for BLS12-381 Fq.
    Flat/unrolled: Mosaic-lowerable inside Pallas kernels."""
    out = _mont_mul_conv_raw(spec, a, b, p)
    if p is None:
        p = spec.p_limbs.reshape(spec.L, 1)
    return _cond_sub_p_unrolled(spec, out, p)


def mont_mul_conv_nsc(spec: FieldSpec, a, b, p=None):
    """Lazy conv+REDC multiply: output in [0, 2p), no trailing cond-sub
    (for [0, 2p)-representation chains, ops/pallas_affine.py)."""
    return _mont_mul_conv_raw(spec, a, b, p)


def sub_kernel(spec: FieldSpec, a, b, p=None):
    """sub with static loops only (flat/fusable; Pallas-lowerable)."""
    if p is None:
        p = spec.p_limbs.reshape(spec.L, 1)
    p32 = p.reshape(spec.L).astype(jnp.int32)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    carry = jnp.zeros(shape[1:], dtype=jnp.int32)
    outs = []
    for j in range(spec.L):
        cur = a[j].astype(jnp.int32) + p32[j] - b[j].astype(jnp.int32) + carry
        outs.append((cur & spec.mask).astype(jnp.uint32))
        carry = cur >> spec.w
    return _cond_sub_p_unrolled(spec, jnp.stack(outs), p)


def add_kernel(spec: FieldSpec, a, b, p=None):
    if p is None:
        p = spec.p_limbs.reshape(spec.L, 1)
    return _cond_sub_p_unrolled(spec, _propagate_unrolled(a + b, spec.w), p)


def neg_kernel(spec: FieldSpec, a, p=None):
    return sub_kernel(spec, jnp.zeros_like(a), a, p)


def mont_mul_r(spec: FieldSpec, a, b, p=None):
    """Montgomery product a*b*R^-1 mod p via lazy-carry CIOS.

    a, b: (L, *batch) uint32 Montgomery-form arrays (broadcastable batch).
    """
    L = spec.L
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    b = jnp.broadcast_to(b, (L,) + batch)
    ninv = jnp.uint32(spec.ninv)
    pw = p
    p = (
        spec.p_limbs.reshape((L,) + (1,) * len(batch))  # numpy literal
        if pw is None
        else pw.reshape((L,) + (1,) * len(batch)).astype(jnp.uint32)
    )

    w, mask = spec.w, spec.mask

    def body(t, ai):
        # ai: (*a_batch,) broadcasts against b's batch
        prod = ai[None] * b                       # (L, *batch), exact u32
        t = t.at[:L].add(prod & mask)
        t = t.at[1 : L + 1].add(prod >> w)
        m = (t[0] * ninv) & mask                  # (*batch,)
        mp = m[None] * p                          # (L, *batch)
        t = t.at[:L].add(mp & mask)
        t = t.at[1 : L + 1].add(mp >> w)
        carry = t[0] >> w                         # low w bits are zero
        t = jnp.concatenate(
            [t[1:], jnp.zeros((1,) + batch, dtype=jnp.uint32)], axis=0
        )
        t = t.at[0].add(carry)
        return t, None

    t0 = jnp.zeros((L + 2,) + batch, dtype=jnp.uint32)
    t, _ = jax.lax.scan(body, t0, a, unroll=spec.mul_unroll)
    t = _propagate(t, spec.w)[:L]  # value < 2p < 2^(w*L): top limbs vanish
    return _cond_sub_p(spec, t, pw)


def square_r(spec: FieldSpec, a):
    return mont_mul_r(spec, a, a)


def to_mont_r(spec: FieldSpec, a):
    """Plain limbs -> Montgomery form (device)."""
    r2 = jnp.asarray(
        spec.to_limbs([spec.R2]).reshape((spec.L,) + (1,) * (a.ndim - 1))
    )
    return mont_mul_r(spec, a, r2)


def from_mont_r(spec: FieldSpec, a):
    """Montgomery form -> plain limbs (device): multiply by 1."""
    one = jnp.zeros_like(a)
    one = one.at[0].set(jnp.uint32(1))
    return mont_mul_r(spec, a, one)


def is_zero(spec: FieldSpec, a):
    """(*batch,) bool mask."""
    return jnp.all(a == 0, axis=0)


def select(mask, a, b):
    """where(mask, a, b) with mask of batch shape broadcast over limbs."""
    return jnp.where(mask[None], a, b)


def pow_bits_r(spec: FieldSpec, x, bits):
    """x^e where e's bits (MSB first) are a device uint32 array.

    x in Montgomery form; returns Montgomery form.
    """
    one = jnp.asarray(
        spec.one_mont.reshape((spec.L,) + (1,) * (x.ndim - 1))
    )
    acc0 = jnp.broadcast_to(one, x.shape)

    def body(acc, bit):
        acc = mont_mul_r(spec, acc, acc)
        acc_m = mont_mul_r(spec, acc, x)
        return select(bit != 0, acc_m, acc), None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def exp_bits_host(e: int) -> np.ndarray:
    """MSB-first bit array of a host integer, for pow_bits."""
    n = max(e.bit_length(), 1)
    return np.array([(e >> (n - 1 - i)) & 1 for i in range(n)], dtype=np.uint32)


def inv_r(spec: FieldSpec, x):
    """Fermat inversion x^(p-2); 0 maps to 0. Montgomery in/out."""
    bits = jnp.asarray(exp_bits_host(spec.mont_inv_exp))
    return pow_bits_r(spec, x, bits)


def batch_inv_r(spec: FieldSpec, x):
    """Montgomery-trick batch inversion along the LAST axis.

    x: (L, n) Montgomery form, entries may be zero (zero -> zero, like
    the reference's batch_normalize contract for non-identity inputs).
    Cost: 2 scans of muls + ONE Fermat inversion.
    """
    zero_mask = is_zero(spec, x)                       # (n,)
    one = jnp.asarray(spec.one_mont)                   # (L, 1)
    safe = jnp.where(zero_mask[None], jnp.broadcast_to(one, x.shape), x)

    # prefix products P_i = x_0 * ... * x_i  (inclusive scan along axis -1)
    prods = jax.lax.associative_scan(
        lambda u, v: mont_mul_r(spec, u, v), safe, axis=safe.ndim - 1
    )
    total_inv = inv_r(spec, prods[..., -1:])           # (L, 1)

    # suffix walk: inv_i = total_inv * P_{i-1}; total_inv *= x_i — done
    # branch-free: inv_i = inv(P_i) * P_{i-1}
    inv_prods = jax.lax.associative_scan(
        lambda u, v: mont_mul_r(spec, u, v),
        jnp.flip(
            jnp.concatenate([safe[..., 1:], jnp.broadcast_to(one, safe[..., :1].shape)], axis=-1),
            axis=-1,
        ),
        axis=safe.ndim - 1,
    )
    inv_prods = jnp.flip(inv_prods, axis=-1)           # suffix products S_i = x_{i+1}..x_{n-1}
    shifted_prefix = jnp.concatenate(
        [jnp.broadcast_to(one, safe[..., :1].shape), prods[..., :-1]], axis=-1
    )
    out = mont_mul_r(spec, mont_mul_r(spec, total_inv, shifted_prefix), inv_prods)
    return jnp.where(zero_mask[None], jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# Hot-path dispatch: the unrolled (flat) variants fuse into few kernels on
# TPU, where the scan variants pay ~50 while-loop iterations of launch
# overhead per field op; but XLA's CPU backend compiles the flat graphs
# pathologically slowly, so CPU (the test mesh) keeps the scan forms.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=1)
def _unrolled_backend() -> bool:
    # Opt-in: the flat graphs compile slowly through the axon remote-
    # compile tunnel too; until the Pallas MSM kernel lands, the scan
    # forms are the default everywhere. BELLMAN_TPU_UNROLLED=1 enables
    # the flat forms (worthwhile when one compile amortizes many runs).
    import os

    if os.environ.get("BELLMAN_TPU_UNROLLED"):
        return True
    return False


def mont_mul_hot(spec: FieldSpec, a, b):
    if _unrolled_backend():
        return mont_mul_kernel(spec, a, b)
    return mont_mul_r(spec, a, b)


def add_hot(spec: FieldSpec, a, b):
    if _unrolled_backend():
        return add_kernel(spec, a, b)
    return add_r(spec, a, b)


def sub_hot(spec: FieldSpec, a, b):
    if _unrolled_backend():
        return sub_kernel(spec, a, b)
    return sub_r(spec, a, b)


def neg_hot(spec: FieldSpec, a):
    if _unrolled_backend():
        return neg_kernel(spec, a)
    return neg_r(spec, a)


# ---------------------------------------------------------------------------
# Public jitted entry points. The *_r raw functions above are for use
# INSIDE already-traced code (tracing a plain function is cheap; tracing
# thousands of nested pjit calls is not). These wrappers are for eager
# host-driven use: jitted and shape-cached.
# ---------------------------------------------------------------------------

add = jax.jit(add_r, static_argnums=0)
sub = jax.jit(sub_r, static_argnums=0)
neg = jax.jit(neg_r, static_argnums=0)
double = jax.jit(double_r, static_argnums=0)
mont_mul = jax.jit(mont_mul_r, static_argnums=0)
square = jax.jit(square_r, static_argnums=0)
to_mont = jax.jit(to_mont_r, static_argnums=0)
from_mont = jax.jit(from_mont_r, static_argnums=0)
pow_bits = jax.jit(pow_bits_r, static_argnums=0)
inv = jax.jit(inv_r, static_argnums=0)
batch_inv = jax.jit(batch_inv_r, static_argnums=0)


# ---------------------------------------------------------------------------
# FieldOps: an object bundle so curve code is generic over Fq vs Fq2
# ---------------------------------------------------------------------------


class FieldOps:
    """Base-field ops bundle. Elements: (L, *batch) uint32."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.coeff_shape = (spec.L,)

    def add(self, a, b):
        return add_hot(self.spec, a, b)

    def sub(self, a, b):
        return sub_hot(self.spec, a, b)

    def neg(self, a):
        return neg_hot(self.spec, a)

    def mul(self, a, b):
        return mont_mul_hot(self.spec, a, b)

    def sqr(self, a):
        return mont_mul_hot(self.spec, a, a)

    def is_zero(self, a):
        return is_zero(self.spec, a)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def zeros(self, batch):
        return jnp.zeros(self.coeff_shape + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        one = jnp.asarray(
            self.spec.one_mont.reshape(self.coeff_shape + (1,) * len(batch))
        )
        return jnp.broadcast_to(one, self.coeff_shape + tuple(batch))

    # host conversions: ints are base-field ints
    def to_mont_host(self, vals):
        return self.spec.to_mont_host(vals)

    def from_mont_host(self, arr):
        return self.spec.from_mont_host(arr)


class Fq2Ops(FieldOps):
    """Quadratic extension Fq[u]/(u^2+1). Elements: (2, L, *batch)."""

    def __init__(self, spec: FieldSpec):
        super().__init__(spec)
        self.coeff_shape = (2, spec.L)

    def add(self, a, b):
        s = self.spec
        return jnp.stack([add_hot(s, a[0], b[0]), add_hot(s, a[1], b[1])])

    def sub(self, a, b):
        s = self.spec
        return jnp.stack([sub_hot(s, a[0], b[0]), sub_hot(s, a[1], b[1])])

    def neg(self, a):
        s = self.spec
        return jnp.stack([neg_hot(s, a[0]), neg_hot(s, a[1])])

    def mul(self, a, b):
        # Karatsuba: (a0b0 - a1b1, (a0+a1)(b0+b1) - a0b0 - a1b1)
        s = self.spec
        t0 = mont_mul_hot(s, a[0], b[0])
        t1 = mont_mul_hot(s, a[1], b[1])
        t2 = mont_mul_hot(s, add_hot(s, a[0], a[1]), add_hot(s, b[0], b[1]))
        c0 = sub_hot(s, t0, t1)
        c1 = sub_hot(s, sub_hot(s, t2, t0), t1)
        return jnp.stack([c0, c1])

    def sqr(self, a):
        # (a0+a1)(a0-a1), 2 a0 a1
        s = self.spec
        t0 = mont_mul_hot(s, add_hot(s, a[0], a[1]), sub_hot(s, a[0], a[1]))
        t1 = mont_mul_hot(s, a[0], a[1])
        return jnp.stack([t0, add_hot(s, t1, t1)])

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(0, 1))

    def select(self, mask, a, b):
        return jnp.where(mask[None, None], a, b)

    def zeros(self, batch):
        return jnp.zeros((2, self.spec.L) + tuple(batch), dtype=jnp.uint32)

    def one(self, batch):
        s = self.spec
        c0 = jnp.asarray(s.one_mont.reshape((s.L,) + (1,) * len(batch)))
        c0 = jnp.broadcast_to(c0, (s.L,) + tuple(batch))
        c1 = jnp.zeros_like(c0)
        return jnp.stack([c0, c1])

    # host conversions take/return pairs (c0, c1)
    def to_mont_host(self, vals):
        c0 = self.spec.to_mont_host([v[0] for v in vals])
        c1 = self.spec.to_mont_host([v[1] for v in vals])
        return np.stack([c0, c1])

    def from_mont_host(self, arr):
        arr = np.asarray(jax.device_get(arr))
        c0 = self.spec.from_mont_host(arr[0])
        c1 = self.spec.from_mont_host(arr[1])
        return list(zip(c0, c1))


# ---------------------------------------------------------------------------
# Shared field specs
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def spec_for(name: str) -> FieldSpec:
    from ..algebra import bls12_381 as bls

    if name == "bls_fr":
        return FieldSpec("bls_fr", bls.R)
    if name == "bls_fq":
        # w=13, L=32: the conv+REDC multiply (mont_mul_conv) applies —
        # full u32 products accumulate without lo/hi splitting (~1.5x
        # fewer VPU ops than w=16 CIOS) — and 32 limb rows align every
        # coordinate slab to the 8-row sublane boundary. R = 2^416
        # leaves 34 spare bits over p, so lazy [0, kp) chains are safe.
        return FieldSpec("bls_fq", bls.P, w=13, nlimbs=32)
    if name == "bls_fq16":
        return FieldSpec("bls_fq16", bls.P)
    if name == "dummy":
        return FieldSpec("dummy", 64513)
    raise KeyError(name)
