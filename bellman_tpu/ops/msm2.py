"""Shared MSM machinery: digits, packing, schedule, window fold.

The components every Pippenger variant needs, re-designed for the TPU
from the reference's bucket method
(/root/reference/src/multiexp.rs:210-301):

* signed c-bit digits halve the bucket count (the wNAF idea of
  group::Wnaf, /root/reference/groth16/src/generator.rs:209-226):
  digits in [-2^(c-1), 2^(c-1)], negative digits negate y at gather;
* points are packed two 16-bit limbs per uint32 lane (PackedBases),
  halving every downstream gather's volume;
* the schedule: one global (window|digit) key sort + histogram gives
  per-(window, bucket) contiguous point-index segments in
  occupancy-descending lane order — data-dependent scatter (hostile to
  a vector machine) becomes contiguous gathers for the tree-fold
  pipeline (ops/msm3.py, the accumulation engine);
* window totals combine MSB->LSB with c doublings per step
  (multiexp.rs:295-300), host-side at width 1 (fold_host).

(The v2 round-scheduled accumulator that used to live here — one
masked mixed-add round per bucket rank — was superseded by msm3's
gather-once occupancy-grouped tree folds and removed; its kernels were
ops/pallas_madd.py and the affine_round family of ops/pallas_affine.py.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .curve import CurveOps

MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# Signed digit decomposition
# ---------------------------------------------------------------------------


def num_windows(L: int, c: int) -> int:
    """Windows for an L-limb (16-bit limbs) scalar array. NOTE: L is the
    SCALAR field's limb count (scalar_limbs.shape[0]), not the curve's
    base-field spec."""
    assert 16 % c == 0
    return -(-(L * 16) // c)


def signed_digits(scalar_limbs, c: int):
    """Signed c-bit digits of plain-form scalars.

    Returns (absd, sgn): (nw, n) uint32 arrays with |digit| <= 2^(c-1)
    and sgn = 1 for negative digits. Scalars must be < 2^(16L - 1)
    (always true for reduced field elements), so no carry escapes the
    top window.
    """
    nw = num_windows(scalar_limbs.shape[0], c)
    per = 16 // c
    half = 1 << (c - 1)
    absd = []
    sgn = []
    carry = jnp.zeros(scalar_limbs.shape[1:], jnp.uint32)
    for w in range(nw):
        limb = scalar_limbs[w // per]
        d = (limb >> ((w % per) * c)) & ((1 << c) - 1)
        e = d + carry
        neg = e > half
        carry = neg.astype(jnp.uint32)
        mag = jnp.where(neg, (1 << c) - e, e)
        absd.append(mag)
        sgn.append(neg.astype(jnp.uint32))
    return jnp.stack(absd), jnp.stack(sgn)


# ---------------------------------------------------------------------------
# Point packing: two 16-bit limbs per uint32 lane (halves gather volume)
# ---------------------------------------------------------------------------


def _C(ops: CurveOps) -> int:
    return int(np.prod(ops.f.coeff_shape))


@functools.partial(jax.jit, static_argnums=0)
def pack_points(ops: CurveOps, points):
    """Jacobian batch (Z in {0,1}-Montgomery) -> ((Cp, n) packed affine
    coords, (n,) infinity mask). Montgomery limbs are < 2^16, so a u32
    holds limb pairs exactly. Pack once per base set (the prover's CRS
    is fixed across proofs — see PackedBases)."""
    C = _C(ops)
    x, y, z = points
    n = x.shape[-1]
    inf = ops.f.is_zero(z)
    xr = x.reshape(C, n)
    yr = y.reshape(C, n)
    xp = xr[0::2] | (xr[1::2] << 16)
    yp = yr[0::2] | (yr[1::2] << 16)
    return jnp.concatenate([xp, yp], axis=0), inf


class PackedBases:
    """Pre-packed MSM bases: pack once, reuse across msm2 calls."""

    def __init__(self, ops: CurveOps, points, _packed=None, _inf=None):
        if points is not None:
            self.packed, self.inf_mask = pack_points(ops, points)
        else:
            self.packed, self.inf_mask = _packed, _inf
        self.n = int(self.packed.shape[-1])

    def slice(self, start: int, stop: int) -> "PackedBases":
        """View of bases [start, stop) — no re-packing (the prover's
        ParameterSource offset splitting, groth16/src/lib.rs:435-474)."""
        return PackedBases(
            None, None,
            _packed=self.packed[:, start:stop],
            _inf=self.inf_mask[start:stop],
        )


def _unpack_coords(C, packed):
    """(C, W) packed -> x, y (C, W) unpacked limb rows."""
    half = C // 2
    xp = packed[:half]
    yp = packed[half:]

    def unpack(v):
        lo = v & MASK16
        hi = v >> 16
        # interleave rows: stack on a new axis then fold into rows
        return jnp.stack([lo, hi], axis=1).reshape(C, v.shape[-1])

    return unpack(xp), unpack(yp)


# ---------------------------------------------------------------------------
# Schedule: digits -> sorted segments in occupancy-desc lane order
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _schedule(L: int, c: int, nw: int, half: int, scalar_limbs, inf_mask):
    """Digits -> sort -> lane segment bounds -> occupancy-desc order,
    all in one dispatch. Returns (fenc_sorted, starts_s, occ_s,
    lane_order, inv_order).

    Gather-free by design (gathers/searchsorted run ~30-70M elem/s on
    this chip): the payload rides the sort via lax.sort_key_val, and
    segment bounds come from a bucket histogram + cumsum instead of
    binary searches into the 16M-element sorted key array."""
    n = scalar_limbs.shape[-1]
    absd, sgn = signed_digits(scalar_limbs, c)
    absd = jnp.where(inf_mask[None, :], 0, absd)

    key_flat = ((jnp.arange(nw, dtype=jnp.uint32)[:, None] << 16) | absd
                ).reshape(-1)
    pt_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.uint32)[None, :], (nw, n)
    ).reshape(-1)
    fenc_flat = (pt_idx << 1) | sgn.reshape(-1)
    _, fenc_sorted = jax.lax.sort_key_val(key_flat, fenc_flat)

    # per-(window, |digit|) histogram; exclusive cumsum = segment starts
    # in the sorted array (the sort IS ordered by (w, |digit|))
    bins = nw * (half + 1)
    bin_id = ((key_flat >> 16) * (half + 1) + (key_flat & 0xFFFF)
              ).astype(jnp.int32)
    hist = jnp.zeros((bins,), jnp.uint32).at[bin_id].add(1)
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32), jnp.cumsum(hist, dtype=jnp.uint32)[:-1]]
    )
    occ = hist.reshape(nw, half + 1)[:, 1:].reshape(-1)      # drop digit 0
    starts = cum.reshape(nw, half + 1)[:, 1:].reshape(-1)

    lane_order = jnp.argsort(-occ.astype(jnp.int32))
    occ_s = jnp.take(occ, lane_order)
    starts_s = jnp.take(starts, lane_order)
    # inv_order[lane] = occupancy-sorted position of dense lane
    # (w*half + b-1): the un-permute map every totals pass needs —
    # computed here so downstream passes never re-argsort
    inv_order = jnp.argsort(lane_order)
    return fenc_sorted, starts_s, occ_s, lane_order, inv_order


# ---------------------------------------------------------------------------
# Bucket suffix pass + window fold
# ---------------------------------------------------------------------------


def _seg_scan_any(ops: CurveOps, packed, flags, mode: str):
    """Segmented inclusive scan over lanes (flags mark segment starts),
    as log2(W) Hillis-Steele steps of full-width Jacobian adds — pure
    vector ops, so the same code serves every mode/backend (it replaced
    the round-1 sequential-grid Pallas scan kernel; the hot paths now
    reduce via the tree folds of ops/pallas_fold.py instead)."""
    del mode  # vector-op implementation is mode-independent
    W = packed.shape[-1]
    x = packed
    f = flags[0].astype(bool)
    d = 1
    while d < W:
        # shift right by d: lane i combines with lane i-d unless a
        # segment boundary lies in (i-d, i] (tracked by accumulated f);
        # shifted-in lanes are the identity (1, 1, 0), not zeros
        inf_cols = jnp.broadcast_to(
            _pack1(ops, ops.infinity((1,))), (x.shape[0], d)
        )
        xs = jnp.concatenate([inf_cols, x[:, : W - d]], axis=1)
        fs = jnp.pad(f[: W - d], (d, 0), constant_values=True)
        summed = _pack1(ops, ops.add(_unpack1(ops, x), _unpack1(ops, xs)))
        x = jnp.where(f[None, :], x, summed)
        f = f | fs
        d <<= 1
    return x


def _pack1(ops: CurveOps, p):
    C = _C(ops)
    n = p[0].shape[-1]
    return jnp.concatenate([c.reshape(C, n) for c in p], axis=0)


def _unpack1(ops: CurveOps, a):
    C = _C(ops)
    n = a.shape[-1]
    cs = ops.f.coeff_shape + (n,)
    return (a[:C].reshape(cs), a[C:2 * C].reshape(cs), a[2 * C:].reshape(cs))


def bucket_totals(ops: CurveOps, acc_dense, nw: int, half: int, mode: str):
    """Per-window Σ_b b·S_b via suffix sums ("summation by parts").

    acc_dense: (3C, nw*half) bucket sums in (window, bucket) lane order
    (bucket 1..half ascending). Returns (3C, nw) window totals."""
    C3 = acc_dense.shape[0]
    W0 = nw * half
    # suffix order within each window: flip the bucket axis
    flipped = jnp.flip(
        acc_dense.reshape(C3, nw, half), axis=-1
    ).reshape(C3, W0)
    flags = jnp.zeros((1, W0), jnp.uint32)
    flags = flags.at[0, ::half].set(1)
    run = _seg_scan_any(ops, flipped, flags, mode)      # suffix sums R_b
    tot = _seg_scan_any(ops, run, flags, mode)          # Σ_b R_b per window
    return tot[:, half - 1::half]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fold_windows(ops: CurveOps, nw: int, c: int, tot):
    """Combine window totals MSB->LSB with c doublings per step.

    One lax.scan over windows (body traced once: compile stays O(1) in
    nw). The initial accumulator is infinity; its leading doublings are
    no-ops."""
    C3 = tot.shape[0]
    cols = jnp.flip(tot, axis=-1)            # MSB window first
    xs = jnp.moveaxis(cols, -1, 0)[..., None]  # (nw, 3C, 1)

    def body(acc, col):
        acc = jax.lax.fori_loop(0, c, lambda _, a: ops.double(a), acc)
        acc = ops.add(acc, _unpack1(ops, col))
        return acc, None

    acc, _ = jax.lax.scan(body, ops.infinity((1,)), xs)
    return _pack1(ops, acc)


# ---------------------------------------------------------------------------
# Defaults + host window fold
# ---------------------------------------------------------------------------


def default_mode() -> str:
    from . import pallas_kernels as pk

    return "pallas" if pk.enabled() else "jnp"


def default_c(n: int) -> int:
    return 16 if n >= (1 << 18) else 8


def fold_host(tot_pts, nw: int, c: int, identity):
    """Window fold on the host (240 point doublings are sequential; at
    width 1 the device offers no parallelism and Python bigints win)."""
    acc = identity
    for w in reversed(range(nw)):
        for _ in range(c):
            acc = acc.double()
        acc = acc + tot_pts[w]
    return acc


# ---------------------------------------------------------------------------
# DummyEngine "MSM": the mock group is F_64513 additive with g*k = g*k,
# so the MSM is an inner product mod p (dummy_engine.rs:336-369).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def dummy_inner_product(spec: limbs.FieldSpec, bases_mont, scalars_mont):
    """sum_i bases_i * scalars_i over F_p; (L, n) Montgomery inputs,
    (L, 1) Montgomery output."""
    prod = limbs.mont_mul_r(spec, bases_mont, scalars_mont)
    n = prod.shape[-1]
    while n > 1:
        half = (n + 1) // 2
        lo = prod[..., :half]
        hi = prod[..., half:]
        pad = half - hi.shape[-1]
        if pad:
            hi = jnp.concatenate(
                [hi, jnp.zeros(hi.shape[:-1] + (pad,), hi.dtype)], axis=-1
            )
        prod = limbs.add_r(spec, lo, hi)
        n = half
    return prod
