"""TPU-native Pippenger MSM, round-scheduled (v2 of ops/msm.py).

Re-designs the reference's bucket method
(/root/reference/src/multiexp.rs:210-301) around what this chip is
actually good and bad at (measured, PERF.md):

* data-dependent scatter is impossible and XLA gathers are slow, so the
  gathered volume is minimized: points are packed two 16-bit limbs per
  uint32 lane and each point is gathered once per window;
* sequential narrow work is poison, so bucket accumulation runs as
  full-width vector rounds: lane = (window, bucket), and round r adds
  the r-th point of every bucket simultaneously via the Pallas masked
  mixed-add kernel (ops/pallas_madd.py) — all windows in one launch
  (the window-parallelism of multiexp.rs:288-293 as a lane dimension);
* signed 16-bit digits halve the bucket count (the wNAF idea of
  group::Wnaf, /root/reference/groth16/src/generator.rs:209-226): digits
  in [-2^15, 2^15], negative digits negate y in-kernel;
* lanes are processed in occupancy-descending order so the active lane
  set is always a prefix — rounds shrink to quantized widths and total
  work stays O(sum of bucket occupancies) = O(n) per window even for
  skewed digit distributions.

Pipeline: signed digits -> one global (window|digit) key sort ->
segment bounds per lane -> occupancy-sorted round schedule (a single
tiny host sync) -> chunked accumulate rounds under jit -> bucket suffix
pass ("summation by parts", multiexp.rs:267-277) via the Pallas
segmented scan -> window fold MSB->LSB (multiexp.rs:295-300).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from . import scan as scanlib
from .curve import CurveOps
from . import pallas_madd
from .pallas_madd import TILE, rows_acc, rows_add, _pad8

MASK16 = 0xFFFF
CHUNK = 32  # accumulate rounds per jit dispatch


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


def pack_points(ops: CurveOps, points):
    """Jacobian batch (Z in {0,1}-Montgomery) -> ((Cp, n) packed affine
    coords, (n,) infinity mask). Montgomery limbs are < 2^16, so a u32
    holds limb pairs exactly."""
    C = _C(ops)
    x, y, z = points
    n = x.shape[-1]
    inf = ops.f.is_zero(z)
    xr = x.reshape(C, n)
    yr = y.reshape(C, n)
    xp = xr[0::2] | (xr[1::2] << 16)
    yp = yr[0::2] | (yr[1::2] << 16)
    return jnp.concatenate([xp, yp], axis=0), inf


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
# Accumulate rounds
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(8,))
def _run_chunk(ops: CurveOps, width: int, W0: int, mode: str,
               ptspacked, fenc_sorted, sched, r0, acc):
    """CHUNK accumulate rounds at a fixed gather width, one dispatch.

    sched = (starts_s, occ_s) lane schedule (occupancy-descending);
    fenc_sorted = per sorted position (point_index << 1) | sign;
    acc: (RA, W0) Jacobian accumulator rows."""
    starts_s, occ_s = sched
    C = _C(ops)
    RD = rows_add(ops)
    n_sorted = fenc_sorted.shape[0]

    rr = r0 + jnp.arange(CHUNK, dtype=jnp.uint32)[:, None]
    st = starts_s[None, :width]
    oc = occ_s[None, :width]
    pos = jnp.where(rr < oc, st + rr, 0).astype(jnp.int32)
    tab = jnp.take(fenc_sorted, pos.reshape(-1), axis=0).reshape(CHUNK, width)

    def body(t, acc):
        row = jax.lax.dynamic_slice_in_dim(tab, t, 1, axis=0)[0]
        rt = r0 + t.astype(jnp.uint32)
        valid = (rt < occ_s[:width]).astype(jnp.uint32)
        pt = (row >> 1).astype(jnp.int32)
        sign = row & 1
        coords = jnp.take(ptspacked, pt, axis=1)  # (C, width) packed
        x, y = _unpack_coords(C, coords)
        aux = jnp.zeros((8, width), jnp.uint32)
        aux = aux.at[0].set(valid).at[1].set(sign)
        addend = jnp.concatenate(
            [x, y, jnp.zeros((_pad8(2 * C) - 2 * C, width), jnp.uint32), aux],
            axis=0,
        )
        if width < W0:
            full = jnp.zeros((RD, W0), jnp.uint32)
            addend = jax.lax.dynamic_update_slice(full, addend, (0, 0))
        if mode == "jnp":
            return pallas_madd.madd_round_jnp(ops, acc, addend)
        return pallas_madd.madd_round(
            ops, acc, addend, mode == "interpret"
        )

    return jax.lax.fori_loop(0, CHUNK, body, acc)


# ---------------------------------------------------------------------------
# Bucket suffix pass + window fold
# ---------------------------------------------------------------------------


def _seg_scan_any(ops: CurveOps, packed, flags, mode: str):
    if mode == "jnp":
        inf1 = _pack1(ops, ops.infinity((1,)))
        from .msm import _seg_combine

        out, _ = scanlib.chunked_scan(
            _seg_combine(ops),
            (inf1, jnp.zeros((1, 1), jnp.uint32)),
            (packed, flags),
        )
        return out
    from . import pallas_scan

    return pallas_scan.seg_scan(ops, packed, flags,
                                interpret=(mode == "interpret"))


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
# Top level
# ---------------------------------------------------------------------------


def default_mode() -> str:
    from . import pallas_kernels as pk

    return "pallas" if pk.enabled() else "jnp"


def default_c(n: int) -> int:
    return 16 if n >= (1 << 15) else 8


def msm2(ops: CurveOps, points, scalar_limbs, c: int | None = None,
         mode: str | None = None):
    """MSM Σ_i scalars_i · points_i.

    points: Jacobian batch tuple with Z ∈ {0, 1} (affine or identity —
    what g1_to_device/g2_to_device produce); scalar_limbs: (L, n)
    plain-form u32 limb array. Returns a Jacobian point batch (1,).
    mode: 'pallas' (TPU), 'jnp' (CPU reference), 'interpret' (kernel
    tests on CPU)."""
    scalar_limbs = jnp.asarray(scalar_limbs)
    n = int(scalar_limbs.shape[-1])
    if mode is None:
        mode = default_mode()
    if c is None:
        c = default_c(n)
    nw = num_windows(int(scalar_limbs.shape[0]), c)
    half = 1 << (c - 1)
    W0 = nw * half
    assert W0 % TILE == 0, (W0, TILE)
    C = _C(ops)
    RA = rows_acc(ops)

    packed_pts, inf_mask = pack_points(ops, points)
    absd, sgn = signed_digits(scalar_limbs, c)
    # identity points contribute nothing: zero their digits
    absd = jnp.where(inf_mask[None, :], 0, absd)

    key_flat = ((jnp.arange(nw, dtype=jnp.uint32)[:, None] << 16) | absd
                ).reshape(-1)
    order = jnp.argsort(key_flat)                       # (nw*n,)
    key_sorted = jnp.take(key_flat, order)
    fenc_sorted = (
        ((order % n).astype(jnp.uint32) << 1)
        | jnp.take(sgn.reshape(-1), order)
    )

    lane_w = jnp.repeat(jnp.arange(nw, dtype=jnp.uint32), half)
    lane_b = jnp.tile(jnp.arange(1, half + 1, dtype=jnp.uint32), nw)
    lane_key = (lane_w << 16) | lane_b
    starts = jnp.searchsorted(key_sorted, lane_key, side="left")
    ends = jnp.searchsorted(key_sorted, lane_key, side="right")
    occ = (ends - starts).astype(jnp.uint32)

    lane_order = jnp.argsort(-occ.astype(jnp.int32))
    occ_s = jnp.take(occ, lane_order)
    starts_s = jnp.take(starts, lane_order).astype(jnp.uint32)

    # one tiny host sync: occupancy at quantized-width boundaries
    ks = [k for k in range(1, 32) if (W0 >> k) >= TILE]
    probe_idx = jnp.asarray([0] + [W0 >> k for k in ks], dtype=jnp.int32)
    probe = np.asarray(jax.device_get(jnp.take(occ_s, probe_idx)))
    occ_max = int(probe[0])
    widths = [W0] + [W0 >> k for k in ks]

    acc = jnp.zeros((RA, W0), jnp.uint32)
    sched = (starts_s, occ_s)
    r = 0
    while r < occ_max:
        width = W0
        for j, k in enumerate(ks):
            if probe[j + 1] <= r:
                width = W0 >> k  # lanes beyond this index are all done
        acc = _run_chunk(ops, width, W0, mode, packed_pts, fenc_sorted,
                         sched, jnp.uint32(r), acc)
        r += CHUNK

    # un-permute lanes back to dense (window, bucket) order
    inv_order = jnp.argsort(lane_order)
    acc_dense = jnp.take(acc[:3 * C], inv_order, axis=1)

    tot = bucket_totals(ops, acc_dense, nw, half, mode)
    res = _fold_windows(ops, nw, c, tot)
    return _unpack1(ops, res)
