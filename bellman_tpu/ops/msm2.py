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
from .curve import CurveOps
from . import pallas_madd
from . import pallas_affine
from .pallas_madd import TILE, rows_acc, rows_add, _pad8
from .pallas_affine import rows_aff

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
# Accumulate rounds
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _schedule(L: int, c: int, nw: int, half: int, W0: int, n_probe: int,
              scalar_limbs, inf_mask):
    """Digits -> sort -> lane segment bounds -> occupancy-desc order,
    all in one dispatch. Returns (fenc_sorted, starts_s, occ_s,
    lane_order, probe) where probe holds occupancy at quantized-width
    boundaries (the only value the host reads).

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
    probe_idx = _width_levels(W0)[:n_probe]
    probe = jnp.take(occ_s, jnp.asarray([0] + probe_idx[1:], jnp.int32))
    probe = probe.at[0].set(occ_s[0])
    return fenc_sorted, starts_s, occ_s, lane_order, probe


def _width_levels(W0: int) -> list[int]:
    """Quantized gather widths: W0, W0/4, W0/16, ... down to TILE."""
    levels = [W0]
    k = 2
    while (W0 >> k) >= TILE:
        levels.append(W0 >> k)
        k += 2
    return levels


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(9,))
def _run_seg(ops: CurveOps, width: int, W0: int, mode: str,
             ptspacked, fenc_sorted, starts_s, occ_s, r0, acc, nrounds):
    """Up to CHUNK accumulate rounds at one gather width, one dispatch.

    fenc_sorted = per sorted position (point_index << 1) | sign;
    acc: (RA, W0) Jacobian accumulator rows. Runs rounds
    [r0, r0+nrounds) (nrounds traced, <= CHUNK)."""
    C = _C(ops)
    RD = rows_add(ops)

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
            return pallas_affine.affine_round_jnp(ops, acc, addend)
        return pallas_affine.affine_round(
            ops, acc, addend, mode == "interpret"
        )

    return jax.lax.fori_loop(0, nrounds, body, acc)


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
# Top level
# ---------------------------------------------------------------------------


def default_mode() -> str:
    from . import pallas_kernels as pk

    return "pallas" if pk.enabled() else "jnp"


def default_c(n: int) -> int:
    return 16 if n >= (1 << 18) else 8


def _plan_segments(probe: np.ndarray, levels: list[int]) -> list[tuple]:
    """(r0, nrounds, width) segments from the occupancy probe.

    Width drops exactly when a probe threshold is crossed; each segment
    runs at most CHUNK rounds so the fenc gather table stays bounded."""
    occ_max = int(probe[0])
    segs = []
    r = 0
    while r < occ_max:
        width = levels[0]
        drop_at = occ_max
        for i in range(1, len(levels)):
            if int(probe[i]) <= r:
                width = levels[i]
            elif int(probe[i]) < drop_at:
                drop_at = int(probe[i])  # next point a narrower width opens
        nr = min(CHUNK, drop_at - r if drop_at > r else CHUNK,
                 occ_max - r)
        segs.append((r, nr, width))
        r += nr
    return segs


def _affine_to_jac(ops: CurveOps, acc):
    """Affine accumulator rows (lazy [0,2p) coords + nonempty flag) ->
    canonical packed Jacobian rows (3C, W)."""
    C = _C(ops)
    spec = ops.f.spec
    W = acc.shape[-1]
    # canonicalize per L-row limb slab (x and y, each C rows)
    slabs = []
    for block in range(2 * C // spec.L):
        slabs.append(
            limbs._cond_sub_p(spec, acc[block * spec.L:(block + 1) * spec.L])
        )
    xy = jnp.concatenate(slabs, axis=0)
    flag = acc[2 * C]
    one = jnp.asarray(spec.one_mont)  # (L, 1)
    z_one = jnp.zeros((C, W), jnp.uint32)
    # Z = 1 in Montgomery form lives in the first L rows of the coord
    z_one = z_one.at[:spec.L].set(jnp.broadcast_to(one, (spec.L, W)))
    z = jnp.where(flag[None] != 0, z_one, jnp.zeros((C, W), jnp.uint32))
    return jnp.concatenate([xy, z], axis=0)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _bucket_and_tot(ops: CurveOps, nw: int, half: int, acc, lane_order):
    """Un-permute lanes, run the bucket suffix pass, return window
    totals (3C, nw). Pallas mode only (CPU path stays in msm2)."""
    C = _C(ops)
    jac = _affine_to_jac(ops, acc)
    inv_order = jnp.argsort(lane_order)
    acc_dense = jnp.take(jac, inv_order, axis=1)
    return bucket_totals(ops, acc_dense, nw, half, "pallas")


def fold_host(tot_pts, nw: int, c: int, identity):
    """Window fold on the host (240 point doublings are sequential; at
    width 1 the device offers no parallelism and Python bigints win)."""
    acc = identity
    for w in reversed(range(nw)):
        for _ in range(c):
            acc = acc.double()
        acc = acc + tot_pts[w]
    return acc


def msm2(ops: CurveOps, points, scalar_limbs, c: int | None = None,
         mode: str | None = None, point_cls=None, verbose: bool = False):
    """MSM Σ_i scalars_i · points_i.

    points: Jacobian batch tuple with Z ∈ {0, 1} (affine or identity —
    what g1_to_device/g2_to_device produce); scalar_limbs: (L, n)
    plain-form u32 limb array. Returns a Jacobian point batch (1,), or
    the host affine point if ``point_cls`` is given (the window fold is
    then done host-side — cheaper than 240 sequential width-1 device
    doublings).
    mode: 'pallas' (TPU), 'jnp' (CPU reference), 'interpret' (kernel
    tests on CPU)."""
    scalar_limbs = jnp.asarray(scalar_limbs)
    n = int(scalar_limbs.shape[-1])
    L = int(scalar_limbs.shape[0])
    if mode is None:
        mode = default_mode()
    if c is None:
        c = default_c(n)
    nw = num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    assert W0 % TILE == 0, (W0, TILE)
    C = _C(ops)
    RA = rows_acc(ops)
    levels = _width_levels(W0)

    import time as _time

    def _log(msg):
        if verbose:
            print(f"[msm2 +{_time.time() - _t0:.1f}s] {msg}", flush=True)

    _t0 = _time.time()
    if isinstance(points, PackedBases):
        packed_pts, inf_mask = points.packed, points.inf_mask
    else:
        packed_pts, inf_mask = pack_points(ops, points)
    fenc_sorted, starts_s, occ_s, lane_order, probe_dev = _schedule(
        L, c, nw, half, W0, len(levels), scalar_limbs, inf_mask
    )
    probe = np.asarray(jax.device_get(probe_dev))  # the one host sync
    _log(f"schedule done, probe={probe.tolist()}")

    acc = jnp.zeros((rows_aff(ops), W0), jnp.uint32)
    segs = _plan_segments(probe, levels)
    _log(f"{len(segs)} segments: {segs[:6]}...")
    for r0, nr, width in segs:
        acc = _run_seg(ops, width, W0, mode, packed_pts, fenc_sorted,
                       starts_s, occ_s, jnp.uint32(r0), acc,
                       jnp.int32(nr))
    if verbose:
        jax.block_until_ready(acc)
        _log("accumulate rounds done")

    if mode == "pallas":
        tot = _bucket_and_tot(ops, nw, half, acc, lane_order)
        if verbose:
            jax.block_until_ready(tot)
            _log("bucket totals done")
    else:
        jac = _affine_to_jac(ops, acc)
        inv_order = jnp.argsort(lane_order)
        acc_dense = jnp.take(jac, inv_order, axis=1)
        tot = bucket_totals(ops, acc_dense, nw, half, mode)

    if point_cls is not None:
        from .curve import jacobian_to_host

        tot_pts = jacobian_to_host(ops, _unpack1(ops, tot), point_cls)
        return fold_host(tot_pts, nw, c, point_cls.identity())
    res = _fold_windows(ops, nw, c, tot)
    return _unpack1(ops, res)


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
