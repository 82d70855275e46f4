"""Device Pippenger multi-scalar multiplication (bucket-method MSM).

TPU-native re-design of the reference's multiexp
(/root/reference/src/multiexp.rs:210-301). The reference scatters bases
into buckets serially per window; data-dependent scatter is hostile to a
vector machine (SURVEY.md §7 hard-part #2), so the kernel reformulates
bucket accumulation as sort + segmented scan:

  per c-bit window:
    1. digit extraction from the scalar limb array (vector ops)
    2. sort point indices by digit (XLA sort)
    3. segmented inclusive scan of Jacobian point-add over the sorted
       run (jax.lax.associative_scan, O(n) work / O(log n) depth)
    4. scatter each segment's final sum into a dense 2^c bucket array
    5. running (suffix) sum over buckets — the "summation by parts" of
       multiexp.rs:267-277 — then a pairwise tree reduction
  windows are combined MSB->LSB with c doublings each, exactly the fold
  of multiexp.rs:288-300.

Zero digits land in bucket 0 and are dropped, matching the reference's
Zero-exponent skip (:246-251). Density-filtered queries are compacted
host-side before upload (the Source::skip semantics of :26-31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from . import scan as scanlib
from .curve import CurveOps


def extract_digits(scalar_limbs, window: int, c: int):
    """Digit w of each scalar: bits [w*c, (w+1)*c). c must divide 16.

    scalar_limbs: (L, n) uint32 plain-form 16-bit limbs."""
    assert 16 % c == 0, "window size must divide the 16-bit limb width"
    per = 16 // c
    limb = scalar_limbs[window // per]
    shift = (window % per) * c
    return (limb >> shift) & ((1 << c) - 1)


def num_windows(spec: limbs.FieldSpec, c: int) -> int:
    return -(-(spec.L * 16) // c)


def _pack(ops: CurveOps, p):
    """Point tuple -> single (3*C, n) array for pytree-uniform scans."""
    n = p[0].shape[-1]
    C = int(np.prod(ops.f.coeff_shape))
    return jnp.concatenate([c.reshape(C, n) for c in p], axis=0)


def _unpack(ops: CurveOps, a):
    C = int(np.prod(ops.f.coeff_shape))
    n = a.shape[-1]
    cs = ops.f.coeff_shape + (n,)
    return (
        a[:C].reshape(cs),
        a[C : 2 * C].reshape(cs),
        a[2 * C :].reshape(cs),
    )


def _seg_combine(ops: CurveOps):
    """Segmented point-add combine over (packed, flag) tuples."""

    def combine(a, b):
        pa, fa = a
        pb, fb = b
        merged = _pack(ops, ops.add(_unpack(ops, pa), _unpack(ops, pb)))
        out = jnp.where(fb.astype(bool), pb, merged)
        return out, fa | fb

    return combine


def _add_combine(ops: CurveOps):
    def combine(a, b):
        (pa,), (pb,) = a, b
        return (_pack(ops, ops.add(_unpack(ops, pa), _unpack(ops, pb))),)

    return combine


def _window_sum_body(ops: CurveOps, c: int, packed_points, digits,
                     use_pallas: bool | None = None):
    """Per-window bucket pipeline (traceable; see module docstring).

    On TPU the scans run as Pallas sequential-grid kernels
    (ops.pallas_scan); the jnp chunked scan is the CPU/test reference."""
    if use_pallas is None:
        from . import pallas_kernels as pk

        use_pallas = pk.enabled()
    n = digits.shape[0]
    inf1 = _pack(ops, ops.infinity((1,)))
    order = jnp.argsort(digits)
    d = jnp.take(digits, order)
    pts = jnp.take(packed_points, order, axis=-1)
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.uint32), (d[1:] != d[:-1]).astype(jnp.uint32)]
    )
    flags = jnp.broadcast_to(first[None], (1, n))
    if use_pallas:
        from . import pallas_scan

        scanned = pallas_scan.seg_scan(ops, pts, flags)
    else:
        scanned, _ = scanlib.chunked_scan(
            _seg_combine(ops),
            (inf1, jnp.zeros((1, 1), jnp.uint32)),
            (pts, flags),
        )
    is_end = jnp.concatenate([d[1:] != d[:-1], jnp.ones((1,), bool)])
    # segment sums -> dense buckets; digit 0 and non-ends are dropped
    target = jnp.where(is_end & (d > 0), d, jnp.uint32(1 << c))
    inf = _pack(ops, ops.infinity((1 << c,)))
    dense = inf.at[:, target].set(scanned, mode="drop")
    # suffix running sum over buckets 1..2^c-1 ("summation by parts",
    # multiexp.rs:267-277), then the total across buckets
    if use_pallas:
        from . import pallas_scan

        run = pallas_scan.plain_scan(ops, dense[:, 1:], reverse=True)
        # summation by parts: total = sum_b R_b (R_b the suffix sums)
        total = pallas_scan.plain_scan(ops, run)[:, -1:]
    else:
        # narrow chunks: the bucket pass is long but each device's share
        # is small, so favor wide shallow steps (the 40s XLA-CPU
        # collective rendezvous also bounds per-window sequential work)
        (run,) = scanlib.chunked_scan(
            _add_combine(ops), (inf1,), (dense[:, 1:],), reverse=True, base=32
        )
        (total,) = scanlib.chunked_reduce(
            _add_combine(ops), (inf1,), (run,), base=32
        )
    return total


@functools.lru_cache(maxsize=None)
def _window_sum_fn(ops: CurveOps, c: int):
    """Jitted per-window bucket pipeline for a given curve and window size."""
    return jax.jit(
        lambda packed_points, digits: _window_sum_body(
            ops, c, packed_points, digits
        )
    )


@functools.lru_cache(maxsize=None)
def _fold_fn(ops: CurveOps, c: int):
    """acc*2^c + window (c doublings + one add), jitted once per curve."""

    @jax.jit
    def fold(acc_packed, total_packed):
        acc = _unpack(ops, acc_packed)
        for _ in range(c):
            acc = ops.double(acc)
        acc = ops.add(acc, _unpack(ops, total_packed))
        return _pack(ops, acc)

    return fold


def default_window_bits(n: int) -> int:
    """Pick c. The scan cost is windows * O(n); the bucket post-pass is
    O(2^c). Balance 2^c against n (c must divide 16). Few distinct values
    keep the number of compiled window kernels small."""
    return 16 if n >= 1 << 14 else 8


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 1).bit_length()


def msm(ops: CurveOps, points, scalar_limbs, c: int | None = None):
    """MSM: sum_i points_i * scalars_i.

    points: Jacobian point batch tuple (batch (n,));
    scalar_limbs: (L, n) plain-form limb array; returns a Jacobian point
    with batch (1,).

    Inputs are padded to the next power of two (identity points with
    zero digits are inert) so the jitted window kernel is shape-cached
    across the prover's differently-sized queries."""
    n = int(scalar_limbs.shape[-1])
    if c is None:
        c = default_window_bits(n)
    # pad to at least 128 so tiny prover queries share one compiled kernel
    n_pad = max(128, _next_pow2(n))
    if n_pad != n:
        pad = n_pad - n
        inf = ops.infinity((pad,))
        points = tuple(
            jnp.concatenate([coord, ipad], axis=-1)
            for coord, ipad in zip(points, inf)
        )
        scalar_limbs = jnp.concatenate(
            [
                scalar_limbs,
                jnp.zeros(scalar_limbs.shape[:-1] + (pad,), scalar_limbs.dtype),
            ],
            axis=-1,
        )
    nw = -(-(scalar_limbs.shape[0] * 16) // c)
    packed = _pack(ops, points)
    wsum = _window_sum_fn(ops, c)
    fold = _fold_fn(ops, c)

    acc = None
    for w in reversed(range(nw)):
        total = wsum(packed, digits_fn(scalar_limbs, w, c))
        acc = total if acc is None else fold(acc, total)
    return _unpack(ops, acc)


digits_fn = jax.jit(extract_digits, static_argnums=(1, 2))


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
