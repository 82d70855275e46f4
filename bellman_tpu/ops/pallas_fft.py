"""Fused multi-stage FFT kernels: the whole butterfly ladder in 2-4
VMEM passes.

The per-stage path (ops/fft.py `_fft_impl` + pallas_kernels.butterfly)
pays, for every one of the log2(n) stages, a full-array HBM round trip
PLUS the XLA relayout copies of the (n/2m, 2, m) interleave — measured
17.7% of the VPU roofline at 2^20 (PERF.md r4). These kernels keep a
block of the domain resident in VMEM across up to 14 butterfly stages:

* ``fft_k1`` — stages 0..13 in ONE pass. The block is (L, RB, 128)
  elements (row r, lane l) = flat index r*128 + l. Stages 0..6 pair
  lanes at distance 2^s: the block is transposed in VMEM so those
  become SUBLANE pairings (contiguous u/v halves after a reshape —
  exact multiply counts, no duplicated work), then transposed back for
  stages 7..13 whose pair distance is 2^(s-7) rows (sublane again).
* ``fft_span`` — stages [lo, lo+k) for lo >= 7k' boundaries: the array
  is viewed (L, n/2^lo, 2^lo); pair distance 2^(s-lo) rows with lanes
  chunked, all sublane pairings, no transpose.

Butterfly semantics are exactly serial_fft's
(/root/reference/src/domain.rs:272-314): after the global bit-reversal
permutation, stage s forms hi = u + w*v, lo = u - w*v with
w = omega^(j * n / 2^(s+1)), j = index mod 2^s. Twiddles enter as
per-stage slab inputs sliced from the plan's geometric tables, so the
kernels are pure functions of (spec, shapes).

Cost: n=2^20 runs as bitrev-take + fft_k1 (14 stages) + fft_span (6
stages) — 3 passes instead of 21.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs
from .limbs import FieldSpec

CHL = 256         # lane chunk for span kernels
K1_STAGES = 14    # max stages fused by fft_k1 (7 lane + 7 row)


def _sub_stage(spec: FieldSpec, x, w, k: int, p):
    """One butterfly stage pairing SUBLANE rows at distance 2^k.

    x: (L, R, Q); w: (L, 2^k, Qw) with Qw in {1, Q} (broadcast over
    lanes or per-lane). Rows r with bit k clear are u, bit k set are v;
    out[u-row] = u + w*v, out[v-row] = u - w*v."""
    L, R, Q = x.shape
    d = 1 << k
    G = R // (2 * d)
    x5 = x.reshape(L, G, 2, d, Q)
    u = x5[:, :, 0].reshape(L, R // 2, Q)
    v = x5[:, :, 1].reshape(L, R // 2, Q)
    wb = jnp.broadcast_to(
        w.reshape(L, 1, d, w.shape[-1]), (L, G, d, Q)
    ).reshape(L, R // 2, Q)
    t = limbs.mont_mul_kernel(spec, v, wb, p)
    hi = limbs.add_kernel(spec, u, t, p)
    lo = limbs.sub_kernel(spec, u, t, p)
    return jnp.concatenate(
        [hi.reshape(L, G, 1, d, Q), lo.reshape(L, G, 1, d, Q)], axis=2
    ).reshape(L, R, Q)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def fft_k1(spec: FieldSpec, log_n: int, nstages: int, interpret: bool,
           a, *slabs):
    """Stages 0..nstages-1 fused (nstages <= K1_STAGES).

    a: (L, n). Block (L, RB, 128) with RB = min(128, n/128); lane
    stages (s < 7) run on the transposed block so every pairing is a
    sublane reshape. slabs[s]: (L, 2^s) twiddle table of stage s."""
    L = spec.L
    n = a.shape[-1]
    RB = min(128, n // 128)
    n_lane = min(7, nstages)
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))
    a3 = a.reshape(L, n // 128, 128)

    def kernel(p_ref, *refs):
        slab_refs = refs[:nstages]
        x_ref, o_ref = refs[nstages], refs[nstages + 1]
        p = p_ref[:]
        x = x_ref[:]                       # (L, RB, 128)
        xt = jnp.swapaxes(x, 1, 2)         # (L, 128, RB): sublane = lane
        for s in range(n_lane):
            w = slab_refs[s][:].reshape(L, 1 << s, 1)
            xt = _sub_stage(spec, xt, w, s, p)
        x = jnp.swapaxes(xt, 1, 2)
        for s in range(n_lane, nstages):
            k = s - 7
            w = slab_refs[s][:].reshape(L, 1 << k, 128)
            x = _sub_stage(spec, x, w, k, p)
        o_ref[:] = x

    in_specs = [pl.BlockSpec((L, 1), lambda i: (0, 0))]
    for s in range(nstages):
        m = 1 << s
        in_specs.append(
            pl.BlockSpec((L, m), lambda i: (0, 0))
        )
    in_specs.append(pl.BlockSpec((L, RB, 128), lambda i: (0, i, 0)))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, n // 128, 128), jnp.uint32),
        grid=(n // 128 // RB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, RB, 128), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, *slabs, a3)
    return out.reshape(L, n)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def fft_span(spec: FieldSpec, log_n: int, lo_bits: int, nstages: int,
             interpret: bool, a, *slabs):
    """Stages lo_bits..lo_bits+nstages-1 fused.

    View (L, HI, LO) with LO = 2^lo_bits: stage lo_bits+k pairs HI rows
    at distance 2^k — sublane pairings on (L, RB2, CHL) blocks.
    slabs[k]: (L, 2^k, LO) twiddle table (row = hi mod 2^k, lane = lo)."""
    L = spec.L
    n = a.shape[-1]
    LO = 1 << lo_bits
    HI = n // LO
    RB2 = 1 << nstages
    assert RB2 <= HI
    chl = min(CHL, LO)
    p_arr = jnp.asarray(spec.p_limbs.reshape(L, 1))
    a3 = a.reshape(L, HI, LO)

    def kernel(p_ref, *refs):
        slab_refs = refs[:nstages]
        x_ref, o_ref = refs[nstages], refs[nstages + 1]
        p = p_ref[:]
        x = x_ref[:]                       # (L, RB2, chl)
        for k in range(nstages):
            w = slab_refs[k][:]            # (L, 2^k, chl)
            x = _sub_stage(spec, x, w, k, p)
        o_ref[:] = x

    in_specs = [pl.BlockSpec((L, 1), lambda g, i: (0, 0))]
    for k in range(nstages):
        d = 1 << k
        in_specs.append(
            pl.BlockSpec((L, d, chl), lambda g, i: (0, 0, i))
        )
    in_specs.append(pl.BlockSpec((L, RB2, chl), lambda g, i: (0, g, i)))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, HI, LO), jnp.uint32),
        grid=(HI // RB2, LO // chl),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, RB2, chl), lambda g, i: (0, g, i)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(p_arr, *slabs, a3)
    return out.reshape(L, n)


def stage_tables(spec: FieldSpec, log_n: int, omega_int: int):
    """Per-stage twiddle tables: tables[s] = (L, 2^s) Montgomery array
    with entry j = omega^(j * n / 2^(s+1)).

    Built by repeated squaring + geometric doubling — NO strided slices
    of the (L, n/2) master table (a ::stride slice lowers to a
    gather-class op on TPU; doing it per stage per call was ~300 ms of
    the first fused-FFT implementation's 368 ms warm time at 2^16).
    Call once per plan and cache (fft.DomainPlan.fused_tables)."""
    import jax.numpy as _jnp

    from .fft import geometric_powers

    p = spec.p
    n = 1 << log_n
    bases = []
    b = omega_int                      # stage log_n-1 base: omega
    for s in range(log_n - 1, -1, -1):
        bases.append(b)
        b = (b * b) % p                # stage s-1 base = omega^(n/2^s)
    bases.reverse()
    tables = []
    for s in range(log_n):
        base = _jnp.asarray(spec.to_mont_host([bases[s]]))
        tables.append(geometric_powers(spec, base, s))
    return tables


def fused_fft(spec: FieldSpec, log_n: int, tw, a,
              interpret: bool = False, tables=None):
    """Full post-bitrev butterfly ladder via the fused kernels.

    a: (L, 2^log_n) already bit-reversal-permuted; tw: (L, 2^(log_n-1))
    geometric twiddle table (forward or inverse), used only when
    ``tables`` (the per-stage tables from stage_tables) is not given.
    Returns the transformed array (no 1/n scaling)."""
    n = 1 << log_n
    assert a.shape[-1] == n and n >= 256, (a.shape, n)
    if tables is None:
        tables = [tw[:, :: n // (2 << s)][:, : 1 << s]
                  for s in range(log_n)]
    RB = min(128, n // 128)
    k1 = min(log_n, 7 + RB.bit_length() - 1)
    a = fft_k1(spec, log_n, k1, interpret, a, *tables[:k1])
    lo = k1
    while lo < log_n:
        nst = min(7, log_n - lo)
        # blocks pair 2^nst consecutive hi-rows; need HI >= 2^nst (true:
        # HI = n/2^lo = 2^(log_n-lo) >= 2^nst by construction)
        span_slabs = [
            tables[lo + k].reshape(spec.L, 1 << k, 1 << lo)
            for k in range(nst)
        ]
        a = fft_span(spec, log_n, lo, nst, interpret, a, *span_slabs)
        lo += nst
    return a
