"""TPU-native Pippenger MSM: gather-once + occupancy-grouped tree folds.

Profiling the earlier round-scheduled accumulator (v2, retired) showed
it dominated by one random point-gather PER ROUND at ~60 M indices/s —
the round schedule re-gathered nothing twice, but paid per-dispatch
overheads 65 times over. This pipeline keeps the shared signed digits
and single global (window|digit) sort of ops/msm2.py
(/root/reference/src/multiexp.rs:318-322 window heuristic; signed
digits after group::Wnaf, /root/reference/groth16/src/generator.rs:
209-226) and replaces round-scheduled accumulation entirely:

1. lanes = (window, |digit|) buckets, occupancy-sorted (descending) as
   in msm2's schedule;
2. lanes are grouped by occupancy ceil-power-of-two CAP; each group is
   gathered ONCE into a rank-major (cap x lanes) padded layout — every
   point is touched by exactly one gather, padding <= 2x (~1.4x avg);
3. each group reduces with log2(cap) contiguous pairwise folds
   (ops/pallas_fold.py): full-width branchless Jacobian adds where
   empty/padded slots are Z = 0 identities. No per-round gathers, no
   flags, no occupancy tail: a pathological bucket with k points costs
   log2(k) levels, not k rounds;
4. the dense (window, bucket) Jacobian lanes then run the existing
   bucket suffix pass ("summation by parts", multiexp.rs:267-277) and
   window fold.

Lanes with cap > CHUNK_SLOTS/TILE run the per-lane heavy path (fold a
single rank vector down to one point) — the adversarial all-same-scalar
distribution degrades to log2(n) folds instead of msm2's n rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs
from .curve import CurveOps
from . import msm2
from . import pallas_afold
from . import pallas_fold
from .msm2 import _C, _unpack_coords, num_windows, PackedBases
from .pallas_fold import TILE, rows_prep, rows_jac

CHUNK_SLOTS = 1 << 22   # max slots gathered/folded per dispatch
MAX_LOG_CAP = 25


def default_fold() -> str:
    """Fold-kernel family: 'affine' (batch-affine, ~2.1x less VPU work
    per lane, ops/pallas_afold.py) or 'jacobian' (ops/pallas_fold.py)."""
    import os

    return os.environ.get("BELLMAN_TPU_MSM_FOLD", "affine")


def default_totals() -> str:
    """Window-totals pass: 'hier' (two-level digit split, ~2*W0 adds) or
    'bits' (flat bit-weighted planes, c*W0 adds)."""
    import os

    return os.environ.get("BELLMAN_TPU_TOTALS", "hier")


def _hier_split(c: int) -> tuple[int, int]:
    """(lo, hi) bit split of the bucket index b-1 = u*2^lo + v."""
    lo = (c - 1) // 2
    return lo, (c - 1) - lo


def totals_exps(c: int, kind: str) -> tuple[int, ...]:
    """Per-plane weight exponents of the totals output U: the window
    total is T_w = sum_j 2^exps[j] * U[:, j, w]."""
    if kind == "bits":
        return tuple(range(c))
    lo, hi = _hier_split(c)
    return tuple(range(lo + 1)) + tuple(lo + k for k in range(hi))


@functools.partial(jax.jit, static_argnums=(1,))
def _occ_counts(occ_s, K: int):
    """counts[k] = #lanes with occupancy > 2^k, plus nonzero count."""
    th = jnp.asarray([1 << k for k in range(K)], jnp.uint32)
    cnt = jnp.sum(occ_s[None, :] > th[:, None], axis=1)
    nonzero = jnp.sum(occ_s > 0)
    return jnp.concatenate([cnt, nonzero[None]])


def _plan_groups(counts: np.ndarray):
    """[(cap, lane_lo, lane_hi)] over occupancy-desc lane indices.

    Group k covers occupancies (2^(k-1), 2^k]; occ-1 lanes merge into
    the cap-2 group. Lanes >= nonzero are empty and get no group."""
    nonzero = int(counts[-1])
    groups = []
    hi = nonzero
    k = 1
    while hi > 0:
        lo = int(counts[k]) if k < MAX_LOG_CAP else 0
        if lo < hi:
            groups.append((1 << k, lo, hi))
        hi = lo
        k += 1
    return groups[::-1]  # largest cap first (matches lane order prefix)


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _gather_group(ops: CurveOps, cap: int, lsub: int,
                  lane0, lane_hi, starts_s, occ_s, fenc_sorted, packed):
    """Gather one group chunk into rank-major prep layout.

    Returns (RP, cap*lsub) uint32: x rows, sign-applied y rows, valid
    flag row. Slot (r, l) holds sorted position starts[lane0+l] + r when
    r < occ, else an invalid slot (valid = 0)."""
    spec = ops.f.spec
    C = _C(ops)
    RP = rows_prep(ops)
    W = cap * lsub
    lanes = lane0 + jnp.arange(lsub, dtype=jnp.uint32)
    lane_ok = lanes < lane_hi
    lane_ix = jnp.where(lane_ok, lanes, 0).astype(jnp.int32)
    st = jnp.take(starts_s, lane_ix)
    oc = jnp.where(lane_ok, jnp.take(occ_s, lane_ix), 0)
    rr = jnp.arange(cap, dtype=jnp.uint32)[:, None]
    valid = rr < oc[None, :]
    pos = jnp.where(valid, st[None, :] + rr, 0).astype(jnp.int32)
    fenc = jnp.take(fenc_sorted, pos.reshape(-1))
    pt = (fenc >> 1).astype(jnp.int32)
    sign = (fenc & 1).astype(jnp.uint32)
    coords = jnp.take(packed, pt, axis=1)          # (C, W) packed pairs
    x, y = _unpack_coords(C, coords)
    yneg = limbs_sub_zero(spec, ops, y)
    y = jnp.where(sign[None, :] != 0, yneg, y)
    vrow = valid.reshape(1, W).astype(jnp.uint32)
    pad = RP - 2 * C - 1
    parts = [x, y, vrow]
    if pad:
        parts.append(jnp.zeros((pad, W), jnp.uint32))
    return jnp.concatenate(parts, axis=0)


def limbs_sub_zero(spec, ops, y):
    """-y mod p on (C, W) limb rows (handles Fq and stacked Fq2 rows:
    negation is per-coefficient, and the rows are plain L-limb slabs)."""
    C = y.shape[0]
    out = []
    for b in range(C // spec.L):
        slab = y[b * spec.L : (b + 1) * spec.L]
        out.append(limbs.sub(spec, jnp.zeros_like(slab), slab))
    return jnp.concatenate(out, axis=0)


def _fold_group(ops: CurveOps, prep, cap: int, mode: str,
                fold: str = "affine", aff_out: bool = False):
    """Rank-major prep (RP, cap*lsub) -> per-lane Jacobian (3C, lsub),
    or per-lane AFFINE rows (RAFF, lsub) with ``aff_out`` (fold='affine'
    only — the dense-accumulation chunked flow combines chunks in
    affine form and converts to Jacobian once, at the final totals).

    fold='affine': every level is a batch-affine add with a per-block
    shared inversion (the prep layout IS the affine layout, so one
    kernel serves level 0 and all later levels). fold='jacobian':
    the mixed-add + full-add Jacobian tree."""
    interp = mode == "interpret"
    lsub = prep.shape[-1] // cap
    if fold == "affine":
        x = prep
        if mode == "jnp":
            while x.shape[-1] > lsub:
                x = pallas_afold.afold_jnp(ops, x)
        else:
            while x.shape[-1] > lsub:
                x = pallas_afold.afold(ops, x, interp)
        if aff_out:
            return x
        return pallas_afold.aff_to_jac(ops, x, rows_jac(ops))
    assert not aff_out, "aff_out requires the affine fold family"
    if mode == "jnp":
        x = pallas_fold.level0_fold_jnp(ops, prep)
        while x.shape[-1] > lsub:
            x = pallas_fold.pair_fold_jnp(ops, x)
        return x
    x = pallas_fold.level0_fold(ops, prep, interp)
    while x.shape[-1] > lsub:
        x = pallas_fold.pair_fold(ops, x, interp)
    return x


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _group_pipeline(ops: CurveOps, cap: int, lsub: int, mode: str,
                    fold: str, aff_out: bool,
                    lane0, lane_hi, starts_s, occ_s, fenc_sorted, packed):
    """Gather + all fold levels for one group chunk as ONE dispatch
    (per-call dispatch latency through the axon tunnel is ~10 ms; a
    chunk would otherwise cost 1 + log2(cap) round trips)."""
    prep = _gather_group(
        ops, cap, lsub, lane0, lane_hi, starts_s, occ_s, fenc_sorted,
        packed
    )
    return _fold_group(ops, prep, cap, mode, fold, aff_out)


# Compiled-executable cache for _group_pipeline variants. An MSM at a
# new size compiles one pipeline PER occupancy group (~6-10 shapes);
# each Mosaic compile through the axon tunnel is minutes, and plain jit
# dispatch serializes them. Lowering+compiling every variant up front
# on a thread pool overlaps the compiles (XLA releases the GIL), which
# is the difference between ~an hour and ~minutes of cold start at
# 2^20+. Keyed by static config + operand shapes.
_GROUP_EXEC: dict = {}
_GROUP_EXEC_LOCK = __import__("threading").Lock()


def _group_exec_key(ops, cap, lsub, mode, fold, aff_out, args):
    return (
        ops.f.spec.name, type(ops.f).__name__, cap, lsub, mode, fold,
        aff_out, tuple((tuple(a.shape), str(a.dtype)) for a in args),
    )


def _group_exec(ops, cap, lsub, mode, fold, args, aff_out=False):
    key = _group_exec_key(ops, cap, lsub, mode, fold, aff_out, args)
    with _GROUP_EXEC_LOCK:
        exe = _GROUP_EXEC.get(key)
    if exe is None:
        # AOT store first: a committed artifact skips trace+lowering
        # (the dominant first-call cost on a warm compile cache —
        # utils/aot.py); fall back to plain lower+compile
        from ..utils import aot

        if aot.enabled() and mode == "pallas":
            exe = aot.compiled(
                "group_pipeline", key[:-1], args, _group_pipeline,
                static_args=(ops, cap, lsub, mode, fold, aff_out),
            )
        else:
            exe = _group_pipeline.lower(
                ops, cap, lsub, mode, fold, aff_out, *args
            ).compile()
        with _GROUP_EXEC_LOCK:
            _GROUP_EXEC[key] = exe
    return exe


# The bit-weighted totals pass (_totals_bits) is another minutes-long
# Mosaic compile, and its operand shapes depend only on (nw, half, c) —
# known BEFORE the schedule runs. Warming it on a thread as soon as the
# window config is known overlaps it with the schedule + group-pipeline
# compiles, removing it from the serial cold-start chain.
_TOT_EXEC: dict = {}
_TOT_EXEC_LOCK = __import__("threading").Lock()
_TOT_EXEC_PENDING: dict = {}


class _PendingCompile:
    """Result slot for a background compile on a daemon thread (a
    non-daemon executor thread would block process exit for the
    minutes-long Mosaic compile via concurrent.futures' atexit join)."""

    __slots__ = ("_done", "_exe", "_exc")

    def __init__(self):
        import threading

        self._done = threading.Event()
        self._exe = None
        self._exc = None

    def set(self, exe=None, exc=None):
        self._exe, self._exc = exe, exc
        self._done.set()

    def result(self):
        self._done.wait()
        if self._exc is not None:
            raise self._exc
        return self._exe


def _lower_totals(ops: CurveOps, nw: int, half: int, c: int, mode: str,
                  kind: str = "bits"):
    RJ = rows_jac(ops)
    W0 = nw * half
    fn = _totals_hier if kind == "hier" else _totals_bits
    avals = (
        jax.ShapeDtypeStruct((RJ, W0), jnp.uint32),
        jax.ShapeDtypeStruct((W0,), jnp.int32),
    )
    from ..utils import aot

    if aot.enabled() and mode == "pallas":
        statics = (ops.f.spec.name, type(ops.f).__name__, nw, half, c,
                   mode, kind)
        return aot.compiled(
            f"totals_{kind}", statics, avals, fn,
            static_args=(ops, nw, half, c, mode),
        )
    return fn.lower(ops, nw, half, c, mode, *avals).compile()


def _totals_exec(ops: CurveOps, nw: int, half: int, c: int, mode: str,
                 kind: str = "bits"):
    key = (ops.f.spec.name, type(ops.f).__name__, nw, half, c, mode, kind)
    with _TOT_EXEC_LOCK:
        exe = _TOT_EXEC.get(key)
        fut = _TOT_EXEC_PENDING.get(key)
    if exe is not None:
        return exe
    if fut is not None:
        try:
            return fut.result()
        except Exception:
            pass  # transient background-compile failure: retry inline
    exe = _lower_totals(ops, nw, half, c, mode, kind)
    with _TOT_EXEC_LOCK:
        _TOT_EXEC[key] = exe
    return exe


def _warm_totals_exec(ops: CurveOps, nw: int, half: int, c: int, mode: str,
                      kind: str = "bits"):
    """Kick off the totals-pass compile on a daemon thread."""
    import threading

    key = (ops.f.spec.name, type(ops.f).__name__, nw, half, c, mode, kind)
    with _TOT_EXEC_LOCK:
        if key in _TOT_EXEC or key in _TOT_EXEC_PENDING:
            return
        pending = _PendingCompile()
        _TOT_EXEC_PENDING[key] = pending

    def compile_it():
        try:
            exe = _lower_totals(ops, nw, half, c, mode, kind)
        except Exception as e:  # surface via result(); allow inline retry
            with _TOT_EXEC_LOCK:
                _TOT_EXEC_PENDING.pop(key, None)
            pending.set(exc=e)
            return
        with _TOT_EXEC_LOCK:
            _TOT_EXEC[key] = exe
            _TOT_EXEC_PENDING.pop(key, None)
        pending.set(exe=exe)

    threading.Thread(target=compile_it, daemon=True).start()


def _warm_group_execs(ops, mode, fold, tasks, log, aff_out=False):
    """Compile all distinct group-pipeline variants concurrently."""
    import concurrent.futures as cf

    uniq = {}
    for cap, lsub, args in tasks:
        key = _group_exec_key(ops, cap, lsub, mode, fold, aff_out, args)
        if key not in _GROUP_EXEC:
            uniq[key] = (cap, lsub, args)
    if not uniq:
        return
    log(f"compiling {len(uniq)} group pipelines in parallel")
    with cf.ThreadPoolExecutor(max_workers=min(8, len(uniq))) as ex:
        futs = [
            ex.submit(_group_exec, ops, cap, lsub, mode, fold, args,
                      aff_out)
            for cap, lsub, args in uniq.values()
        ]
        for f in futs:
            f.result()
    log("group pipelines compiled")


def _heavy_lane_total(ops: CurveOps, lane: int, occ: int, starts_s, occ_s,
                      fenc_sorted, packed, mode: str):
    """Per-lane path for buckets too occupied for group layouts: fold a
    single rank vector of width >= occ down to one point.

    The width V is quantized to powers of 4 (>= 2*TILE) so adversarial
    occupancy distributions draw from a fixed small set of kernel
    shapes instead of compiling one pipeline per pow2ceil(occ)
    (the heavy-lane fresh-compile hazard, VERDICT r3 weakness 4)."""
    V = 2 * TILE
    while V < occ:
        V <<= 2
    prep = _gather_group(
        ops, V, 1, jnp.uint32(lane), jnp.uint32(lane + 1),
        starts_s, occ_s, fenc_sorted, packed
    )
    if mode == "jnp":
        x = pallas_fold.level0_fold_jnp(ops, prep)
        while x.shape[-1] > 1:
            x = pallas_fold.pair_fold_jnp(ops, x)
        return x
    interp = mode == "interpret"
    x = pallas_fold.level0_fold(ops, prep, interp)
    while x.shape[-1] > TILE:
        x = pallas_fold.pair_fold(ops, x, interp)
    red = pallas_fold.butterfly_reduce(ops, x, interp)
    return red[:, :1]


def _pow2ceil(v: int) -> int:
    return 1 << max(v - 1, 0).bit_length() if v > 1 else 1


class Msm3Pending:
    """Dispatched-but-unfinished MSM: the device bit-weighted window
    totals U plus the fold metadata. The prover launches all 8 MSMs as
    pending handles and blocks only at proof assembly (the Waiter-future
    overlap of /root/reference/groth16/src/prover.rs:244-354)."""

    __slots__ = ("U", "nw", "c", "exps")

    def __init__(self, U, nw: int, c: int, exps=None):
        self.U = U
        self.nw = nw
        self.c = c
        self.exps = exps


def msm3(ops: CurveOps, points, scalar_limbs, c: int | None = None,
         mode: str | None = None, point_cls=None, verbose: bool = False,
         fold: str | None = None):
    """MSM Σ_i scalars_i · points_i.

    points: Jacobian batch with Z ∈ {0,1} or PackedBases; scalar_limbs:
    (L, n) plain-form u32 limbs. Returns a Jacobian batch (1,) or, with
    ``point_cls``, the host affine point (host-side window fold)."""
    if point_cls is not None:
        pending = msm3_start(ops, points, scalar_limbs, c=c, mode=mode,
                             verbose=verbose, fold=fold)
        return msm3_finish(ops, pending, point_cls)
    return _msm3_run(ops, points, scalar_limbs, c, mode, None, verbose,
                     fold)


def msm3_start(ops: CurveOps, points, scalar_limbs, c: int | None = None,
               mode: str | None = None, verbose: bool = False,
               fold: str | None = None) -> Msm3Pending:
    """Dispatch the full device pipeline; return without blocking on the
    result (XLA dispatch is async — only the tiny schedule probe syncs).

    Sizes past BELLMAN_TPU_MSM_MAX_DIRECT_LOG (default 2^18) chunk
    transparently (msm3_start_chunked): the n=2^20 _schedule compile
    (16.8M-element sort + scatter histogram) wedged the remote TPU
    compile service repeatedly in round 4, so no larger shape is ever
    compiled on the direct path — every caller (prover backend, bench,
    sharded shards) inherits the bound."""
    if mode is None:
        mode = msm2.default_mode()
    n = int(scalar_limbs.shape[-1])
    max_direct = 1 << int(__import__("os").environ.get(
        "BELLMAN_TPU_MSM_MAX_DIRECT_LOG", "18"
    ))
    if mode in ("pallas", "jnp") and n > max_direct:
        if not isinstance(points, PackedBases):
            points = PackedBases(ops, points)
        return msm3_start_chunked(ops, points, scalar_limbs, c=c,
                                  mode=mode, fold=fold, chunk=max_direct,
                                  verbose=verbose)
    return _msm3_run(ops, points, scalar_limbs, c, mode, "pending", verbose,
                     fold)


def msm3_finish(ops: CurveOps, pending: Msm3Pending, point_cls):
    """Block on a pending MSM and finish host-side (Horner over weight
    planes + MSB->LSB window fold)."""
    return _finish_host(ops, pending.U, pending.nw, pending.c, point_cls,
                        pending.exps)


def _msm3_run(ops: CurveOps, points, scalar_limbs, c, mode, finish,
              verbose: bool = False, fold: str | None = None,
              _sched=None):
    import time as _time

    _t0 = _time.time()

    def _log(msg):
        if verbose:
            print(f"[msm3 +{_time.time() - _t0:.1f}s] {msg}", flush=True)

    scalar_limbs = jnp.asarray(scalar_limbs)
    n = int(scalar_limbs.shape[-1])
    L = int(scalar_limbs.shape[0])
    if mode is None:
        mode = msm2.default_mode()
    if mode == "pallas" and n <= int(__import__("os").environ.get(
            "BELLMAN_TPU_MSM_JNP_SMALL", "64")):
        # Tiny MSMs (the prover's b_g2/b_g1 INPUT queries are 1-2
        # points, prover.rs:296-318) run the pure-jnp graph compiled by
        # plain XLA for the device: at cap=2-64 the Pallas pipelines
        # add nothing, and the tiny-shape G2 group kernel aborts the
        # Mosaic compiler ("limits[i] <= dim(i)", r4
        # logs/prover_bench_20e.err — the 2^20 full-prover blocker)
        mode = "jnp"
    fold_arg = fold
    if fold is None:
        fold = default_fold()
    if c is None:
        c = msm2.default_c(n)
    nw = num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    # tile alignment binds only the Pallas kernels; the jnp twins (CPU
    # mesh tests / dryrun) accept any W0, which admits c=4 (W0=512) —
    # 8x less fold work per shard than the smallest tile-aligned c
    assert mode != "pallas" or W0 % TILE == 0, (W0, TILE)
    C = _C(ops)
    RJ = rows_jac(ops)

    totals_kind = default_totals()
    if c < 4:  # degenerate digit split; the flat pass is fine there
        totals_kind = "bits"

    if finish == "pending" and mode == "pallas":
        _warm_totals_exec(ops, nw, half, c, mode, totals_kind)

    if isinstance(points, PackedBases):
        packed_pts, inf_mask = points.packed, points.inf_mask
    else:
        packed_pts, inf_mask = msm2.pack_points(ops, points)

    counts_dev = None
    if _sched is not None:
        # pre-dispatched schedule (msm3_start_chunked phase 1): every
        # chunk's schedule + occupancy counts are already in flight, so
        # the device_get below finds them ready instead of serializing
        # chunk k+1's schedule behind chunk k's fold dispatch
        (fenc_sorted, starts_s, occ_s, lane_order, inv_order,
         counts_dev) = _sched
    else:
        fenc_sorted, starts_s, occ_s, lane_order, inv_order = (
            msm2._schedule(L, c, nw, half, scalar_limbs, inf_mask)
        )

    # Small-n fast path: ONE group covering every lane with
    # cap = pow2ceil(n) — a lane can hold at most n points, so the rank
    # layout never truncates and the plan needs no occupancy counts.
    # That removes the blocking _occ_counts host sync AND makes the
    # pipeline shape a pure function of (curve, c, n): every shard of a
    # sharded MSM (and every run on this shape) reuses one compiled
    # executable instead of compiling data-dependent group shapes —
    # the compile-storm fix for the multichip dryrun (VERDICT r3).
    cap_all = _pow2ceil(max(2, n))
    small_slots = int(__import__("os").environ.get(
        "BELLMAN_TPU_MSM_SMALL_SLOTS", str(1 << 18)
    ))
    if cap_all * W0 <= small_slots:
        if mode != "pallas" and fold_arg is None:
            # XLA-CPU compiles the affine fold's batch-inversion scans
            # pathologically slowly (~300s+ per shape on a 1-core host
            # vs ~80s for the Jacobian tree); at toy sizes the runtime
            # difference is nil, so the CPU twin defaults to the
            # fast-compiling fold (explicit fold= still honored)
            fold = "jacobian"
        args = (jnp.uint32(0), jnp.uint32(W0), starts_s, occ_s,
                fenc_sorted, packed_pts)
        if mode == "pallas":
            exe = _group_exec(ops, cap_all, W0, mode, fold, args)
            acc_sorted = exe(*args)
        else:
            acc_sorted = _group_pipeline(
                ops, cap_all, W0, mode, fold, False, *args
            )
        _log(f"small-n single-group fold done (cap={cap_all})")
        return _finish_totals(ops, nw, half, c, W0, mode, finish,
                              totals_kind, acc_sorted, inv_order,
                              verbose, _log)

    if counts_dev is None:
        counts_dev = _occ_counts(occ_s, MAX_LOG_CAP)
    counts = np.asarray(jax.device_get(counts_dev))
    groups = _plan_groups(counts)
    _log(f"schedule done; groups={groups}")

    heavy_cap_limit = CHUNK_SLOTS // TILE  # cap beyond which slots blow up
    results = []  # (lane_lo, lane_hi, (3C, n_lanes) array), sorted order
    heavy_cols = []

    # plan first: group chunks are collected so every distinct pipeline
    # shape can compile concurrently before any dispatch
    plan = []  # (lo, hi, kind, payload)
    group_tasks = []
    for cap, lo, hi in groups:
        lg = hi - lo
        if mode == "jnp":
            # CPU twins have no tile-alignment constraints: one exact
            # chunk per group, no padding, no heavy path
            plan.append((lo, hi, "jnp", cap))
            continue
        if cap > heavy_cap_limit or lg * max(2 * TILE, cap) < cap * TILE:
            plan.append((lo, hi, "heavy", None))
            continue
        # lsub >= TILE: every fold level (down to width lsub) must stay
        # tile-aligned for the Pallas kernels
        lsub = max(TILE, min(_pow2ceil(lg), CHUNK_SLOTS // cap))
        chunk_tasks = []
        off = lo
        while off < hi:
            args = (jnp.uint32(off), jnp.uint32(hi), starts_s, occ_s,
                    fenc_sorted, packed_pts)
            chunk_tasks.append((cap, lsub, args))
            group_tasks.append((cap, lsub, args))
            off += lsub
        plan.append((lo, hi, "group", chunk_tasks))

    if group_tasks:
        _warm_group_execs(ops, mode, fold, group_tasks, _log)

    for lo, hi, kind, payload in plan:
        lg = hi - lo
        if kind == "jnp":
            # pow2-quantized width: exact-lg shapes made XLA-CPU compile
            # one pipeline per occupancy-group width PER SHARD on the
            # virtual mesh; padding costs nothing there
            lsub = _pow2ceil(lg)
            results.append((lo, hi, _group_pipeline(
                ops, payload, lsub, mode, fold, False, jnp.uint32(lo),
                jnp.uint32(hi), starts_s, occ_s, fenc_sorted, packed_pts
            )[:, :lg]))
            continue
        if kind == "heavy":
            # per-lane heavy/sparse path
            occ_host = np.asarray(
                jax.device_get(
                    jax.lax.dynamic_slice_in_dim(occ_s, lo, lg)
                )
            )
            cols = []
            for j in range(lg):
                cols.append(
                    _heavy_lane_total(
                        ops, lo + j, int(occ_host[j]), starts_s, occ_s,
                        fenc_sorted, packed_pts, mode
                    )
                )
            results.append((lo, hi, jnp.concatenate(cols, axis=1)))
            heavy_cols.append(lg)
            continue
        chunks = []
        for cap, lsub, args in payload:
            exe = _group_exec(ops, cap, lsub, mode, fold, args)
            chunks.append(exe(*args))
        arr = chunks[0] if len(chunks) == 1 else jnp.concatenate(
            chunks, axis=1
        )
        results.append((lo, hi, arr[:, :lg]))

    if verbose:
        for _, _, a in results:
            jax.block_until_ready(a)
        _log(f"folds done ({len(results)} groups, heavy={heavy_cols})")

    # assemble dense lanes in occupancy-sorted order; empty lanes = inf
    results.sort(key=lambda t: t[0])
    parts = []
    pos = 0
    for lo, hi, arr in results:
        assert lo == pos, (lo, pos)
        parts.append(arr)
        pos = hi
    if pos < W0:
        parts.append(jnp.zeros((RJ, W0 - pos), jnp.uint32))
    acc_sorted = jnp.concatenate(parts, axis=1)

    return _finish_totals(ops, nw, half, c, W0, mode, finish, totals_kind,
                          acc_sorted, inv_order, verbose, _log)


def _finish_totals(ops: CurveOps, nw: int, half: int, c: int, W0: int,
                   mode: str, finish, totals_kind: str, acc_sorted,
                   inv_order, verbose, _log):
    """Shared tail: occupancy-sorted per-lane bucket sums -> window
    totals (pending handle) or the folded Jacobian result."""
    if finish == "pending":
        # weighted window totals T_w = Σ_b b · S_{w,b} as log-depth
        # folds: 'hier' (two-level digit split, default) or 'bits'
        # (flat bit planes) — both replace sequential bucket suffix
        # scans; the host Horner consumes the per-plane exponents
        exps = totals_exps(c, totals_kind)
        if mode == "pallas":
            # cast pins the AOT signature: the lowered executable
            # hard-codes int32, independent of argsort's output dtype
            U = _totals_exec(ops, nw, half, c, mode, totals_kind)(
                acc_sorted, inv_order.astype(jnp.int32)
            )
        else:
            fn = _totals_hier if totals_kind == "hier" else _totals_bits
            U = fn(ops, nw, half, c, mode, acc_sorted, inv_order)
        if verbose:
            jax.block_until_ready(U)
            _log(f"window totals done ({totals_kind})")
        return Msm3Pending(U, nw, c, exps)

    tot = _totals(ops, nw, half, mode, acc_sorted, inv_order)
    if verbose:
        jax.block_until_ready(tot)
        _log("bucket totals done")
    res = msm2._fold_windows(ops, nw, c, tot)
    return msm2._unpack1(ops, res)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _totals(ops: CurveOps, nw: int, half: int, mode: str,
            acc_sorted, inv_order):
    acc_dense = jnp.take(acc_sorted, inv_order, axis=1)
    return msm2.bucket_totals(
        ops, acc_dense, nw, half, "pallas" if mode == "pallas" else mode
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _totals_bits(ops: CurveOps, nw: int, half: int, c: int, mode: str,
                 acc_sorted, inv_order):
    """Per-(window, bit) masked bucket sums U_{w,k} as (3C, K, 128)
    with window w in lane w of each k plane.

    Layout: b-major lanes (lb = (b-1)·nw + w) so pairwise folds of the
    lane axis always combine same-window lanes; K = c bit planes with
    Z masked to 0 where bit k of b is clear."""
    C = _C(ops)
    RJ = rows_jac(ops)
    W0 = nw * half
    K = c

    # b-major un-permute: dense_b[:, lb] = bucket sum of (w, b)
    lb = jnp.arange(W0, dtype=jnp.int32)
    w = lb % nw
    bm1 = lb // nw
    perm = jnp.take(inv_order, w * half + bm1)
    dense_b = jnp.take(acc_sorted, perm, axis=1)      # (3C, W0)

    b = (bm1 + 1).astype(jnp.uint32)                  # bucket weight
    k = jnp.arange(K, dtype=jnp.uint32)[:, None]
    bits = ((b[None, :] >> k) & 1) != 0               # (K, W0)

    if mode == "pallas":
        # K-leading layout: each kernel block is one (RJ, lanes) plane
        # (Mosaic wants the trailing block dims divisible by (8, 128))
        xy = jnp.broadcast_to(
            dense_b[None, : 2 * C, :], (K, 2 * C, W0)
        )
        z = jnp.where(bits[:, None, :], dense_b[None, 2 * C :, :], 0)
        z = jnp.broadcast_to(z, (K, C, W0))
        planes = jnp.concatenate([xy, z], axis=1)      # (K, RJ, W0)
        while planes.shape[-1] > 128:
            planes = pallas_fold.pair_fold3(ops, planes)
        U = pallas_fold.window_reduce(ops, planes, nw)  # (K, RJ, 128)
        return jnp.swapaxes(U, 0, 1)                    # (RJ, K, 128)

    xy = jnp.broadcast_to(
        dense_b[: 2 * C, None, :], (2 * C, K, W0)
    )
    z = jnp.where(bits[None, :, :], dense_b[2 * C :, None, :], 0)
    z = jnp.broadcast_to(z, (C, K, W0))
    planes = jnp.concatenate([xy, z], axis=0)          # (RJ, K, W0)
    while planes.shape[-1] > 128 and planes.shape[-1] % 2 == 0:
        planes = pallas_fold.pair_fold3_jnp(ops, planes)
    # CPU path: W0 can be small; pad lanes (as infinity) up to 128
    if planes.shape[-1] < 128:
        pad = 128 // planes.shape[-1]
        reps = [planes] + [
            jnp.zeros_like(planes) for _ in range(pad - 1)
        ]
        # window lanes repeat every nw: tile keeps (b_group, w) layout
        planes = jnp.concatenate(reps, axis=-1)
    return pallas_fold.window_reduce_jnp(ops, planes, nw)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _totals_hier(ops: CurveOps, nw: int, half: int, c: int, mode: str,
                 acc_sorted, inv_order):
    """Hierarchical window totals: two-level digit split of the bucket
    weight b = u*2^lo + v + 1 (u < 2^hi, v < 2^lo, lo + hi = c - 1):

        T_w = 2^lo * sum_u u * B_{u,w}  +  sum_v (v+1) * C_{v,w}
        B_u = sum_v S_{u,v}   (fold v: lo unmasked pairwise folds)
        C_v = sum_u S_{u,v}   (fold u: hi unmasked pairwise folds)

    The flat bit-weighted pass (_totals_bits) masks FIRST and folds
    c planes of W0 lanes = c*W0/ adds total; here the dense (unmasked)
    folds shrink the lane count to 2^hi*nw / 2^lo*nw BEFORE any bit
    plane is built, so the total is ~2*W0 adds + O(c * 2^hi * nw) —
    ~c/2 x fewer adds and no (c, RJ, W0) broadcast (3.2 GB at c=16 G1).
    Output: (RJ, c, 128) planes whose weight exponents are
    totals_exps(c, 'hier'); the host Horner consumes them directly."""
    C = _C(ops)
    RJ = rows_jac(ops)
    W0 = nw * half
    lo, hi = _hier_split(c)

    # two dense layouts from one permutation source: pairwise folds
    # remove the TOP bit of the lane index, so the axis to sum over is
    # placed in the high bits (u for C_v, v for B_u)
    lb = jnp.arange(W0, dtype=jnp.int32)
    w = lb % nw
    t = lb // nw
    perm_uvw = jnp.take(inv_order, w * half + t)       # t = u*2^lo + v
    v_ = t >> hi
    u_ = t & ((1 << hi) - 1)
    perm_vuw = jnp.take(inv_order, w * half + (u_ * (1 << lo) + v_))

    def vals_c(W):
        return jnp.arange(W, dtype=jnp.uint32) // nw + 1   # v+1 per lane

    def vals_b(W):
        return jnp.arange(W, dtype=jnp.uint32) // nw       # u per lane

    if mode == "pallas":
        d_uvw = jnp.take(acc_sorted, perm_uvw, axis=1)
        d_vuw = jnp.take(acc_sorted, perm_vuw, axis=1)
        pair = jnp.stack([d_uvw, d_vuw], axis=0)           # (2, RJ, W0)
        for _ in range(lo):
            pair = pallas_fold.pair_fold3(ops, pair)
        cv, bu = pair[0], pair[1]
        for _ in range(hi - lo):
            cv = pallas_fold.pair_fold3(ops, cv[None])[0]
        # cv: (RJ, 2^lo * nw) = C_{v,w}; bu: (RJ, 2^hi * nw) = B_{u,w}

        def mask_planes(arr, vals, K):
            W = arr.shape[-1]
            k = jnp.arange(K, dtype=jnp.uint32)[:, None]
            bits = ((vals[None, :] >> k) & 1) != 0          # (K, W)
            xy = jnp.broadcast_to(arr[None, : 2 * C, :], (K, 2 * C, W))
            z = jnp.where(bits[:, None, :], arr[None, 2 * C :, :], 0)
            z = jnp.broadcast_to(z, (K, C, W))
            return jnp.concatenate([xy, z], axis=1)

        planes_c = mask_planes(cv, vals_c(cv.shape[-1]), lo + 1)
        planes_b = mask_planes(bu, vals_b(bu.shape[-1]), hi)
        for _ in range(hi - lo):
            planes_b = pallas_fold.pair_fold3(ops, planes_b)
        planes = jnp.concatenate([planes_c, planes_b], axis=0)
        while planes.shape[-1] > 128:
            planes = pallas_fold.pair_fold3(ops, planes)
        U = pallas_fold.window_reduce(ops, planes, nw)      # (c, RJ, 128)
        return jnp.swapaxes(U, 0, 1)                        # (RJ, c, 128)

    # CPU / interpret twin: rows-leading (RJ, K, W) layout
    d_uvw = jnp.take(acc_sorted, perm_uvw, axis=1)
    d_vuw = jnp.take(acc_sorted, perm_vuw, axis=1)
    for _ in range(hi):
        d_uvw = pallas_fold.pair_fold_jnp(ops, d_uvw)
    for _ in range(lo):
        d_vuw = pallas_fold.pair_fold_jnp(ops, d_vuw)

    def mask_planes_jnp(arr, vals, K):
        W = arr.shape[-1]
        k = jnp.arange(K, dtype=jnp.uint32)[:, None]
        bits = ((vals[None, :] >> k) & 1) != 0              # (K, W)
        xy = jnp.broadcast_to(arr[: 2 * C, None, :], (2 * C, K, W))
        z = jnp.where(bits[None, :, :], arr[2 * C :, None, :], 0)
        z = jnp.broadcast_to(z, (C, K, W))
        return jnp.concatenate([xy, z], axis=0)             # (RJ, K, W)

    planes_c = mask_planes_jnp(d_uvw, vals_c(d_uvw.shape[-1]), lo + 1)
    planes_b = mask_planes_jnp(d_vuw, vals_b(d_vuw.shape[-1]), hi)
    for _ in range(hi - lo):
        planes_b = pallas_fold.pair_fold3_jnp(ops, planes_b)
    planes = jnp.concatenate([planes_c, planes_b], axis=1)
    while planes.shape[-1] > 128 and planes.shape[-1] % 2 == 0:
        planes = pallas_fold.pair_fold3_jnp(ops, planes)
    if planes.shape[-1] < 128:
        pad = 128 // planes.shape[-1]
        reps = [planes] + [jnp.zeros_like(planes) for _ in range(pad - 1)]
        planes = jnp.concatenate(reps, axis=-1)
    return pallas_fold.window_reduce_jnp(ops, planes, nw)


@functools.partial(jax.jit, static_argnums=(0,))
def _combine_totals(ops: CurveOps, U1, U2):
    """Plane-wise Jacobian add of two window-totals tensors
    (RJ, K, nl) — the cross-chunk accumulator of the chunked MSM."""
    from . import curve as _curve

    RJ, K, nl = U1.shape
    a = _curve.unpack_jac(ops, U1.reshape(RJ, K * nl))
    b = _curve.unpack_jac(ops, U2.reshape(RJ, K * nl))
    return _curve.pack_jac(ops, ops.add(a, b)).reshape(RJ, K, nl)


@functools.partial(jax.jit, static_argnums=(0,))
def _dense_first(ops: CurveOps, acc_sorted_aff, inv_order):
    """Occupancy-sorted affine lanes -> dense (w*half + b-1) order."""
    return jnp.take(acc_sorted_aff, inv_order, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _dense_combine(ops: CurveOps, interpret: bool, acc_dense,
                   acc_sorted_aff, inv_order):
    """acc_dense (RAFF, W0) += chunk lanes (un-permuted), as ONE
    batch-affine fold level over (RAFF, 2*W0)."""
    dense = jnp.take(acc_sorted_aff, inv_order, axis=1)
    both = jnp.concatenate([acc_dense, dense], axis=1)
    return pallas_afold.afold(ops, both, interpret)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _totals_from_dense(ops: CurveOps, nw: int, half: int, c: int,
                       mode: str, kind: str, dense_aff):
    """Final window-totals pass over the ACCUMULATED dense affine
    lanes: one aff->Jacobian conversion + the standard totals pass
    with an identity un-permute (runs once per MSM, however many
    chunks fed the accumulator)."""
    jac = pallas_afold.aff_to_jac(ops, dense_aff, rows_jac(ops))
    fn = _totals_hier if kind == "hier" else _totals_bits
    ident = jnp.arange(nw * half, dtype=jnp.int32)
    return fn(ops, nw, half, c, mode, jac, ident)


_DENSE_EXEC: dict = {}


def _dense_exec_cached(name, jitfn, static_args, args):
    """Compiled-executable cache (AOT-store-backed) for the dense-flow
    jit pieces — fixed shapes, one variant per (curve, config)."""
    from ..utils import aot

    statics = tuple(
        (s.f.spec.name, type(s.f).__name__) if isinstance(s, CurveOps)
        else s
        for s in static_args
    )
    key = (name, statics,
           tuple((tuple(a.shape), str(a.dtype)) for a in args))
    exe = _DENSE_EXEC.get(key)
    if exe is None:
        if aot.enabled():
            exe = aot.compiled(name, statics, args, jitfn,
                               static_args=static_args)
        else:
            exe = jitfn.lower(*static_args, *args).compile()
        _DENSE_EXEC[key] = exe
    return exe


def _chunk_dense_aff(ops: CurveOps, c, nw, half, W0, mode, fold, sched,
                     pb, groups, _log):
    """One chunk of the dense-accumulation flow: group folds with
    AFFINE outputs, assembled in occupancy-sorted order (RAFF, W0).

    Sparse groups are forced through the group path (padding accepted)
    so every lane lands in the affine array; the caller guarantees no
    group exceeds the heavy cap."""
    fenc, starts_s, occ_s, lane_order, inv_order, _counts = sched
    RAFF = pallas_afold.rows_aff(ops)
    packed_pts = pb.packed
    group_tasks = []
    plan = []
    for cap, lo, hi in groups:
        lg = hi - lo
        lsub = max(TILE, min(_pow2ceil(lg), CHUNK_SLOTS // cap))
        chunk_tasks = []
        off = lo
        while off < hi:
            args = (jnp.uint32(off), jnp.uint32(hi), starts_s, occ_s,
                    fenc, packed_pts)
            chunk_tasks.append((cap, lsub, args))
            group_tasks.append((cap, lsub, args))
            off += lsub
        plan.append((lo, hi, chunk_tasks))
    _warm_group_execs(ops, mode, fold, group_tasks, _log, aff_out=True)

    results = []
    for lo, hi, chunk_tasks in plan:
        lg = hi - lo
        outs = []
        for cap, lsub, args in chunk_tasks:
            exe = _group_exec(ops, cap, lsub, mode, fold, args,
                              aff_out=True)
            outs.append(exe(*args))
        arr = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
        results.append((lo, hi, arr[:, :lg]))
    results.sort(key=lambda t: t[0])
    parts_, pos = [], 0
    for lo, hi, arr in results:
        assert lo == pos, (lo, pos)
        parts_.append(arr)
        pos = hi
    if pos < W0:
        parts_.append(jnp.zeros((RAFF, W0 - pos), jnp.uint32))
    acc_sorted = jnp.concatenate(parts_, axis=1)
    return acc_sorted, inv_order.astype(jnp.int32)


def msm3_start_chunked(ops: CurveOps, points, scalar_limbs,
                       c: int | None = None, mode: str | None = None,
                       fold: str | None = None, chunk: int = 1 << 20,
                       verbose: bool = False) -> Msm3Pending:
    """MSM over n > chunk bases as a sequence of chunk-sized pipeline
    dispatches accumulating ON DEVICE.

    Bounds the pipeline working set (schedule/fenc/gather arrays are
    O(chunk), not O(n)) the way the reference streams bases through
    ``Source::next/skip`` (/root/reference/src/multiexp.rs:26-86) —
    the 2^24 single-chip path. Every chunk shares (c, nw) and equal
    chunk sizes make the pipeline shapes coincide across chunks, so
    compiles amortize.

    Accumulation (affine fold family, the default): each chunk's
    per-lane bucket sums stay AFFINE, are un-permuted to the dense
    (window, bucket) order, and combine into a running (RAFF, W0)
    accumulator with ONE batch-affine fold level per chunk — the O(W0)
    window-totals pass then runs ONCE at the end instead of once per
    chunk (round-4's per-chunk totals were ~2*W0 Jacobian adds each,
    the dominant per-chunk overhead). Chunks whose occupancy needs the
    heavy path (bucket > CHUNK_SLOTS/TILE points, e.g. adversarial
    same-scalar floods) fall back to the legacy per-chunk totals flow;
    both accumulators merge at the end via the plane-wise combine.

    ``points``: PackedBases (sliced per chunk, zero-copy views) or a
    sequence of per-chunk PackedBases for host-streamed uploads."""
    scalar_limbs = jnp.asarray(scalar_limbs)
    n = int(scalar_limbs.shape[-1])
    if c is None:
        c = msm2.default_c(n)  # window size follows FULL n, not chunk
    if isinstance(points, PackedBases):
        assert points.n == n, (points.n, n)
        # slices are materialized LAZILY per wave (each device slice is
        # an eager XLA copy; 64 upfront slices at 2^24 held 2 GiB of
        # HBM for the whole MSM — r5 run-2 OOM)
        parts = [
            (off, None)
            for off in range(0, n, chunk)
        ]
    else:
        parts, off = [], 0
        for pb in points:
            parts.append((off, pb))
            off += pb.n
        assert off == n, (off, n)
    if mode is None:
        mode = msm2.default_mode()
    if fold is None:
        fold = default_fold() if mode == "pallas" else "jacobian"
    use_dense = mode == "pallas" and fold == "affine"
    totals_kind = default_totals() if c >= 4 else "bits"
    L = int(scalar_limbs.shape[0])
    nw = num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    # Chunks run in WAVES: within a wave, every chunk's schedule +
    # occupancy counts dispatch before any fold work, so the per-chunk
    # blocking device_get of the counts finds ready data instead of
    # serializing chunk k+1's schedule behind chunk k's folds (round 4:
    # 2^22 ran at 0.60x the 2^20 rate fully serialized). The wave size
    # is the in-library backpressure bound (the reference's 4x-threads
    # spawn cap, /root/reference/src/multicore.rs:14-18): each enqueued
    # chunk holds its gather/fold scratch from dispatch time — a
    # fully-async 16-chunk queue exhausted the 16 GB HBM (r4 run 5),
    # and wave=2 at n=2^24 did too (r5 run 1: 3 GiB resident inputs +
    # two ~4.3 GiB chunk transients). Auto-size against the HBM
    # envelope: per-chunk transient ~= nw*chunk slots, <=2x rank
    # padding, x2 packed->limb unpack, x2 live fold/inversion
    # temporaries, x packed rows x 4 B.
    import os as _os

    _wave_env = _os.environ.get("BELLMAN_TPU_MSM_CHUNK_WAVE", "")
    rows_packed = int(
        (points if isinstance(points, PackedBases) else parts[0][1])
        .packed.shape[0]
    )
    if _wave_env:
        wave = max(1, int(_wave_env))
    else:
        budget_b = float(_os.environ.get(
            "BELLMAN_TPU_HBM_BUDGET_GB", "10")) * 2**30
        resident_b = (
            n * rows_packed * 4          # full packed bases
            + n * L * 4                  # scalar limbs
        )
        per_chunk_b = nw * chunk * 2 * 2 * 2 * rows_packed * 4
        wave = max(1, min(4, int((budget_b - resident_b) // per_chunk_b)))
    heavy_cap_limit = CHUNK_SLOTS // TILE
    pend = None          # legacy U-plane accumulator (heavy chunks)
    dense = None         # (RAFF, W0) dense affine accumulator
    exps = totals_exps(c, totals_kind)

    def _pad_part(pb, sl_k):
        """Pad a short trailing chunk to the uniform chunk size with
        zero scalars (digit-free, occupancy 0 — inert) so every chunk
        reuses the SAME pipeline shapes (the h query is 2^k - 1 points,
        prover.rs:239-241 — an exact-size last chunk would compile a
        whole fresh shape family)."""
        pad = chunk - pb.n
        packed = jnp.concatenate(
            [pb.packed,
             jnp.broadcast_to(pb.packed[:, :1],
                              (pb.packed.shape[0], pad))], axis=1)
        inf = jnp.concatenate([pb.inf_mask, jnp.zeros((pad,), bool)])
        sl_p = jnp.concatenate(
            [sl_k, jnp.zeros((sl_k.shape[0], pad), sl_k.dtype)], axis=1)
        return PackedBases(None, None, _packed=packed, _inf=inf), sl_p

    for w0 in range(0, len(parts), wave):
        scheds = []
        for off, pb in parts[w0 : w0 + wave]:
            if pb is None:
                pb = points.slice(off, min(off + chunk, n))
            sl_k = scalar_limbs[:, off : off + pb.n]
            if len(parts) > 1 and pb.n < chunk:
                pb, sl_k = _pad_part(pb, sl_k)
            fenc, starts, occ, lane_order, inv_order = msm2._schedule(
                L, c, nw, half, sl_k, pb.inf_mask
            )
            scheds.append((sl_k, pb,
                           (fenc, starts, occ, lane_order, inv_order,
                            _occ_counts(occ, MAX_LOG_CAP))))
        for sl_k, pb, sched in scheds:
            counts = np.asarray(jax.device_get(sched[-1]))
            groups = _plan_groups(counts)
            heavy = any(cap > heavy_cap_limit for cap, _, _ in groups)
            if use_dense and not heavy:
                acc_sorted, inv32 = _chunk_dense_aff(
                    ops, c, nw, half, W0, mode, fold, sched, pb, groups,
                    (lambda m: None) if not verbose else print,
                )
                if dense is None:
                    exe = _dense_exec_cached(
                        "dense_first", _dense_first, (ops,),
                        (acc_sorted, inv32),
                    )
                    dense = exe(acc_sorted, inv32)
                else:
                    exe = _dense_exec_cached(
                        "dense_combine", _dense_combine, (ops, False),
                        (dense, acc_sorted, inv32),
                    )
                    dense = exe(dense, acc_sorted, inv32)
                continue
            p = _msm3_run(ops, pb, sl_k, c, mode, "pending", verbose,
                          fold, _sched=sched)
            if pend is None:
                pend = p
            else:
                assert (p.nw, p.c, p.exps) == (pend.nw, pend.c, pend.exps)
                pend = Msm3Pending(
                    _combine_totals(ops, pend.U, p.U), pend.nw, pend.c,
                    pend.exps,
                )
    if dense is not None:
        exe = _dense_exec_cached(
            "totals_dense", _totals_from_dense,
            (ops, nw, half, c, mode, totals_kind), (dense,),
        )
        U = exe(dense)
        p = Msm3Pending(U, nw, c, exps)
        if pend is None:
            pend = p
        else:
            assert (p.nw, p.c, p.exps) == (pend.nw, pend.c, pend.exps)
            pend = Msm3Pending(
                _combine_totals(ops, pend.U, p.U), pend.nw, pend.c,
                pend.exps,
            )
    return pend


def msm3_chunked(ops: CurveOps, points, scalar_limbs, point_cls,
                 c: int | None = None, mode: str | None = None,
                 fold: str | None = None, chunk: int = 1 << 20,
                 verbose: bool = False):
    """Chunked MSM, finished to a host point (see msm3_start_chunked)."""
    pend = msm3_start_chunked(ops, points, scalar_limbs, c=c, mode=mode,
                              fold=fold, chunk=chunk, verbose=verbose)
    return msm3_finish(ops, pend, point_cls)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _horner_planes(ops: CurveOps, exps: tuple, U):
    """Device Horner over the K weight planes at full lane width:
    (RJ, K, nl) -> (RJ, nl) with out = sum_j 2^exps[j] * U[:, j].

    One dispatch instead of the old host loop (which converted K*nw
    points and did the Horner in Python bigints — ~150 ms constant per
    MSM, dominant at small n). The main ladder is a lax.scan whose body
    (one double + one add) traces ONCE, so the graph stays small enough
    to compile quickly; only duplicate-exponent plane merges unroll
    (exactly one for the hier totals)."""
    from . import curve as _curve

    RJ, K, nl = U.shape
    emax = max(exps)
    planes: list = [None] * (emax + 1)
    for j, e in enumerate(exps):
        pj = U[:, j]
        if planes[e] is None:
            planes[e] = pj
        else:
            planes[e] = _curve.pack_jac(ops, ops.add(
                _curve.unpack_jac(ops, planes[e]),
                _curve.unpack_jac(ops, pj)))
    ident = jnp.zeros((RJ, nl), jnp.uint32)           # Z = 0 identity
    P = jnp.stack([p if p is not None else ident
                   for p in reversed(planes)])        # e = emax first

    def body(acc, pe):
        a = ops.double(_curve.unpack_jac(ops, acc))
        a = ops.add(a, _curve.unpack_jac(ops, pe))
        return _curve.pack_jac(ops, a), None

    acc, _ = jax.lax.scan(body, ident, P)
    return acc


def _finish_host(ops: CurveOps, U, nw: int, c: int, point_cls,
                 exps=None):
    """Device Horner over weight planes, then the host MSB->LSB window
    fold over nw points.

    exps[j] is plane j's weight exponent (T_w = sum_j 2^exps[j] *
    U[:, j, w]); None means plane j has weight 2^j (the 'bits' pass)."""
    from . import pallas_kernels as pk
    from .curve import jacobian_to_host

    C = _C(ops)
    K = U.shape[1]
    if exps is None:
        exps = tuple(range(K))
    exps = tuple(exps)
    if pk.enabled():
        T = _dense_exec_cached("horner", _horner_planes, (ops, exps),
                               (U,))(U)
        Tw = T[: 3 * C, :nw]                          # (3C, nw)
        totals = jacobian_to_host(ops, msm2._unpack1(ops, Tw), point_cls)
        return msm2.fold_host(totals, nw, c, point_cls.identity())

    # CPU path: the host-bigint Horner (XLA-CPU compiles the unrolled
    # device Horner's ~500 scan chains for minutes; host Python is
    # instant at these sizes and the CPU path is tests-only)
    by_exp: dict = {}
    for j, e in enumerate(exps):
        by_exp.setdefault(e, []).append(j)
    Uw = U[:, :, :nw].reshape(U.shape[0], K * nw)     # (3C, K*nw)
    pts = jacobian_to_host(ops, msm2._unpack1(ops, Uw), point_cls)
    totals = []
    for w in range(nw):
        t = point_cls.identity()
        for e in reversed(range(max(exps) + 1)):
            t = t.double()
            for j in by_exp.get(e, ()):
                t = t + pts[j * nw + w]
        totals.append(t)
    return msm2.fold_host(totals, nw, c, point_cls.identity())
