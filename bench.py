"""Benchmark harness. Prints ONE JSON result line per completed stage:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
(the last line printed is the largest completed size — the headline).

Headline metric: single-chip G1 Pippenger MSM throughput (points/s) —
the prover's dominant kernel (the reference benches the same kernel:
/root/reference/benches/slow.rs at 2^16; BASELINE.json asks for 2^20+).
Kernel: ops/msm3.py tree-fold pipeline (signed windows, occupancy-
grouped gathers, log-depth Pallas folds).

The harness is STAGED (2^16 -> 2^18 -> 2^20 by default) and emits the
JSON line after EVERY completed stage, so a budget kill still leaves
the last completed stage on record (round 2 ran one monolithic 2^20
config and timed out before printing anything — BENCH_r02.json was
empty). A wall-clock budget (BENCH_BUDGET_S) is checked between stages
and the process exits 0 with whatever landed.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), and
this image has no Rust toolchain to measure bellman itself, so the
denominator is the documented estimate for bellman's multicore CPU
Pippenger: ~1.0e6 points/s for 2^20 G1 MSM on a modern many-core CPU
(criterion harness class; see PERF.md "CPU baseline provenance").

``roofline_frac``: measured vs the speed-of-light arithmetic bound at
the chip's honestly-calibrated u32 VPU-op peak (benches/op_probe.py:
~1.55e12 marginal u32 ops/s on v5e; block_until_ready does not
synchronize through the axon tunnel, so timing syncs use the host
finish / device_get) — the BASELINE.json north star is defined in
these units (2^24 >= 70%).

Env knobs: BENCH_MSM_STAGES (default "16,18,20,22"), BENCH_MSM_C (16),
BENCH_MSM_CHUNK_LOG (18 — stages above it run the chunked
accumulator), BENCH_BUDGET_S (450), BENCH_ITERS (3), BENCH_FFT (1),
BENCH_PEAK_U32_PER_S (1.55e12, the v5e calibration).
"""

import json
import os
import sys
import time
import traceback

import numpy as np


BASELINE_MSM_POINTS_PER_S = 1.0e6  # bellman multicore CPU class (see above)
T0 = time.time()


def elapsed() -> float:
    return time.time() - T0


def log(msg: str) -> None:
    print(f"[bench +{elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


def main():
    # keep chunk waves shallow for the bench ladder: each enqueued chunk
    # execution holds its ~2.2 GB prep scratch from dispatch time, so a
    # deep async queue multiplies temp memory (r4 run6/7 OOMs)
    os.environ.setdefault("BELLMAN_TPU_MSM_CHUNK_WAVE", "2")
    stages = [
        int(s)
        for s in os.environ.get("BENCH_MSM_STAGES", "16,18,20,22").split(",")
        if s.strip()
    ]
    c = int(os.environ.get("BENCH_MSM_C", "16"))
    budget = float(os.environ.get("BENCH_BUDGET_S", "450"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    peak = float(os.environ.get("BENCH_PEAK_U32_PER_S", "1.55e12"))
    do_fft = os.environ.get("BENCH_FFT", "1") not in ("0", "")
    n_max = 1 << max(stages)

    import jax
    import jax.numpy as jnp
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, fft, limbs, msm2, msm3
    from bellman_tpu.utils import profiling

    spec = limbs.spec_for("bls_fr")
    spec_fq = limbs.spec_for("bls_fq")
    ops = curve.g1_ops()
    rng = np.random.default_rng(0)

    # synthetic affine points: cheap to build at scale (random multiples
    # of the generator would cost a host scalar-mult per point), so take
    # a small pool of distinct points and tile it — bucket/window
    # statistics and arithmetic cost are scalar-driven, not
    # point-value-driven (gather locality caveat documented in PERF.md).
    pool = 64
    g = bls.G1Affine.generator()
    pool_pts = [g.mul_int(int(k) + 1) for k in rng.integers(1, 2**62, pool)]
    xs = np.asarray(spec_fq.to_mont_host([int(p.x) for p in pool_pts]),
                    dtype=np.uint32)
    ys = np.asarray(spec_fq.to_mont_host([int(p.y) for p in pool_pts]),
                    dtype=np.uint32)
    # uniform scalars < r: random 16-bit limbs, top limb below r's top
    # limb (a zeroed top limb would skew the digit distribution)
    scalars_np = np.frombuffer(rng.bytes(n_max * 32), dtype="<u2").reshape(
        n_max, 16
    ).T.astype(np.uint32)
    scalars_np[15] = rng.integers(0, int(bls.R >> 240), n_max,
                                  dtype=np.uint32)

    def stage_inputs(n):
        """Per-stage device inputs, packed fresh and freed at stage end.

        Keeping one resident 2^24 input set alive across the ladder
        crowded the 16 GB HBM — every stage's working buffers then
        fought a ~12 GB static floor (r4 runs 6/7 OOMs + 40% slower
        warm iterations). Packing per stage costs seconds."""
        X = jnp.asarray(np.tile(xs, (1, n // pool)))
        Y = jnp.asarray(np.tile(ys, (1, n // pool)))
        packed = msm2.PackedBases(ops, ops.from_affine(X, Y))
        sl = jnp.asarray(scalars_np[:, :n])
        jax.device_get(packed.packed[:1, :1])  # honest sync (axon)
        return packed, sl

    result = None
    last_first_s = 0.0
    for size_log in sorted(stages):
        if result is not None and elapsed() > budget * 0.7:
            log(f"budget: skipping 2^{size_log} (elapsed {elapsed():.0f}s "
                f"of {budget:.0f}s)")
            break
        if result is not None and last_first_s > 0.8 * max(
                0.0, budget - elapsed()):
            # the previous stage paid a cold compile; every larger stage
            # has its own (bigger) pipeline shapes and will cost at
            # least as much — skip only when the remaining budget can't
            # plausibly cover it (ADVICE r3: a fixed 120s threshold
            # starved large stages even with most of the budget left)
            log(f"cold cache: skipping 2^{size_log} (last first-call "
                f"{last_first_s:.0f}s vs {budget - elapsed():.0f}s left)")
            break
        n = 1 << size_log
        t0 = time.time()
        packed, sl = stage_inputs(n)
        log(f"packed 2^{size_log} bases in {time.time() - t0:.1f}s")

        # stages past the chunk size run the chunked accumulator
        # (msm3.msm3_start_chunked): each chunk reuses the warm
        # chunk-sized pipeline shapes, so larger stages pay no new
        # Mosaic compiles. Default 2^18: the n=2^20 _schedule compile
        # (16.8M-element sort_key_val + scatter histogram) wedged the
        # remote compile service twice in round 4 (runs 2 and 3, >25
        # min each, zero CPU) — no shape beyond n=2^18 is ever
        # compiled on the direct path.
        chunk_log = int(os.environ.get("BENCH_MSM_CHUNK_LOG", "18"))

        def run_msm():
            if size_log > chunk_log:
                return msm3.msm3_chunked(
                    ops, packed, sl, bls.G1Affine, c=c,
                    chunk=1 << chunk_log,
                )
            return msm3.msm3(ops, packed, sl, c=c, point_cls=bls.G1Affine)

        try:
            t0 = time.time()
            r = run_msm()
            first_s = time.time() - t0
        except Exception as e:  # noqa: BLE001 — flaky tunnel compile
            # (r3: remote_compile EOF killed the run mid-stage) — keep
            # whatever already landed instead of dying with it; the
            # full traceback + a tag on the record distinguish a real
            # regression from a budget/tunnel casualty (ADVICE r4)
            log(f"stage 2^{size_log} FAILED: {type(e).__name__}: {e}\n"
                + traceback.format_exc())
            if result is not None:
                result["failed_stage"] = f"2^{size_log}: {type(e).__name__}"
                print(json.dumps(result), flush=True)
            break
        last_first_s = first_s

        # iterate within budget (a stage's warm iteration is cheap next
        # to its first call; keep at least one)
        n_it = iters if elapsed() < budget * 0.85 else 1
        try:
            t0 = time.time()
            for _ in range(n_it):
                r = run_msm()
            dt = (time.time() - t0) / n_it
        except Exception as e:  # noqa: BLE001 — e.g. HBM OOM on repeats
            # (r4 run5: 2^22 OOMed on iteration 2 and killed the whole
            # process, losing the FFT stage) — keep what landed
            log(f"stage 2^{size_log} iterations FAILED: "
                f"{type(e).__name__}: {e}\n" + traceback.format_exc())
            if result is not None:
                result["failed_stage"] = (
                    f"2^{size_log} iters: {type(e).__name__}"
                )
                print(json.dumps(result), flush=True)
            break
        points_per_s = n / dt
        msm_frac = (profiling.ops_msm_g1(n, c) / peak) / dt

        log(
            f"G1 MSM 2^{size_log} c={c}: {dt*1e3:.1f} ms/iter x{n_it} "
            f"({points_per_s/1e6:.3f} M points/s; roofline "
            f"{msm_frac*100:.2f}%; first-call {first_s:.1f}s)"
        )
        result = {
            "metric": f"g1_msm_2e{size_log}_points_per_s",
            "value": round(points_per_s, 1),
            "unit": "points/s",
            "vs_baseline": round(points_per_s / BASELINE_MSM_POINTS_PER_S, 4),
            "roofline_frac": round(msm_frac, 4),
            "first_call_s": round(first_s, 1),
        }
        print(json.dumps(result), flush=True)
        del packed, sl, r  # free this stage's device buffers

    # secondary: Fr FFT throughput (h-pipeline building block). Gated
    # like the stages: if the MSM stages were compiling cold, the FFT
    # almost surely is too — don't risk the recorded result on it.
    try:
        _bench_fft(do_fft, result, budget, last_first_s, iters, peak,
                   stages, spec, rng)
    except Exception as e:  # noqa: BLE001 — never lose the MSM record
        log(f"FFT stage FAILED: {type(e).__name__}: {e}\n"
            + traceback.format_exc())

    if result is None:
        # nothing completed inside the budget — still emit a parseable
        # record so the round is not an empty file
        print(json.dumps({
            "metric": "g1_msm_points_per_s",
            "value": 0.0,
            "unit": "points/s",
            "vs_baseline": 0.0,
            "error": f"no stage completed in {budget:.0f}s budget",
        }), flush=True)


def _bench_fft(do_fft, result, budget, last_first_s, iters, peak, stages,
               spec, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import fft
    from bellman_tpu.utils import profiling

    if (do_fft and result is not None and elapsed() < budget * 0.9
            and (last_first_s < 120 or elapsed() < budget * 0.5)):
        fft_log = min(max(stages), 20)
        m = 1 << fft_log
        plan = fft.get_plan(spec, bls.Fr, fft_log)
        a = jnp.asarray(
            np.frombuffer(rng.bytes(m * 32), dtype="<u2")
            .reshape(m, 16)
            .T.astype(np.uint32)
            * 0
            + 1
        )
        # eager DomainPlan.fft routes itself through the AOT artifact
        # store on TPU (utils/aot.py), skipping the 20-stage butterfly
        # trace on warm starts
        f = plan.fft

        def run_fft():
            # block_until_ready does not synchronize through the axon
            # tunnel; device_get of a checksum slice is the honest sync
            out = f(a)
            jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])

        t0 = time.time()
        run_fft()
        fft_first = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            run_fft()
        fft_dt = (time.time() - t0) / iters
        fft_frac = (profiling.ops_fft(m) / peak) / fft_dt
        log(
            f"Fr FFT 2^{fft_log}: {fft_dt*1e3:.1f} ms "
            f"({m/fft_dt/1e6:.2f} M coeffs/s; roofline {fft_frac*100:.2f}%; "
            f"first-call {fft_first:.1f}s)"
        )
        result["fft_roofline_frac"] = round(fft_frac, 4)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
