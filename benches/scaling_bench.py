"""Sharded-pipeline scaling proxy on the virtual CPU mesh.

BASELINE.json's scaling target (>=80% efficiency at 2 hosts for MSM &
FFT) cannot be measured directly in this image — there is exactly one
real TPU chip behind the axon tunnel, and the T-device mesh the tests
use is xla_force_host_platform_device_count virtual CPU devices that
all share ONE physical core. Wall-clock "speedup" on that mesh is
meaningless (everything serializes), but it yields an honest PROXY:

  With one core, wall-clock(T devices) ~ total work executed, so
      work_inflation(T) = wall(T) / wall(1)
  measures how much extra work sharding adds (collective transposes,
  per-shard padding, duplicated schedule fixed costs). On real hardware
  wall(T) >= wall(1) * inflation(T) / T, so
      efficiency(T) <= 1 / inflation(T):
  the proxy is an UPPER bound on real multi-host efficiency — it can
  refute the >=80% scaling target (inflation > 1.25) but never confirm
  it, because it is blind to ICI/DCN communication latency, which only
  lowers efficiency further. (The all-to-all cross-DFT moves 2*n_local
  per device — sharding.py:133-166 — which at pod scale rides ICI at
  line rate per the scaling-book model, so the bound should be close
  for the FFT; the gathered MSM window totals are tiny.)

The reference's analog is its parallel_fft-vs-serial_fft consistency
sweep (/root/reference/src/domain.rs:465-498) — correctness-only; it
never measures scaling either.

Runs each T in a fresh subprocess (device count is a startup flag).
Usage: python benches/scaling_bench.py [--exp 16] [--msm-exp 14]
           [--ts 1,2,4,8] [--iters 3]
Emits one JSON line per (kernel, T) and a summary table on stderr.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def child(kernel: str, t: int, exp: int, iters: int) -> None:
    """Measure one (kernel, T) in this process; print a JSON line."""
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bellman_tpu.utils import cpu_cache

    cpu_cache.enable()

    from bellman_tpu.algebra import bls12_381 as bls
    from bellman_tpu.ops import curve, fft, limbs, msm2, msm3
    from bellman_tpu.parallel import sharding

    spec = limbs.spec_for("bls_fr")
    devs = jax.local_devices(backend="cpu")[:t]
    assert len(devs) == t, (len(devs), t)
    mesh = sharding.make_mesh(devices=devs)
    n = 1 << exp
    rng = np.random.default_rng(t * 1000 + exp)

    if kernel == "fft":
        plan = sharding.ShardedDomainPlan(spec, bls.Fr, exp, mesh)
        vals = rng.integers(0, 1 << 62, n, dtype=np.uint64)
        a = jax.device_put(
            jnp.asarray(spec.to_mont_host([int(v) for v in vals])),
            plan.block_spec,
        )

        def run():
            out = plan.fft_sharded(a)
            jax.block_until_ready(out)

    elif kernel == "msm":
        spec_fq = limbs.spec_for("bls_fq")
        ops = curve.g1_ops()
        pool = 32
        g = bls.G1Affine.generator()
        pts = [g.mul_int(int(k) + 1)
               for k in rng.integers(1, 2 ** 62, pool)]
        xs = np.asarray(spec_fq.to_mont_host([int(p.x) for p in pts]),
                        dtype=np.uint32)
        ys = np.asarray(spec_fq.to_mont_host([int(p.y) for p in pts]),
                        dtype=np.uint32)
        reps = n // pool
        X = jnp.asarray(np.tile(xs, (1, reps)))
        Y = jnp.asarray(np.tile(ys, (1, reps)))
        packed_host = msm2.PackedBases(ops, ops.from_affine(X, Y))
        sl_np = np.frombuffer(rng.bytes(n * 32), dtype="<u2").reshape(
            n, 16).T.astype(np.uint32)
        sl_np[15] %= int(bls.R >> 240)
        from jax.sharding import NamedSharding, PartitionSpec as P

        pk = jax.device_put(
            packed_host.packed, NamedSharding(mesh, P(None, "shard")))
        im = jax.device_put(
            packed_host.inf_mask, NamedSharding(mesh, P("shard")))
        sl = jax.device_put(
            jnp.asarray(sl_np), NamedSharding(mesh, P(None, "shard")))

        def run():
            sharding.sharded_msm(
                ops, pk, im, sl, mesh, bls.G1Affine, c=12, mode="jnp")

    else:
        raise SystemExit(f"unknown kernel {kernel}")

    run()  # compile + first run
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters
    print(json.dumps({"kernel": kernel, "t": t, "exp": exp,
                      "wall_s": round(dt, 4)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", type=int, default=16, help="FFT log2 size")
    ap.add_argument("--msm-exp", type=int, default=14)
    ap.add_argument("--ts", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--child", nargs=3, metavar=("KERNEL", "T", "EXP"),
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child:
        child(args.child[0], int(args.child[1]), int(args.child[2]),
              args.iters)
        return

    ts = [int(x) for x in args.ts.split(",")]
    rows = []
    for kernel, exp in (("fft", args.exp), ("msm", args.msm_exp)):
        for t in ts:
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            # strip any inherited device-count token first: two values of
            # the same flag make the winner an XLA parsing detail
            inherited = [
                tok for tok in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in tok
            ]
            env["XLA_FLAGS"] = " ".join(
                inherited + [f"--xla_force_host_platform_device_count={t}"]
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", kernel, str(t), str(exp),
                 "--iters", str(args.iters)],
                capture_output=True, text=True, env=env, cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")]
            if not line:
                print(f"[scaling] {kernel} T={t} FAILED:\n{out.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            row = json.loads(line[-1])
            rows.append(row)
            print(json.dumps(row), flush=True)

    # inflation table vs T=1 (eff_upper_bound: see module docstring —
    # the proxy can refute the scaling target, not confirm it)
    by = {(r["kernel"], r["t"]): r["wall_s"] for r in rows}
    print("\nkernel  T  wall_s   inflation  eff_upper_bound",
          file=sys.stderr)
    for kernel, exp in (("fft", args.exp), ("msm", args.msm_exp)):
        base = by.get((kernel, 1))
        for t in ts:
            w = by.get((kernel, t))
            if w is None or base is None:
                continue
            infl = w / base
            print(f"{kernel:6s} {t:2d} {w:8.3f}  {infl:8.2f}x  "
                  f"{min(1.0, 1.0 / infl) * 100:6.1f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
