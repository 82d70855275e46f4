"""bellman-tpu: a TPU-native Groth16 zk-SNARK framework (JAX/XLA/Pallas).

Package layout:
  algebra/   host big-int field/curve oracle (BLS12-381, DummyEngine)
  r1cs       the Circuit/ConstraintSystem programming model
  gadgets/   circuit gadget library (booleans, numbers, u32, SHA-256, ...)
  domain     host EvaluationDomain oracle
  multiexp   host MSM oracle + density trackers
  groth16/   proving system (generator, prover, verifier, serialization)
  ops/       device kernels: limb arithmetic, FFT, curve, MSM, prover
  parallel/  multi-chip sharding (distributed FFT, sharded MSM)
"""

import os


def _enable_compilation_cache():
    """Persist expensive kernel compiles across processes (ON by
    default; measured on the axon tunnel: 335 s cold Mosaic compile of
    one fold kernel -> 67 s from a warm cache). Override the directory
    with BELLMAN_TPU_CACHE=<dir>, disable with BELLMAN_TPU_CACHE=0.
    tests/conftest.py configures its own CPU-suite cache policy."""
    cache_dir = os.environ.get("BELLMAN_TPU_CACHE")
    if cache_dir is None:
        # default ON only for real-device runs; CPU test runs keep the
        # conftest-managed policy (round 1: a G2-MSM executable
        # segfaulted the XLA-CPU cache writer)
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            return
        cache_dir = os.path.join(
            os.path.dirname(__file__), "..", ".jax_cache_tpu"
        )
    if cache_dir in ("0", "", "off"):
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_compilation_cache()
