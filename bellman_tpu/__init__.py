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
    """Persist expensive kernel compiles across processes — OPT-IN via
    BELLMAN_TPU_CACHE=<dir>. (Not enabled by default: on the axon TPU
    tunnel backend the persistent cache's executable serialization
    stalls the client for minutes even for tiny programs.)"""
    cache_dir = os.environ.get("BELLMAN_TPU_CACHE")
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 30.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_compilation_cache()
