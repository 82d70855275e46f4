"""Test configuration.

Device kernels are tested on CPU-jax with a virtual 8-device mesh
(XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT), mirroring how the reference sweeps
parallel_fft against serial_fft on one machine
(/root/reference/src/domain.rs:465-498). Real-TPU runs happen in bench.py.

This must run before any jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may export axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize registers its TPU backend regardless of the env
# var; force the CPU platform explicitly so tests run on the virtual
# 8-device CPU mesh (bench.py targets the real chip instead)
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache for the CPU backend: MSM/FFT kernel
# compiles dominate suite time; caching them across runs/processes is
# safe on CPU (the axon TPU backend stalls on cache serialization, so
# bellman_tpu.__init__ leaves it opt-in there).
#
# READ-mostly: writing the very largest executables (the 24-limb Fq2 G2
# MSM at full window width) segfaults inside the cache's zstandard
# compression and kills the whole test process, so by default writes are
# disabled (min_compile_time effectively infinite) and only pre-existing
# entries are read. Set BELLMAN_TPU_CPU_CACHE_WRITE=1 to (re)populate the
# cache when running suites that don't touch the G2 MSM.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
if os.environ.get("BELLMAN_TPU_CPU_CACHE_WRITE"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
