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

# Persistent compilation cache for the CPU backend: see
# bellman_tpu/utils/cpu_cache.py (zlib codec patch + .jax_cache_cpu).
from bellman_tpu.utils import cpu_cache  # noqa: E402

cpu_cache.enable()
