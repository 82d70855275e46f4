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
# safe on CPU. (bellman_tpu.__init__ enables a separate default cache
# for real-device runs; it skips CPU runs so this policy stays in
# charge for the test suite.)
#
# Writing the very largest executables (the 24-limb Fq2 G2 MSM at full
# window width) segfaults inside zstandard's compressor, so the cache
# codec is patched to zlib for writes (reads sniff the zstd magic so
# pre-existing zstd entries stay readable). Verified on the exact
# executable that used to kill the process. Set
# BELLMAN_TPU_CPU_CACHE_OFF=1 to disable cache writes entirely.
import zlib  # noqa: E402

from jax._src import compilation_cache as _cc  # noqa: E402


def _compress_zlib(executable: bytes) -> bytes:
    return zlib.compress(executable, 1)


def _decompress_sniff(executable: bytes) -> bytes:
    if executable[:4] == b"\x28\xb5\x2f\xfd":  # zstd frame magic
        if getattr(_cc, "zstd", None):
            return _cc.zstd.decompress(executable)
        return _cc.zstandard.ZstdDecompressor().decompress(executable)
    return zlib.decompress(executable)


_cc.compress_executable = _compress_zlib
_cc.decompress_executable = _decompress_sniff

_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
if os.environ.get("BELLMAN_TPU_CPU_CACHE_OFF"):
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
