"""Persistent XLA-CPU compilation cache policy (shared by the test
suite and the driver entry points).

MSM/FFT kernel compiles dominate CPU-jax wall-clock (the virtual-mesh
test/dryrun environment of SURVEY.md §4); caching them across
runs/processes is safe on CPU. Writing the very largest executables
(the 24-limb Fq2 G2 MSM at full window width) segfaults inside
zstandard's compressor, so the cache codec is patched to zlib for
writes (reads sniff the zstd magic so pre-existing zstd entries stay
readable) — verified on the exact executable that used to kill the
process.

Set BELLMAN_TPU_CPU_CACHE_OFF=1 to disable cache writes entirely.
(Real-device runs use the separate default policy in
bellman_tpu/__init__.py, which skips CPU.)
"""

from __future__ import annotations

import os
import zlib


def enable(cache_dir: str | None = None) -> None:
    import jax
    from jax._src import compilation_cache as _cc

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

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(__file__), "..", "..", ".jax_cache_cpu"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    if os.environ.get("BELLMAN_TPU_CPU_CACHE_OFF"):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    else:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
