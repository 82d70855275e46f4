"""Worker/Waiter: the reference's parallel-runtime surface over XLA async.

The reference's multicore layer (/root/reference/src/multicore.rs:22-118)
is a rayon wrapper: ``Worker::compute`` spawns a closure returning a
``Waiter`` future; ``Worker::scope`` fork-joins over chunks. On TPU the
equivalents are structural no-ops — XLA dispatch is already
asynchronous (every kernel launch returns immediately; blocking happens
at ``jax.block_until_ready``), and intra-chip parallelism belongs to the
compiler. This module keeps the reference's API shape so ported calling
code reads the same:

* ``Worker().compute(f)``      -> runs f now (XLA makes it async),
  returns a Waiter
* ``Waiter.wait()``            -> blocks on device results
  (jax.block_until_ready on any jax arrays in the payload)
* ``Worker().scope(n)``        -> a chunking helper for host-side loops
* ``Worker.log_num_threads()`` -> log2 of host CPUs (multicore.rs:78-91
  used this to size chunks)

The backpressure counter and in-pool deadlock panic of the reference
(multicore.rs:14-18,100-108) have no analog: dispatch is bounded by
XLA's stream and the host never blocks inside a device computation.
"""

from __future__ import annotations

import math
import os


class Waiter:
    """A completed-or-in-flight computation handle.

    XLA dispatch is async: the wrapped value may contain device arrays
    whose results are still being computed; ``wait`` blocks on them.
    ``finish`` is an optional host-side completion (e.g. the MSM window
    fold over the device bit-plane totals) applied at wait time — the
    production prover dispatches all 8 MSMs as Waiters and blocks only
    at proof assembly, the overlap of multicore.rs:33-76 +
    groth16/src/prover.rs:244-354.
    """

    __slots__ = ("_value", "_finish")

    def __init__(self, value, finish=None):
        self._value = value
        self._finish = finish

    @classmethod
    def done(cls, value) -> "Waiter":
        """An already-available value (multicore.rs:110-117)."""
        return cls(value)

    def wait(self):
        try:
            import jax

            jax.block_until_ready(
                [x for x in _jax_leaves(self._value)]
            )
        except ImportError:  # host-only payloads
            pass
        if self._finish is not None:
            return self._finish(self._value)
        return self._value


def _jax_leaves(value):
    import jax

    leaves = jax.tree_util.tree_leaves(value)
    return [x for x in leaves if hasattr(x, "block_until_ready")]


class Worker:
    """Issues computations; parallelism is XLA's, not thread-pool-based."""

    @staticmethod
    def log_num_threads() -> int:
        return int(math.log2(max(os.cpu_count() or 1, 1)))

    def compute(self, f) -> Waiter:
        """Run f; XLA kernel launches inside f return immediately, so the
        returned Waiter resolves when the device results are ready."""
        return Waiter(f())

    def scope(self, elements: int):
        """Chunk-size helper mirroring Worker::scope (multicore.rs:78-91):
        returns (chunk_size, ranges) for host-side loops that want the
        reference's chunking behavior."""
        threads = max(os.cpu_count() or 1, 1)
        chunk = max(elements // threads, 1)
        ranges = [
            (i, min(i + chunk, elements)) for i in range(0, elements, chunk)
        ]
        return chunk, ranges
