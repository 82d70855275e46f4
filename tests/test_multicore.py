"""Worker/Waiter parity-surface tests (multicore.rs:22-118 analog)."""

import jax.numpy as jnp

from bellman_tpu.multicore import Waiter, Worker


def test_waiter_done_and_wait():
    assert Waiter.done(42).wait() == 42


def test_compute_returns_waiter_over_device_values():
    w = Worker()
    waiter = w.compute(lambda: jnp.arange(8) * 2)
    out = waiter.wait()
    assert int(out.sum()) == 56


def test_scope_chunks_cover_range():
    chunk, ranges = Worker().scope(1000)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == 1000
    joined = [x for a, b in ranges for x in range(a, b)]
    assert joined == list(range(1000))
    assert Worker.log_num_threads() >= 0
