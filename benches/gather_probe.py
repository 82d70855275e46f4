"""XLA gather throughput probe: layout/size variants for the MSM point
gather. Inputs vary per iteration (identical repeated dispatches can be
deduped by the remote executor and time as ~0)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit_varying(fn, args_list):
    """device_get-synced timing: block_until_ready through the axon
    tunnel returns early for some pure dispatches; a host read-back of
    one element forces real completion."""
    import jax

    jax.device_get(fn(*args_list[0])[..., :1])
    t0 = time.time()
    for a in args_list:
        out = fn(*a)
        jax.device_get(out[..., :1])
    return (time.time() - t0) / len(args_list)


def main():
    import jax
    import jax.numpy as jnp

    n_src = 1 << 20
    rng = np.random.default_rng(0)
    NIT = 4

    def probe_cols(rows, n_idx, sort=False, label=""):
        src = jnp.asarray(
            rng.integers(0, 2**32, (rows, n_src), dtype=np.uint32)
        )
        f = jax.jit(lambda s, i: jnp.take(s, i, axis=1))
        arglist = []
        for _ in range(NIT):
            ix = rng.integers(0, n_src, n_idx)
            if sort:
                ix = np.sort(ix)
            arglist.append((src, jnp.asarray(ix.astype(np.int32))))
        t = timeit_varying(f, arglist)
        vol = rows * n_idx * 4
        print(
            f"cols rows={rows:3d} n_idx=2^{n_idx.bit_length()-1}{label}: "
            f"{t*1e3:9.2f} ms  {n_idx/t/1e6:8.1f} M col/s  "
            f"{vol/t/1e9:7.2f} GB/s",
            flush=True,
        )

    def probe_rows(width, n_idx):
        src = jnp.asarray(
            rng.integers(0, 2**32, (n_src, width), dtype=np.uint32)
        )
        f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        arglist = [
            (src, jnp.asarray(rng.integers(0, n_src, n_idx).astype(np.int32)))
            for _ in range(NIT)
        ]
        t = timeit_varying(f, arglist)
        vol = width * n_idx * 4
        print(
            f"rows width={width:3d} n_idx=2^{n_idx.bit_length()-1}: "
            f"{t*1e3:9.2f} ms  {n_idx/t/1e6:8.1f} M row/s  "
            f"{vol/t/1e9:7.2f} GB/s",
            flush=True,
        )

    probe_cols(24, 1 << 19)
    probe_cols(24, 1 << 22)
    probe_cols(24, 1 << 24)
    probe_cols(1, 1 << 22)
    probe_cols(4, 1 << 22)
    probe_cols(48, 1 << 22)
    probe_cols(24, 1 << 22, sort=True, label=" SORTED")
    probe_rows(24, 1 << 22)
    probe_rows(128, 1 << 22)


if __name__ == "__main__":
    main()
