"""Chunked associative scan/reduce with O(1) combine tracings.

jax.lax.associative_scan retraces its combine at every recursion level
(~2 log2 n times). For combines that are whole elliptic-curve point
additions (~1k primitives each) that makes tracing and compiling the
MSM bucket pipeline minutes-long. This module implements inclusive
scans and reductions that trace the combine a CONSTANT number of times:

  reshape (n,) -> (G, K); lax.scan over the K axis (combine traced
  once, runs K sequential steps on G-wide vectors); recurse on the G
  chunk totals; then one vectorized combine folds the exclusive chunk
  prefixes back in.

Work is ~n combines (associative_scan does ~2n), sequential depth is
~K + K' + ... ~ a few hundred vector steps. Padding uses a caller-
provided left-identity element (for Jacobian points: infinity), padded
at the tail so results are unaffected.

Elements are tuples of arrays scanned along their LAST axis (all must
share that axis length).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# Chunk length == sequential steps per level (and the base-case length).
# Larger -> fewer traced combines (compile time); smaller -> fewer
# sequential steps (runtime). 128 favors compile time; revisit with the
# planned Pallas MSM kernel.
BASE = 128


def _move_last_to_front(x):
    return jnp.moveaxis(x, -1, 0)


def _move_front_to_last(x):
    return jnp.moveaxis(x, 0, -1)


def _pad_last(elems, pad, identity):
    out = []
    for e, ident in zip(elems, identity):
        shape = e.shape[:-1] + (pad,)
        out.append(
            jnp.concatenate([e, jnp.broadcast_to(ident, shape)], axis=-1)
        )
    return tuple(out)


def _bcast_ident(identity, like):
    """identity leaf (broadcastable) -> shape of `like`."""
    return tuple(
        jnp.broadcast_to(ident, e.shape) for ident, e in zip(identity, like)
    )


def chunked_scan(combine, identity, elems, reverse: bool = False,
                 base: int | None = None):
    """Inclusive scan of `combine` along the last axis.

    combine: ((a...), (b...)) -> (out...), associative, with `identity`
    a left identity (combine(identity, x) == x).
    identity: tuple of arrays broadcastable to each element's shape with
    last axis 1. ``base`` overrides the chunk length (smaller -> fewer,
    wider sequential steps but more recursion levels / traced combines).
    """
    BASE = base if base is not None else globals()["BASE"]
    elems = tuple(elems)
    if reverse:
        flipped = tuple(jnp.flip(e, axis=-1) for e in elems)
        out = chunked_scan(combine, identity, flipped, base=base)
        return tuple(jnp.flip(o, axis=-1) for o in out)

    n = elems[0].shape[-1]
    if n <= BASE:
        # scan element-by-element; keep a trailing singleton so each
        # per-step slice stays (..., 1) for shape-polymorphic combines
        xs = tuple(_move_last_to_front(e)[..., None] for e in elems)
        init = tuple(
            jnp.broadcast_to(ident, e.shape[:-1] + (1,))
            for ident, e in zip(identity, elems)
        )

        def body(c, x):
            nc = combine(c, x)
            return nc, nc

        _, ys = jax.lax.scan(body, init, xs)  # (n, ..., 1)
        return tuple(_move_front_to_last(y[..., 0]) for y in ys)

    K = BASE
    G = -(-n // K)
    pad = G * K - n
    if pad:
        elems = _pad_last(elems, pad, identity)

    # (..., G*K) -> (..., G, K) -> scan over K with (..., G) carries
    resh = tuple(e.reshape(e.shape[:-1] + (G, K)) for e in elems)
    xs = tuple(jnp.moveaxis(e, -1, 0) for e in resh)  # (K, ..., G)
    init = tuple(
        jnp.broadcast_to(ident, e.shape[:-1])  # (..., G) carries
        for ident, e in zip(identity, resh)
    )

    def body(c, x):
        nc = combine(c, x)
        return nc, nc

    _, intra = jax.lax.scan(body, init, xs)  # (K, ..., G) inclusive
    totals = tuple(t[-1] for t in intra)     # (..., G)

    tot_scan = chunked_scan(combine, identity, totals, base=base)
    # exclusive chunk prefixes: shift right by one, identity in front
    prev = tuple(
        jnp.concatenate(
            [jnp.broadcast_to(ident, t.shape[:-1] + (1,)), t[..., :-1]],
            axis=-1,
        )
        for ident, t in zip(identity, tot_scan)
    )
    # fold chunk prefixes into each in-chunk prefix: flatten (G, K) back
    # to one axis so the combine sees its usual (..., n) layout
    intra_l = tuple(jnp.moveaxis(t, 0, -1) for t in intra)  # (..., G, K)

    def flat(t):
        return t.reshape(t.shape[:-2] + (G * K,))

    prev_b = tuple(
        flat(jnp.broadcast_to(p[..., None], i.shape))
        for p, i in zip(prev, intra_l)
    )
    folded = combine(prev_b, tuple(flat(t) for t in intra_l))
    return tuple(o[..., :n] for o in folded)


def chunked_reduce(combine, identity, elems, base: int | None = None):
    """Total fold of `combine` along the last axis -> last axis size 1."""
    BASE = base if base is not None else globals()["BASE"]
    elems = tuple(elems)
    n = elems[0].shape[-1]
    while n > BASE:
        K = BASE
        G = -(-n // K)
        pad = G * K - n
        if pad:
            elems = _pad_last(elems, pad, identity)
        resh = tuple(e.reshape(e.shape[:-1] + (G, K)) for e in elems)
        xs = tuple(jnp.moveaxis(e, -1, 0) for e in resh)
        init = tuple(
            jnp.broadcast_to(ident, e.shape[:-1])  # (..., G) carries
            for ident, e in zip(identity, resh)
        )

        def body(c, x):
            return combine(c, x), None

        acc, _ = jax.lax.scan(body, init, xs)
        elems = acc  # (..., G)
        n = G
    # base: sequential fold (trailing singleton keeps slices 2D)
    xs = tuple(_move_last_to_front(e)[..., None] for e in elems)
    init = tuple(
        jnp.broadcast_to(ident, e.shape[:-1] + (1,))
        for ident, e in zip(identity, elems)
    )

    def body(c, x):
        return combine(c, x), None

    acc, _ = jax.lax.scan(body, init, xs)
    return acc  # (..., 1)
