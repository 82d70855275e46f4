"""Host multi-scalar multiplication plumbing: density trackers and the
reference-semantics MSM entry point.

Mirrors the *behavioral contract* of /root/reference/src/multiexp.rs:
``multiexp(bases, density_map, exponents)`` computes
``sum_i bases[j(i)] * exponents[i]`` over the i with ``density[i]`` set,
where j(i) advances only over dense entries (bases are stored pre-filtered,
matching the CRS's zero-point filtering —
/root/reference/groth16/src/generator.rs:490-505). Identity bases are
rejected with UnexpectedIdentity (/root/reference/src/multiexp.rs:63-65).

The host path here is the oracle (naive double-and-add); the TPU Pippenger
kernels live in ``bellman_tpu.ops.msm3`` (with ``ops.msm2`` hosting the
schedule/packing layer) and are cross-checked against it,
replicating the reference's own test strategy
(/root/reference/src/multiexp.rs:334-378).
"""

from __future__ import annotations

from .r1cs import UnexpectedIdentity


class DensityTracker:
    """Bitmap of which query entries are used, with a running total
    (/root/reference/src/multiexp.rs:117-157)."""

    __slots__ = ("bv", "total_density")

    def __init__(self):
        self.bv = []
        self.total_density = 0

    def add_element(self):
        self.bv.append(False)

    def inc(self, idx: int):
        if not self.bv[idx]:
            self.bv[idx] = True
            self.total_density += 1

    def get_total_density(self) -> int:
        return self.total_density

    def __len__(self):
        return len(self.bv)

    def get_query_size(self):
        return len(self.bv)


class FullDensity:
    """Zero-cost stand-in: every entry dense
    (/root/reference/src/multiexp.rs:88-115)."""

    def get_query_size(self):
        return None


FULL_DENSITY = FullDensity()


def multiexp(bases, density_map, exponents, group=None):
    """Host-oracle MSM with reference semantics.

    ``bases``: list of group elements (pre-filtered of identities for
    density-tracked queries). ``density_map``: FullDensity or
    DensityTracker. ``exponents``: list of field elements. ``group``: the
    group class, needed only when the sum may be empty.
    Returns the group sum; raises UnexpectedIdentity on an identity base.
    """
    if isinstance(density_map, DensityTracker):
        if len(density_map.bv) != len(exponents):
            raise ValueError(
                f"density/exponents size mismatch: {len(density_map.bv)} vs "
                f"{len(exponents)}"
            )
        dense = density_map.bv
    else:
        dense = None

    acc = None
    base_idx = 0
    for i, exp in enumerate(exponents):
        if dense is not None and not dense[i]:
            continue
        base = bases[base_idx]
        base_idx += 1
        if base.is_identity():
            raise UnexpectedIdentity("identity base in multiexp")
        if exp.is_zero():
            continue
        term = base.mul_int(int(exp))
        acc = term if acc is None else acc + term
    if acc is None:
        if bases:
            return bases[0].identity()
        if group is not None:
            return group.identity()
        raise ValueError("multiexp over empty bases needs an explicit group")
    return acc
