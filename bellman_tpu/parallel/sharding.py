"""Multi-chip sharding: distributed FFT and MSM over a jax.sharding.Mesh.

The reference's only parallelism is a rayon thread pool
(/root/reference/src/multicore.rs); its parallel_fft
(/root/reference/src/domain.rs:316-372) decimates a 2^log_n FFT into
2^log_cpus sub-FFTs with twiddle pre-scaling and an index-interleaving
recombination. That decomposition IS the distributed-FFT recipe, and this
module is its ICI-native form:

* ``fft_block_to_cyclic`` (decimation-in-frequency): an all-to-all
  transpose of lane slices, a LOCAL T-point cross-device DFT
  (s_r = sum_j1 w^(r*j1) * block_j1 computed for every r at once on
  each device's lane slice), an all-to-all back, a local pre-twiddle,
  then an entirely local sub-FFT. Input is block-sharded (natural
  order), output is cyclic-sharded: device r holds X[q*T + r] at local
  position q — exactly the reference's
  ``a[i] = tmp[i & (T-1)][i >> log_cpus]`` interleave, kept distributed.
  Traffic: 2 * n_local per device (vs (T-1) * n_local for the round-1
  ring broadcast this replaces).
* ``fft_cyclic_to_block`` (decimation-in-time): local sub-FFT, local
  twiddle, then the same transposed exchange.

The Groth16 h-pipeline chains these so that every intermediate stays
distributed and all index-dependent scalings (coset powers g^i, 1/n,
1/z) are computed locally from the device index — zero gathers:

  block coeffs --ifft--> cyclic --*g^i, fft--> block evals
  --pointwise a*b-c, /z--> block --ifft--> cyclic --*g^-i--> h cyclic

The h-query CRS bases are pre-sharded in the SAME cyclic order, so the
h MSM needs no reshard at all.

MSM: points and scalars are sharded along the batch axis; each device
runs the full local v3 tree-fold pipeline (ops.msm3) and the tiny
per-device (window, bit) totals are gathered and folded host-side
(point addition is not a psum-able monoid over limb vectors, and T
points per window are not worth a device collective).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import curve, fft, limbs
from ..ops.limbs import FieldSpec


AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), (AXIS,))


# ---------------------------------------------------------------------------
# Distributed FFT plan
# ---------------------------------------------------------------------------


class ShardedDomainPlan:
    """Constants for a distributed 2^exp domain over T = mesh size devices.

    Local sub-domains have size n/T (requires T | n, T a power of two).
    """

    def __init__(self, spec: FieldSpec, field, exp: int, mesh: Mesh):
        self.spec = spec
        self.field = field
        self.exp = exp
        self.mesh = mesh
        self.T = mesh.devices.size
        assert (1 << exp) % self.T == 0, "mesh must divide domain size"
        self.n = 1 << exp
        self.n_local = self.n // self.T
        self.log_t = self.T.bit_length() - 1
        assert 1 << self.log_t == self.T, "mesh size must be a power of two"

        # local sub-FFT plan (size n/T) and full-domain scalars
        self.local_plan = fft.get_plan(spec, field, exp - self.log_t)
        om = field.ROOT_OF_UNITY
        for _ in range(exp, field.S):
            om = om.square()
        self.omega_int = int(om)
        p = spec.p
        omega = self.omega_int
        omega_inv = pow(omega, -1, p)
        g = int(field.GENERATOR)
        g_inv = int(field.GENERATOR.invert())
        T, n = self.T, self.n

        def mont(vals):
            return jnp.asarray(spec.to_mont_host(vals))

        # W[r, j1] = omega^((n/T) * r * j1)  (the ring-exchange weights)
        self.ring_w = mont(
            [pow(omega, (n // T) * r * j1 % n, p) for r in range(T) for j1 in range(T)]
        ).reshape(spec.L, T, T)
        self.ring_w_inv = mont(
            [
                pow(omega_inv, (n // T) * r * j1 % n, p)
                for r in range(T)
                for j1 in range(T)
            ]
        ).reshape(spec.L, T, T)
        # per-device pre/post twiddle bases: omega^r for r < T
        self.tw_base = mont([pow(omega, r, p) for r in range(T)])
        self.tw_base_inv = mont([pow(omega_inv, r, p) for r in range(T)])
        # coset scalings on cyclic data: g^(qT + r) = g^r * (g^T)^q
        self.g_base = mont([pow(g, r, p) for r in range(T)])
        self.g_step = mont([pow(g, T, p)])
        self.ginv_base = mont([pow(g_inv, r, p) for r in range(T)])
        self.ginv_step = mont([pow(g_inv, T, p)])
        self.minv = mont([pow(n, -1, p)])
        zg = (pow(g, n, p) - 1) % p
        self.zinv = mont([pow(zg, -1, p)])

        self.block_spec = NamedSharding(mesh, P(None, AXIS))
        self.repl_spec = NamedSharding(mesh, P())

    # -- building blocks (called INSIDE shard_map) ---------------------------
    def _geo(self, base, log_len):
        """Local geometric series [base^0 .. base^(2^log_len - 1)]."""
        return fft.geometric_powers(self.spec, base, log_len)

    def _cross_dft(self, x_local, wmat):
        """s_r = sum_j1 wmat[r, j1] * block_j1, distributed.

        The cross-device T-point DFT of the block vectors, via two
        all-to-all transposes: (1) device r trades lane slices so it
        holds slice r of EVERY block, (2) the (T, T) weighted reduction
        runs locally over the source axis for all outputs at once,
        (3) the transpose back leaves device r holding s_r in full.
        Per-device traffic is 2 * n_local (the ring broadcast this
        replaces moved (T-1) * n_local).

        x_local: (L, n_local) this device's block; wmat: (L, T, T).
        Requires T | n_local (i.e. T^2 | n)."""
        spec, T, L = self.spec, self.T, self.spec.L
        if T == 1:
            w = wmat[:, 0, 0][:, None]
            return limbs.mont_mul_r(spec, x_local, w)
        m = x_local.shape[-1]
        if m % T != 0:  # tiny local blocks (tests): ring broadcast
            return self._ring_fallback(x_local, wmat)
        # (L, T, m/T): axis 1 = lane-slice destination
        x = x_local.reshape(L, T, m // T)
        x = jax.lax.all_to_all(x, AXIS, split_axis=1, concat_axis=1)
        # now axis 1 = source block j1; compute all outputs s at once:
        # prod[s, j1] = w[s, j1] * x[j1], summed over j1
        prod = limbs.mont_mul_r(
            spec, wmat[:, :, :, None], x[:, None, :, :]
        )  # (L, T(s), T(j1), m/T)
        acc = prod[:, :, 0, :]
        for j1 in range(1, T):
            acc = limbs.add_r(spec, acc, prod[:, :, j1, :])
        # axis 1 = output s; transpose back so device s holds s_s fully
        acc = jax.lax.all_to_all(acc, AXIS, split_axis=1, concat_axis=1)
        return acc.reshape(L, m)

    def _ring_fallback(self, x_local, wmat):
        """T-1 ppermute rounds accumulating w[r, j1] * block_j1. Only for
        local blocks too small to slice T ways (n_local < T)."""
        spec, T = self.spec, self.T
        r = jax.lax.axis_index(AXIS)
        buf = x_local
        w = jnp.take(jnp.take(wmat, r, axis=1), r % T, axis=1)  # (L,)
        acc = limbs.mont_mul_r(spec, buf, w[:, None])
        for t in range(1, T):
            buf = jax.lax.ppermute(
                buf, AXIS, [(i, (i + 1) % T) for i in range(T)]
            )
            j1 = (r - t) % T
            w = jnp.take(jnp.take(wmat, r, axis=1), j1, axis=1)
            acc = limbs.add_r(
                spec, acc, limbs.mont_mul_r(spec, buf, w[:, None])
            )
        return acc

    def _pre_twiddle(self, x_local, base_tab):
        """Multiply element j2 by (omega^r)^j2 (r = device index)."""
        r = jax.lax.axis_index(AXIS)
        base = jnp.take(base_tab, r, axis=1)[:, None]  # (L, 1)
        powers = self._geo(base, self.exp - self.log_t)
        return limbs.mont_mul_r(self.spec, x_local, powers)

    def fft_block_to_cyclic_local(self, x_local, inverse=False):
        """DIF step body: ring exchange -> pre-twiddle -> local FFT.

        Output: device r holds X[q*T + r] at local q."""
        wmat = self.ring_w_inv if inverse else self.ring_w
        base = self.tw_base_inv if inverse else self.tw_base
        s = self._cross_dft(x_local, wmat)
        s = self._pre_twiddle(s, base)
        out = self.local_plan._fft_impl(s, inverse=inverse, scale=False)
        if inverse:
            out = limbs.mont_mul_r(self.spec, out, self.minv)
        return out

    def fft_cyclic_to_block_local(self, x_local, inverse=False):
        """DIT step body: local FFT -> twiddle -> transposed ring exchange.

        Input cyclic (device r holds x[j'T + r]); output block-sharded."""
        wmat = self.ring_w_inv if inverse else self.ring_w
        base = self.tw_base_inv if inverse else self.tw_base
        y = self.local_plan._fft_impl(x_local, inverse=inverse, scale=False)
        z = self._pre_twiddle(y, base)
        # X[d*(n/T) + k2] = sum_r w[d, r] * z_r[k2]
        out = self._cross_dft(z, wmat)
        if inverse:
            out = limbs.mont_mul_r(self.spec, out, self.minv)
        return out

    def distribute_powers_cyclic_local(self, x_local, inverse=False):
        """Multiply cyclic-sharded coeffs by g^(global index):
        g^(qT + r) = g^r * (g^T)^q, entirely local."""
        spec = self.spec
        r = jax.lax.axis_index(AXIS)
        base = self.g_step if not inverse else self.ginv_step
        head = self.g_base if not inverse else self.ginv_base
        powers = self._geo(base, self.exp - self.log_t)  # (g^T)^q
        scale = jnp.take(head, r, axis=1)[:, None]
        return limbs.mont_mul_r(
            spec, x_local, limbs.mont_mul_r(spec, powers, scale)
        )

    # -- full pipelines (shard_map'ed jitted callables) ----------------------
    @functools.cached_property
    def h_pipeline_sharded(self):
        """jit(shard_map) h-pipeline: block-sharded a/b/c (Montgomery)
        -> CYCLIC-sharded h coefficients (Montgomery), top coeff zeroed."""

        def body(a, b, c):
            def to_evals(x):
                x = self.fft_block_to_cyclic_local(x, inverse=True)  # ifft
                x = self.distribute_powers_cyclic_local(x)           # coset
                return self.fft_cyclic_to_block_local(x)             # fft

            a = to_evals(a)
            b = to_evals(b)
            c = to_evals(c)
            ab = limbs.mont_mul_r(self.spec, a, b)
            ab = limbs.sub_r(self.spec, ab, c)
            ab = limbs.mont_mul_r(self.spec, ab, self.zinv)
            h = self.fft_block_to_cyclic_local(ab, inverse=True)
            h = self.distribute_powers_cyclic_local(h, inverse=True)
            # zero the top coefficient (global index n-1 = local n/T-1 on
            # device T-1): the prover drops it (prover.rs:239-241)
            r = jax.lax.axis_index(AXIS)
            is_last = r == self.T - 1
            mask = jnp.arange(self.n_local) == self.n_local - 1
            h = jnp.where((is_last & mask)[None], jnp.zeros_like(h), h)
            return h

        fn = shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(None, AXIS),) * 3,
            out_specs=P(None, AXIS),
            check_vma=False,
        )
        return jax.jit(fn)

    @functools.cached_property
    def fft_sharded(self):
        """jit block->cyclic forward FFT (for tests)."""
        fn = shard_map(
            lambda x: self.fft_block_to_cyclic_local(x),
            mesh=self.mesh,
            in_specs=(P(None, AXIS),),
            out_specs=P(None, AXIS),
            check_vma=False,
        )
        return jax.jit(fn)

    @functools.cached_property
    def ifft_sharded(self):
        fn = shard_map(
            lambda x: self.fft_block_to_cyclic_local(x, inverse=True),
            mesh=self.mesh,
            in_specs=(P(None, AXIS),),
            out_specs=P(None, AXIS),
            check_vma=False,
        )
        return jax.jit(fn)

    def cyclic_to_natural_host(self, arr):
        """Reorder a cyclic-sharded (L, n) array (as gathered) to natural
        order on host: global position of local q on device r is qT + r;
        the gathered layout is device-major [r, q]."""
        L = arr.shape[0]
        a = np.asarray(jax.device_get(arr)).reshape(L, self.T, self.n_local)
        return np.transpose(a, (0, 2, 1)).reshape(L, self.n)


# ---------------------------------------------------------------------------
# Sharded MSM (v3 pipeline, data-parallel SPMD)
# ---------------------------------------------------------------------------


def _sharded_msm_spmd(ops: curve.CurveOps, packed, inf_mask, scalar_limbs,
                      mesh: Mesh, point_cls, c: int, mode: str,
                      n_local: int):
    """Small-per-shard MSM as ONE SPMD program under shard_map.

    The per-shard host-loop path (below) dispatches onto each device
    separately; every jit in the pipeline then compiles once PER DEVICE
    ORDINAL (the executable's device assignment is part of the compile
    key), which turned the 8-device dryrun into ~8 identical multi-
    minute XLA compiles (round-4 regression hunt). Here the whole
    per-shard pipeline — schedule sort, single-group gather/fold,
    window totals — is traced INSIDE shard_map, so the mesh runs it as
    one compiled SPMD executable; the tiny per-shard totals U come back
    replicated-stacked and the host finishes each shard's Horner +
    window fold and adds T points. Only legal when the shard size fits
    the shape-stable small-n group (no data-dependent planning)."""
    from ..ops import msm2, msm3
    from ..ops.pallas_fold import rows_jac

    L = int(scalar_limbs.shape[0])
    nw = msm2.num_windows(L, c)
    half = 1 << (c - 1)
    W0 = nw * half
    cap = msm3._pow2ceil(max(2, n_local))
    fold = ("jacobian" if mode != "pallas"
            else msm3.default_fold())
    totals_kind = msm3.default_totals() if c >= 4 else "bits"

    def body(pk, inf, sl):
        fenc_sorted, starts_s, occ_s, lane_order, inv_order = msm2._schedule(
            L, c, nw, half, sl, inf
        )
        acc = msm3._group_pipeline(
            ops, cap, W0, mode, fold, False, jnp.uint32(0),
            jnp.uint32(W0), starts_s, occ_s, fenc_sorted, pk
        )[:, :W0]
        fn = (msm3._totals_hier if totals_kind == "hier"
              else msm3._totals_bits)
        U = fn(ops, nw, half, c, mode, acc, inv_order)
        return U[None]  # (1, RJ, c, 128) -> stacked over shards

    fn = jax.jit(shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(AXIS), P(None, AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    ))
    U_all = np.asarray(jax.device_get(fn(packed, inf_mask, scalar_limbs)))
    exps = msm3.totals_exps(c, totals_kind)
    total = point_cls.identity()
    for t in range(U_all.shape[0]):
        total = total + msm3._finish_host(
            ops, U_all[t], nw, c, point_cls, exps
        )
    return total


def sharded_msm(ops: curve.CurveOps, packed, inf_mask, scalar_limbs,
                mesh: Mesh, point_cls, c: int = 16, mode: str | None = None):
    """MSM over mesh-sharded points/scalars via the v3 tree-fold
    pipeline (ops/msm3.py), returning the host affine total.

    Layout is the per-host SPMD layout of a pod deployment: each device
    runs the FULL local pipeline on its shard — signed-digit sort,
    occupancy-grouped gather-once tree folds, bit-weighted window
    totals — exactly the window-parallel Pippenger of
    /root/reference/src/multiexp.rs:288-293 with the reference's rayon
    pool replaced by async XLA dispatch per device. All T local
    pipelines are dispatched before any result is awaited (the
    Waiter-future overlap of multicore.rs:33-76). The per-device
    (window, bit) totals U are tiny (rows_jac x c x 128), so the
    combine gathers them and finishes host-side with the same
    Horner + MSB->LSB window fold as the single-chip path — Jacobian
    addition over limb vectors is not a psum-able monoid, and T points
    per window are not worth a device collective.

    packed: (Cp, n) packed affine bases sharded P(None, AXIS);
    inf_mask: (n,) sharded P(AXIS); scalar_limbs: (L, n) plain-form
    limbs sharded P(None, AXIS). The MSM is order-invariant, so shard
    order never matters.
    """
    from ..ops import msm2, msm3

    if mode is None:
        mode = msm2.default_mode()
    T = mesh.devices.size
    n_global = int(scalar_limbs.shape[-1])
    if n_global % T == 0:
        n_local = n_global // T
        L = int(scalar_limbs.shape[0])
        W0 = msm2.num_windows(L, c) * (1 << (c - 1))
        import os as _os

        small_slots = int(_os.environ.get(
            "BELLMAN_TPU_MSM_SMALL_SLOTS", str(1 << 18)
        ))
        if msm3._pow2ceil(max(2, n_local)) * W0 <= small_slots:
            return _sharded_msm_spmd(
                ops, packed, inf_mask, scalar_limbs, mesh, point_cls,
                c, mode, n_local
            )

    pshards = {s.device: s.data for s in packed.addressable_shards}
    ishards = {s.device: s.data for s in inf_mask.addressable_shards}
    sshards = {s.device: s.data for s in scalar_limbs.addressable_shards}
    pending = []
    for dev, pk in pshards.items():
        bases = msm2.PackedBases(None, None, _packed=pk, _inf=ishards[dev])
        pending.append(
            msm3.msm3_start(ops, bases, sshards[dev], c=c, mode=mode)
        )
    total = point_cls.identity()
    for p in pending:
        total = total + msm3.msm3_finish(ops, p, point_cls)
    return total
