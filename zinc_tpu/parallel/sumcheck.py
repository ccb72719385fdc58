"""Sharded sumcheck executor: the hypercube axis block-sharded over a mesh.

Per round, every device runs the same fused fold-and-evaluate body as the
single-chip executor (sumcheck/device.py:_round_body) on its contiguous block
of the 2^s eval tables, then the (degree+1) lazy wide claim sums are closed
with one ``psum`` over the mesh axis — the TPU-native replacement for the
reference's Rayon fold/reduce (/root/reference/src/sumcheck/prover.rs:126-176).

Because the tables are block-sharded and the fold pairs adjacent entries
(2b, 2b+1), the first s − log2(D) − 1 rounds need no data movement at all;
once the per-device block is too small to pair locally the executor gathers
the (tiny — ≤ 2·D·n_mles elements) remainder and finishes on replicated
state.  The transcript is bit-identical to the unsharded run: the psum'd
lazy sums decode to the same integers because limb lanes are summed exactly
(uint32 lanes hold ≤ 2^16·D < 2^32 for any real mesh).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.config import FieldConfig, Fp
from ..fields.limbs import limbs_to_int
from ..fields.montgomery import DeviceField, device_field
from ..poly.device import fps_to_limbs, limbs_to_fp
from ..sumcheck.device import DeviceSumcheckExecutor, _final_fold, _round_body


@lru_cache(maxsize=64)
def _sharded_round_fn(mesh: Mesh, ctx: DeviceField, first: bool, degree: int, idx_terms: tuple):
    # the hypercube axis is sharded over ALL mesh axes (works for 1-D and
    # 2-D production meshes alike; psum closes over every axis)
    axes = tuple(mesh.axis_names)

    def local_round(tables, r, coeffs):
        new_tables, wide = _round_body(ctx, tables, (r, coeffs), first, degree, idx_terms)
        return new_tables, jax.lax.psum(wide, axes)

    fn = jax.shard_map(
        local_round,
        mesh=mesh,
        in_specs=(P(None, axes, None), P(None), P(None, None)),
        out_specs=(P(None, axes, None), P(None, None)),
    )
    return jax.jit(fn)


@lru_cache(maxsize=32)
def _sharded_fold_fn(mesh: Mesh, ctx: DeviceField):
    axes = tuple(mesh.axis_names)

    def local_fold(tables, r):
        return _final_fold(ctx, tables, r)

    fn = jax.shard_map(
        local_fold,
        mesh=mesh,
        in_specs=(P(None, axes, None), P(None)),
        out_specs=P(None, axes, None),
    )
    return jax.jit(fn)


class ShardedSumcheckExecutor:
    """Drop-in for DeviceSumcheckExecutor with the 2^nv axis mesh-sharded.

    Delegates to a replicated single-device executor once the per-device
    block is too small to fold locally (the last ~log2(D) rounds, O(D·n_mles)
    work — negligible).
    """

    def __init__(self, cfg: FieldConfig, tables: jnp.ndarray, degree: int, comb, mesh: Mesh):
        self.cfg = cfg
        self.ctx = device_field(cfg)
        self.mesh = mesh
        self.degree = degree
        self.coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
        self.idx_terms = tuple(tuple(idxs) for _, idxs in comb)
        self._comb = comb
        d = mesh.size
        axes = tuple(mesh.axis_names)
        if tables.shape[1] % d == 0 and tables.shape[1] >= 2 * d:
            self.tables = jax.device_put(
                tables, NamedSharding(mesh, P(None, axes, None))
            )
            self._inner: DeviceSumcheckExecutor | None = None
        else:
            self.tables = None
            self._inner = DeviceSumcheckExecutor(cfg, jnp.asarray(tables), degree, comb)
        self._first = True

    def _maybe_demote(self) -> None:
        """Gather to a replicated executor when local blocks can't pair."""
        if self._inner is not None:
            return
        b = self.tables.shape[1]
        d = self.mesh.size
        # a sharded round folds (except the first) then pairs: needs b_local
        # after folding to still be even.
        need = 2 * d if self._first else 4 * d
        if b < need or (b // d) % 2 != 0:
            gathered = jax.device_put(
                self.tables, NamedSharding(self.mesh, P(None, None, None))
            )
            self._inner = DeviceSumcheckExecutor(
                self.cfg, gathered, self.degree, self._comb
            )
            self.tables = None

    def round(self, r_prev: Fp | None) -> list[Fp]:
        self._maybe_demote()
        if self._inner is not None:
            return self._inner.round(r_prev)
        first = r_prev is None
        r = jnp.asarray(
            fps_to_limbs([r_prev if r_prev is not None else self.cfg.zero()], self.cfg)[0]
        )
        fn = _sharded_round_fn(self.mesh, self.ctx, first, self.degree, self.idx_terms)
        self.tables, wide = fn(self.tables, r, self.coeffs)
        self._first = False
        wide_np = np.asarray(wide)
        return [
            self.cfg.fp_from_mont(limbs_to_int(wide_np[t]) % self.cfg.q)
            for t in range(wide_np.shape[0])
        ]

    def final_fold(self, r: Fp):
        if self._inner is None:
            b, d = self.tables.shape[1], self.mesh.size
            if b < 2 * d or (b // d) % 2 != 0:
                gathered = jax.device_put(
                    self.tables, NamedSharding(self.mesh, P(None, None, None))
                )
                self._inner = DeviceSumcheckExecutor(
                    self.cfg, gathered, self.degree, self._comb
                )
                self.tables = None
        if self._inner is not None:
            return self._inner.final_fold(r)
        rl = jnp.asarray(fps_to_limbs([r], self.cfg)[0])
        self.tables = _sharded_fold_fn(self.mesh, self.ctx)(self.tables, rl)
        return self.tables

    def final_values(self) -> list[Fp]:
        if self._inner is not None:
            return self._inner.final_values()
        tables = np.asarray(self.tables)
        assert tables.shape[1] == 1
        return [limbs_to_fp(tables[i, 0], self.cfg) for i in range(tables.shape[0])]
