"""Retrace-free sumcheck executor: fixed buffer + dynamic Pallas grid.

The naive device executor re-jits its round kernels at every round because
the fold halves the table shape (s rounds → s distinct shapes → s trace +
lower passes; measured ~4 s/shape over the axon AOT even with the persistent
compile cache, which only skips backend compilation).  This executor keeps
the MLE tables in ONE (n_mles, B_max, L) buffer for the whole protocol and
passes the active length as a traced scalar:

* the fold kernel writes the folded half IN PLACE into the buffer prefix
  (input_output_aliases; safe because grid step j reads pair block 2j ahead
  of the write frontier j),
* both kernels take a *dynamic grid* (active/(2·tile) as a traced value),
  so every round reuses the single compiled executable,
* the tail (active < 2·tile) falls back to the host oracle — by then the
  whole table is a few hundred elements.

Exactly two kernel compilations per (n_mles, degree, comb, B_max) shape
family per process — and zero after the persistent cache is warm.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.config import FieldConfig, Fp
from ..fields.limbs import carry_sweep, limbs_to_int
from ..fields.montgomery import DeviceField, device_field
from ..ops.pallas_field import (
    _comb_terms_T,
    _const_specs,
    _ctx_consts,
    _eval_sums_width,
    _mont_add_T,
    _mont_mul_T,
    _mont_sub_T,
    _unpack_ctx,
)
from ..poly.device import fps_to_limbs, limbs_to_fp

TILE = 256  # pairs per grid step


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _fold_fixed(ctx: DeviceField, buf: jnp.ndarray, r: jnp.ndarray, nb):
    """In-place halving fold of the active prefix (nb blocks of 2·TILE)."""
    n_mles, b_max, l = buf.shape

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, r_ref, o_ref = refs[5], refs[6], refs[7]
        blk = t_ref[:]  # (n_mles, 2T, l)
        pairs = blk.reshape(n_mles, TILE, 2, l)
        rb = jnp.broadcast_to(r_ref[:][:, None], (l, TILE))
        for i in range(n_mles):
            v0 = pairs[i, :, 0, :].T
            v1 = pairs[i, :, 1, :].T
            folded = _mont_add_T(kctx, v0, _mont_mul_T(kctx, _mont_sub_T(kctx, v1, v0), rb))
            o_ref[i, :, :] = folded.T

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_mles, b_max, l), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, 2 * TILE, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_mles, TILE, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        grid=(nb,),
        input_output_aliases={5: 0},
    )(*_ctx_consts(ctx), buf, r)


def _eval_body(kctx, pairs, c_ref, degree, idx_terms, kinds, n_mles, l):
    """Shared eval: (n_mles, T, 2, l) pairs → (P, lw) canonical part sums."""
    lw = _eval_sums_width(l)
    n_points = degree + 1
    width = pairs.shape[1]
    v0s, v1s, steps = [], [], []
    for i in range(n_mles):
        v0 = pairs[i, :, 0, :].T  # (l, T)
        v1 = pairs[i, :, 1, :].T
        v0s.append(v0)
        v1s.append(v1)
        steps.append(_mont_sub_T(kctx, v1, v0))
    point_vals = [v0s, v1s]
    cur = v1s
    for _ in range(2, degree + 1):
        cur = [_mont_add_T(kctx, cur[i], steps[i]) for i in range(n_mles)]
        point_vals.append(cur)
    parts = []
    for pv in point_vals[:n_points]:
        comb = _comb_terms_T(kctx, pv, c_ref, kinds, idx_terms, l, width)
        s = jnp.sum(comb.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.uint32)
        parts.append(s.T)
    part = jnp.concatenate(parts, axis=0)  # (P, l)
    return jnp.concatenate([part, jnp.zeros((n_points, lw - l), jnp.uint32)], axis=1)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _eval_fixed(
    ctx: DeviceField,
    buf: jnp.ndarray,
    coeffs: jnp.ndarray,
    degree: int,
    idx_terms: tuple,
    kinds: tuple,
    nb,
):
    """Round evaluations over the active prefix (nb blocks of 2·TILE)."""
    n_mles, b_max, l = buf.shape
    lw = _eval_sums_width(l)
    n_points = degree + 1

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, c_ref, o_ref = refs[5], refs[6], refs[7]
        pairs = t_ref[:].reshape(n_mles, TILE, 2, l)
        part = _eval_body(kctx, pairs, c_ref, degree, idx_terms, kinds, n_mles, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros((n_points, lw), jnp.uint32)

        o_ref[:] = carry_sweep(o_ref[:] + part, lw)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_points, lw), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, 2 * TILE, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(coeffs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_points, lw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        grid=(nb,),
    )(*_ctx_consts(ctx), buf, coeffs)


@partial(jax.jit, static_argnums=(0, 4, 5, 6), donate_argnums=(1,))
def _fold_eval_fixed(
    ctx: DeviceField,
    buf: jnp.ndarray,
    r: jnp.ndarray,
    coeffs: jnp.ndarray,
    degree: int,
    idx_terms: tuple,
    kinds: tuple,
    nb,
):
    """Fused round: fold the active prefix in place AND evaluate the folded
    pairs — one kernel launch per round instead of two.

    Each grid block reads 4·TILE raw entries (2·TILE fold pairs), writes the
    2·TILE folded entries into the buffer prefix (aliased; write frontier
    2T·i trails the read frontier 4T·i), and contributes TILE eval pairs to
    the accumulated claim sums.
    """
    n_mles, b_max, l = buf.shape
    lw = _eval_sums_width(l)
    n_points = degree + 1

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, r_ref, c_ref, o_ref, s_ref = refs[5], refs[6], refs[7], refs[8], refs[9]
        blk = t_ref[:]  # (n_mles, 4T, l)
        fold_pairs = blk.reshape(n_mles, 2 * TILE, 2, l)
        rb = jnp.broadcast_to(r_ref[:][:, None], (l, 2 * TILE))
        folded = []
        for i in range(n_mles):
            v0 = fold_pairs[i, :, 0, :].T  # (l, 2T)
            v1 = fold_pairs[i, :, 1, :].T
            f = _mont_add_T(kctx, v0, _mont_mul_T(kctx, _mont_sub_T(kctx, v1, v0), rb))
            folded.append(f)
            o_ref[i, :, :] = f.T

        # eval pairs of the folded block: lanes (2j, 2j+1) of each (l, 2T)
        pairs = jnp.stack([f.T for f in folded]).reshape(n_mles, TILE, 2, l)
        part = _eval_body(kctx, pairs, c_ref, degree, idx_terms, kinds, n_mles, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            s_ref[:] = jnp.zeros((n_points, lw), jnp.uint32)

        s_ref[:] = carry_sweep(s_ref[:] + part, lw)

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_mles, b_max, l), jnp.uint32),
            jax.ShapeDtypeStruct((n_points, lw), jnp.uint32),
        ),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, 4 * TILE, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(coeffs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_mles, 2 * TILE, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_points, lw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        grid=(nb,),
        input_output_aliases={5: 0},
    )(*_ctx_consts(ctx), buf, r, coeffs)


class PallasSumcheckExecutor:
    """Drop-in for DeviceSumcheckExecutor: one compile per shape family."""

    def __init__(self, cfg: FieldConfig, tables: jnp.ndarray, degree: int, comb):
        self.cfg = cfg
        self.ctx = device_field(cfg)
        self.degree = degree
        self.comb = comb
        self.coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
        self.idx_terms = tuple(tuple(idxs) for _, idxs in comb)
        one = cfg.one()
        neg_one = -one
        self.kinds = tuple(
            "u" if c == one else ("n" if c == neg_one else "g") for c, _ in comb
        )
        self.buf = jnp.asarray(tables)
        self.active = tables.shape[1]
        self._host_mles: list[list[Fp]] | None = None

    # -- host tail -----------------------------------------------------------

    def _demote_to_host(self) -> None:
        arr = np.asarray(self.buf[:, : self.active, :])
        self._host_mles = [
            [limbs_to_fp(arr[i, b], self.cfg) for b in range(self.active)]
            for i in range(arr.shape[0])
        ]
        self.buf = None

    def _host_round(self, r_prev: Fp | None, fold_done: bool) -> list[Fp]:
        from .prover import _fold, _round_evals

        if r_prev is not None and not fold_done:
            self._host_mles = _fold(self._host_mles, r_prev)
        return _round_evals(self._host_mles, self.degree, self.comb, self.cfg)

    # -- protocol interface ----------------------------------------------------

    def _decode(self, wide) -> list[Fp]:
        wide = np.asarray(wide)
        return [
            self.cfg.fp_from_mont(limbs_to_int(wide[t]) % self.cfg.q)
            for t in range(wide.shape[0])
        ]

    def round(self, r_prev: Fp | None) -> list[Fp]:
        if self._host_mles is not None:
            return self._host_round(r_prev, fold_done=False)
        if r_prev is None:
            if self.active < 2 * TILE:
                self._demote_to_host()
                return self._host_round(None, fold_done=True)
            return self._decode(
                _eval_fixed(
                    self.ctx, self.buf, self.coeffs, self.degree, self.idx_terms,
                    self.kinds, self.active // (2 * TILE),
                )
            )
        r = jnp.asarray(fps_to_limbs([r_prev], self.cfg)[0])
        if self.active >= 4 * TILE:
            # fused fold + evaluate: one launch per round
            self.buf, wide = _fold_eval_fixed(
                self.ctx, self.buf, r, self.coeffs, self.degree, self.idx_terms,
                self.kinds, self.active // (4 * TILE),
            )
            self.active //= 2
            return self._decode(wide)
        # 2·TILE ≤ active < 4·TILE: fold once more, then finish on host
        self.buf = _fold_fixed(self.ctx, self.buf, r, self.active // (2 * TILE))
        self.active //= 2
        self._demote_to_host()
        return self._host_round(r_prev, fold_done=True)

    def final_fold(self, r: Fp):
        if self._host_mles is not None:
            from .prover import _fold

            self._host_mles = _fold(self._host_mles, r)
            return self._host_mles
        rl = jnp.asarray(fps_to_limbs([r], self.cfg)[0])
        self.buf = _fold_fixed(self.ctx, self.buf, rl, self.active // (2 * TILE))
        self.active //= 2
        return self.buf

    def final_values(self) -> list[Fp]:
        if self._host_mles is not None:
            assert all(len(m) == 1 for m in self._host_mles)
            return [m[0] for m in self._host_mles]
        arr = np.asarray(self.buf[:, :1, :])
        return [limbs_to_fp(arr[i, 0], self.cfg) for i in range(arr.shape[0])]
