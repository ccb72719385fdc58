"""Device-resident MLE operations: fold, evaluate, eq-table (jnp, jittable).

The MLE table lives in HBM as a (B, L) uint32 array of Montgomery residues
(B = 2^num_vars hypercube points, L = 16-bit limbs).  The per-round fold
``out[b] = left + r·(right−left)`` halves B; pairing is index-contiguous
(little-endian variable order: the first variable is the fastest bit), so the
fold is a reshape — no strided gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import FieldConfig, Fp
from ..fields.limbs import ints_to_limbs, limbs_to_int
from ..fields.montgomery import (
    DeviceField,
    device_field,
    mont_add,
    mont_mul,
    mont_sub,
)


def fp_to_limbs(fe: Fp) -> np.ndarray:
    return ints_to_limbs([fe.m], 4 * fe.cfg.n64)[0]


def fps_to_limbs(fes: list[Fp], cfg: FieldConfig) -> np.ndarray:
    return ints_to_limbs([fe.m for fe in fes], cfg.n16)


def limbs_to_fp(limbs, cfg: FieldConfig) -> Fp:
    return cfg.fp_from_mont(limbs_to_int(np.asarray(limbs)))


def fold_once(ctx: DeviceField, table: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """One sumcheck fold of a (..., B, L) table by scalar r (L,) → (..., B/2, L)."""
    b = table.shape[-2]
    pairs = table.reshape(table.shape[:-2] + (b // 2, 2, table.shape[-1]))
    left = pairs[..., 0, :]
    right = pairs[..., 1, :]
    return mont_add(ctx, left, mont_mul(ctx, mont_sub(ctx, right, left), r))


@partial(jax.jit, static_argnums=0)
def _evaluate_device(ctx: DeviceField, table: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    for i in range(point.shape[0]):
        table = fold_once(ctx, table, point[i])
    return table[0]


def evaluate_mle_device(cfg: FieldConfig, table: jnp.ndarray, point: list[Fp]) -> Fp:
    """Full MLE evaluation of a device table at a host point."""
    ctx = device_field(cfg)
    nv = int(np.log2(table.shape[0]))
    assert len(point) == nv
    if nv == 0:
        return limbs_to_fp(np.asarray(table[0]), cfg)
    pt = jnp.asarray(fps_to_limbs(point, cfg))
    out = _evaluate_device(ctx, table, pt)
    return limbs_to_fp(np.asarray(out), cfg)


@partial(jax.jit, static_argnums=0)
def _eq_table_device(ctx: DeviceField, r: jnp.ndarray) -> jnp.ndarray:
    s = r.shape[0]
    buf = jnp.asarray(ctx.one)[None, :]  # (1, L)
    for j in range(s - 1, -1, -1):
        t = mont_mul(ctx, buf, r[j])
        lo = mont_sub(ctx, buf, t)
        buf = jnp.stack([lo, t], axis=1).reshape(-1, buf.shape[-1])
    return buf


def build_eq_table_device(cfg: FieldConfig, r: list[Fp]) -> jnp.ndarray:
    """eq(x, r) table on device: (2^s, L), index bit j ↔ r[j]."""
    ctx = device_field(cfg)
    return _eq_table_device(ctx, jnp.asarray(fps_to_limbs(r, cfg)))


def mle_to_device(cfg: FieldConfig, evaluations: list[Fp]) -> jnp.ndarray:
    return jnp.asarray(fps_to_limbs(evaluations, cfg))


def mle_from_device(cfg: FieldConfig, table) -> list[Fp]:
    arr = np.asarray(table)
    return [cfg.fp_from_mont(limbs_to_int(arr[i])) for i in range(arr.shape[0])]
