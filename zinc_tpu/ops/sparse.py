"""Device sparse-matrix kernels (CSR-on-arrays + segment sums).

The CCS matrices are unstructured sparse; on TPU the two hot products —
M·z (sumcheck 1 setup) and eqᵀ·M (sumcheck 2's evaluation table,
/root/reference/src/sparse_matrix.rs:165-182) — become gather → Montgomery
multiply → per-limb lazy ``segment_sum`` → one wide mod-q reduction.  Sorting
by output index happens once at matrix upload; the kernels themselves are
scatter-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import FieldConfig
from ..fields.limbs import carry_sweep
from ..fields.montgomery import DeviceField, device_field, mod_reduce_wide, mont_mul
from ..sparse import SparseMatrix


@dataclass
class DeviceCsr:
    """One sparse matrix uploaded for device products (both orientations)."""

    rows_idx: jnp.ndarray  # (nnz,) int32
    cols_idx: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz, L) Montgomery residues
    n_rows: int
    n_cols: int


def upload_matrix(cfg: FieldConfig, m: SparseMatrix) -> DeviceCsr:
    """Project an integer sparse matrix into the field and upload as arrays."""
    from .field_map import i64_to_field_device, ints_to_field_device

    rows, cols, vals = [], [], []
    for i, row in enumerate(m.rows):
        for v, c in row:
            rows.append(i)
            cols.append(c)
            vals.append(v)
    if all(-(1 << 63) <= v < (1 << 63) for v in vals):
        vals_f = i64_to_field_device(cfg, np.array(vals, np.int64))
    else:
        vals_f = ints_to_field_device(cfg, vals)
    return DeviceCsr(
        rows_idx=jnp.asarray(np.array(rows, np.int32)),
        cols_idx=jnp.asarray(np.array(cols, np.int32)),
        vals=vals_f,
        n_rows=m.n_rows,
        n_cols=m.n_cols,
    )


def upload_matrix_f(cfg: FieldConfig, m: SparseMatrix) -> DeviceCsr:
    """Upload a FIELD-valued sparse matrix (entries already Fp)."""
    from ..poly.device import fps_to_limbs

    rows, cols, vals = [], [], []
    for i, row in enumerate(m.rows):
        for v, c in row:
            rows.append(i)
            cols.append(c)
            vals.append(v)
    return DeviceCsr(
        rows_idx=jnp.asarray(np.array(rows, np.int32)),
        cols_idx=jnp.asarray(np.array(cols, np.int32)),
        vals=jnp.asarray(fps_to_limbs(vals, cfg)),
        n_rows=m.n_rows,
        n_cols=m.n_cols,
    )


@partial(jax.jit, static_argnums=(0, 4))
def _segmented_matvec(
    ctx: DeviceField,
    vals: jnp.ndarray,  # (nnz, L)
    gather_idx: jnp.ndarray,  # (nnz,) into vec
    segment_idx: jnp.ndarray,  # (nnz,) output positions
    num_segments: int,
    vec: jnp.ndarray,  # (N, L)
) -> jnp.ndarray:
    prod = mont_mul(ctx, vals, vec[gather_idx])  # (nnz, L) canonical
    lazy = jax.ops.segment_sum(prod, segment_idx, num_segments=num_segments)
    wide = carry_sweep(lazy, ctx.n16 + 2)
    return mod_reduce_wide(ctx, wide)


def mat_vec_mul_device(cfg: FieldConfig, m: DeviceCsr, z: jnp.ndarray) -> jnp.ndarray:
    """M·z over the field: (n_rows, L).  Requires per-row nnz ≤ 2^15."""
    ctx = device_field(cfg)
    return _segmented_matvec(ctx, m.vals, m.cols_idx, m.rows_idx, m.n_rows, z)


def eval_table_device(cfg: FieldConfig, m: DeviceCsr, rx: jnp.ndarray, num_cols: int) -> jnp.ndarray:
    """rxᵀ·M over the field: (num_cols, L).  Requires per-col nnz ≤ 2^15."""
    ctx = device_field(cfg)
    return _segmented_matvec(ctx, m.vals, m.rows_idx, m.cols_idx, num_cols, rx)


@partial(jax.jit, static_argnums=0)
def _mle_eval_kernel(ctx, vals, rows_idx, cols_idx, eq_rx, eq_ry):
    from ..fields.montgomery import lazy_sum

    prod = mont_mul(ctx, vals, eq_rx[rows_idx])
    prod = mont_mul(ctx, prod, eq_ry[cols_idx])
    wide = lazy_sum(ctx, prod, axis=0)
    return mod_reduce_wide(ctx, wide[None, :])[0]


def evaluate_mle_device(cfg: FieldConfig, m: DeviceCsr, r_row: list, r_col: list):
    """M̃(r_row ‖ r_col) = Σ_{(v,r,c)} v·eq(r_row)[r]·eq(r_col)[c] on device.

    The sparse analog of the verifier's final matrix evaluations
    (/root/reference/src/zinc/verifier.rs:249-261 materializes the dense
    matrix MLE; here it is one gather-multiply-reduce over nnz).
    """
    from ..poly.device import build_eq_table_device, limbs_to_fp

    ctx = device_field(cfg)
    eq_rx = build_eq_table_device(cfg, r_row)
    eq_ry = build_eq_table_device(cfg, r_col)
    out = _mle_eval_kernel(ctx, m.vals, m.rows_idx, m.cols_idx, eq_rx, eq_ry)
    return limbs_to_fp(np.asarray(out), cfg)
