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
    """One sparse matrix uploaded for device products (both orientations).

    Entries are stored row-major (rows_idx sorted), so row-segment sums are
    prefix-sum boundary differences — measured ~2× faster than scatter-based
    ``segment_sum`` on TPU.  For the transposed orientation a column-sorted
    copy (permuted once at upload) plus its boundaries is kept as well.
    """

    rows_idx: jnp.ndarray  # (nnz,) int32, sorted
    cols_idx: jnp.ndarray  # (nnz,) int32 (row-major order)
    vals: jnp.ndarray  # (nnz, L) Montgomery residues
    row_ends: jnp.ndarray  # (n_rows+1,) int32 prefix boundaries
    vals_by_col: jnp.ndarray  # (nnz, L) column-sorted copy
    rows_by_col: jnp.ndarray  # (nnz,) int32 row index, column-sorted
    col_ends: jnp.ndarray  # (n_cols+1,) int32
    n_rows: int
    n_cols: int


def upload_matrix(
    cfg: FieldConfig, m: SparseMatrix, with_col_views: bool = True
) -> DeviceCsr:
    """Project an integer sparse matrix into the field and upload as arrays.

    ``with_col_views=False`` skips the column-sorted copy/boundaries (only
    the prover's transposed products need them) — the verifier's final
    evaluations consume just ``vals``/``rows_idx``/``cols_idx``, and halving
    the payload matters over the tunnel."""
    from .field_map import i64_to_field_device, ints_to_field_device

    rows_np, cols_np, vals = m.packed_coo()
    if isinstance(vals, np.ndarray):
        vals_f = i64_to_field_device(cfg, vals)
    else:
        vals_f = ints_to_field_device(cfg, vals)
    return _make_csr(rows_np, cols_np, vals_f, m.n_rows, m.n_cols,
                     with_col_views)


def _make_csr(rows_np, cols_np, vals_f, n_rows, n_cols,
              with_col_views: bool = True) -> DeviceCsr:
    row_ends = np.searchsorted(rows_np, np.arange(n_rows + 1), side="left")
    if with_col_views:
        perm = np.argsort(cols_np, kind="stable")
        cols_sorted = cols_np[perm]
        col_ends = np.searchsorted(cols_sorted, np.arange(n_cols + 1), side="left")
        perm_d = jnp.asarray(perm.astype(np.int32))
    return DeviceCsr(
        rows_idx=jnp.asarray(rows_np),
        cols_idx=jnp.asarray(cols_np),
        vals=vals_f,
        row_ends=jnp.asarray(row_ends.astype(np.int32)),
        vals_by_col=vals_f[perm_d] if with_col_views else None,
        rows_by_col=jnp.asarray(rows_np[perm].astype(np.int32))
        if with_col_views else None,
        col_ends=jnp.asarray(col_ends.astype(np.int32))
        if with_col_views else None,
        n_rows=n_rows,
        n_cols=n_cols,
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
    return _make_csr(np.array(rows, np.int32), np.array(cols, np.int32),
                     jnp.asarray(fps_to_limbs(vals, cfg)), m.n_rows, m.n_cols)


def _mont_mul_best(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas mont_mul on TPU (2.5 vs 46 ms per 2^20), XLA elsewhere.
    Pads the batch to a tile multiple so Pallas never falls back to one
    giant VMEM block."""
    n = a.shape[0]
    if jax.default_backend() == "tpu" and n >= 2048:
        from .pallas_field import mont_mul_pallas_t

        tile = 2048
        pad = (-n) % tile
        if pad:
            zz = jnp.zeros((pad, a.shape[1]), a.dtype)
            a = jnp.concatenate([a, zz])
            b = jnp.concatenate([b, zz])
        return mont_mul_pallas_t(ctx, a, b, tile)[:n]
    return mont_mul(ctx, a, b)


@partial(jax.jit, static_argnums=(0,))
def _segmented_matvec(
    ctx: DeviceField,
    vals: jnp.ndarray,  # (nnz, L), sorted by output segment
    gather_idx: jnp.ndarray,  # (nnz,) into vec
    ends: jnp.ndarray,  # (num_segments+1,) prefix boundaries
    vec: jnp.ndarray,  # (N, L)
) -> jnp.ndarray:
    """Sorted-segment sums as prefix-sum boundary differences (mod 2^32 —
    exact because true per-segment column sums stay < 2^31 for per-segment
    nnz ≤ 2^15)."""
    prod = _mont_mul_best(ctx, vals, vec[gather_idx])  # (nnz, L) canonical
    cs = jnp.cumsum(prod.astype(jnp.uint32), axis=0)
    padded = jnp.concatenate([jnp.zeros((1, prod.shape[1]), jnp.uint32), cs], axis=0)
    lazy = padded[ends[1:]] - padded[ends[:-1]]
    wide = carry_sweep(lazy, ctx.n16 + 2)
    return mod_reduce_wide(ctx, wide)


def mat_vec_mul_device(cfg: FieldConfig, m: DeviceCsr, z: jnp.ndarray) -> jnp.ndarray:
    """M·z over the field: (n_rows, L).  Requires per-row nnz ≤ 2^15."""
    ctx = device_field(cfg)
    return _segmented_matvec(ctx, m.vals, m.cols_idx, m.row_ends, z)


def eval_table_device(cfg: FieldConfig, m: DeviceCsr, rx: jnp.ndarray, num_cols: int) -> jnp.ndarray:
    """rxᵀ·M over the field: (num_cols, L).  Requires per-col nnz ≤ 2^15."""
    ctx = device_field(cfg)
    return _segmented_matvec(ctx, m.vals_by_col, m.rows_by_col, m.col_ends, rx)


@partial(jax.jit, static_argnums=0)
def _mle_eval_kernel(ctx, vals, rows_idx, cols_idx, eq_rx, eq_ry):
    from ..fields.montgomery import lazy_sum

    prod = _mont_mul_best(ctx, vals, eq_rx[rows_idx])
    prod = _mont_mul_best(ctx, prod, eq_ry[cols_idx])
    wide = lazy_sum(ctx, prod, axis=0)
    return mod_reduce_wide(ctx, wide[None, :])[0]


def evaluate_mle_device(cfg: FieldConfig, m: DeviceCsr, r_row: list, r_col: list):
    """M̃(r_row ‖ r_col) = Σ_{(v,r,c)} v·eq(r_row)[r]·eq(r_col)[c] on device.

    The sparse analog of the verifier's final matrix evaluations
    (/root/reference/src/zinc/verifier.rs:249-261 materializes the dense
    matrix MLE; here it is one gather-multiply-reduce over nnz).
    """
    return evaluate_mles_device(cfg, [m], r_row, r_col)[0]


def dispatch_mle_evals(cfg: FieldConfig, ms, r_row: list, r_col: list) -> list:
    """Enqueue M̃ⱼ(r_row ‖ r_col) for several matrices and start their async
    host copies — returns device handles WITHOUT blocking.  The eq tables
    are built once and shared across the matrices."""
    from ..poly.device import build_eq_table_device

    ctx = device_field(cfg)
    eq_rx = build_eq_table_device(cfg, r_row)
    eq_ry = build_eq_table_device(cfg, r_col)
    outs = [
        _mle_eval_kernel(ctx, m.vals, m.rows_idx, m.cols_idx, eq_rx, eq_ry)
        for m in ms
    ]
    for o in outs:
        if hasattr(o, "copy_to_host_async"):
            o.copy_to_host_async()
    return outs


def fetch_mle_evals(cfg: FieldConfig, handles) -> list:
    """Block on :func:`dispatch_mle_evals` handles → field elements."""
    from ..poly.device import limbs_to_fp

    return [limbs_to_fp(np.asarray(o), cfg) for o in handles]


def evaluate_mles_device(cfg: FieldConfig, ms, r_row: list, r_col: list) -> list:
    """Batched M̃ⱼ(r_row ‖ r_col): dispatch everything, fetch once."""
    return fetch_mle_evals(cfg, dispatch_mle_evals(cfg, ms, r_row, r_col))
