"""Sparse matrices over ℤ and over the random field.

Row-major list-of-rows representation matching the reference
(/root/reference/src/sparse_matrix.rs:12-17): ``rows[i]`` is a list of
``(value, col)`` pairs.  Padding is metadata-only (pad_rows/pad_cols).

Besides the reference operations (mat_vec_mul, compute_eval_table_sparse,
FieldMap projection) this adds ``evaluate_mle``: the O(nnz) sparse evaluation
of the matrix MLE at a split point — the verifier-side replacement for the
reference's dense ``from_matrix`` + ``evaluate`` (which materializes all
2^(s+s') entries, /root/reference/src/zinc/verifier.rs:249-261).
"""

from __future__ import annotations

from .fields.config import FieldConfig, Fp
from .poly.mle import build_eq_x_r_vec


class SparseMatrix:
    """Sparse matrix; values are ints (ℤ flavor) or Fp (field flavor)."""

    __slots__ = ("n_rows", "n_cols", "rows", "_packed")

    def __init__(self, n_rows: int, n_cols: int, rows: list):
        self.n_rows = n_rows
        self.n_cols = n_cols
        self.rows = rows  # list[list[(value, col)]]
        self._packed = None

    def packed_coo(self):
        """Memoized COO packing ``(rows i32, cols i32, vals)`` for device
        uploads and native mirrors.  The O(nnz) Python walk over the row
        lists is a measured ~1 s/matrix/call at 2^20, and both the prover
        and the verifier re-upload the same statement matrices on every
        proof — so it is built once per matrix.  ``vals`` is an int64
        ndarray when every (integer) value fits, else the original value
        list (wide ints / field elements)."""
        if self._packed is None:
            import numpy as np

            rs, cs, vs = [], [], []
            for i, row in enumerate(self.rows):
                if not row:
                    continue
                rs.extend([i] * len(row))
                cs.extend(c for _, c in row)
                vs.extend(v for v, _ in row)
            rows_np = np.array(rs, np.int32)
            cols_np = np.array(cs, np.int32)
            vals: object = vs
            if not vs or (
                isinstance(vs[0], int)
                and all(-(1 << 63) <= v < (1 << 63) for v in vs)
            ):
                vals = np.array(vs, np.int64)
            self._packed = (rows_np, cols_np, vals)
        return self._packed

    @staticmethod
    def from_dense(dense: list[list]) -> "SparseMatrix":
        rows = []
        for drow in dense:
            row = []
            for col, v in enumerate(drow):
                nz = not v.is_zero() if isinstance(v, Fp) else v != 0
                if nz:
                    row.append((v, col))
            rows.append(row)
        return SparseMatrix(len(dense), len(dense[0]), rows)

    def pad_rows(self, new_size: int) -> None:
        if new_size > self.n_rows:
            self.n_rows = new_size

    def pad_cols(self, new_size: int) -> None:
        if new_size > self.n_cols:
            self.n_cols = new_size

    def map_to_field(self, cfg: FieldConfig) -> "SparseMatrix":
        rows = [[(cfg.fp(v), c) for v, c in row] for row in self.rows]
        return SparseMatrix(self.n_rows, self.n_cols, rows)

    def to_dense(self, zero):
        d = [[zero for _ in range(self.n_cols)] for _ in range(self.n_rows)]
        for i, row in enumerate(self.rows):
            for v, c in row:
                d[i][c] = v
        return d

    def nnz(self) -> int:
        return sum(len(r) for r in self.rows)


def mat_vec_mul(m: SparseMatrix, z: list):
    """M·z for both flavors; result has len(m.rows) entries (logical padding
    to n_rows is the caller's concern, as in the reference)."""
    if m.n_cols != len(z):
        raise ValueError(f"matrix has {m.n_cols} cols, vector has {len(z)}")
    out = []
    for row in m.rows:
        acc = None
        for v, c in row:
            t = z[c] * v
            acc = t if acc is None else acc + t
        if acc is None:
            z0 = z[0]
            acc = z0.cfg.zero() if isinstance(z0, Fp) else 0
        out.append(acc)
    return out


def compute_eval_table_sparse(
    m: SparseMatrix, rx: list[Fp], num_rows: int, num_cols: int, cfg: FieldConfig
) -> list[Fp]:
    """rᵀ·M accumulation (/root/reference/src/sparse_matrix.rs:165-182)."""
    assert len(rx) == num_rows
    out = [cfg.zero() for _ in range(num_cols)]
    for row_i, row in enumerate(m.rows):
        rv = rx[row_i]
        for v, c in row:
            out[c] = out[c] + rv * v
    return out


def evaluate_mle(m: SparseMatrix, r_row: list[Fp], r_col: list[Fp], cfg: FieldConfig) -> Fp:
    """M̃(r_row, r_col) = Σ_{(i,j)∈nnz} M[i,j]·eq(i, r_row)·eq(j, r_col).

    Equals the reference's column-major ``from_matrix`` + ``evaluate`` at the
    concatenated point [r_row ‖ r_col] (row bits are the low variables), in
    O(nnz + 2^s + 2^s') instead of O(2^(s+s'))."""
    eq_row = build_eq_x_r_vec(r_row) if r_row else [cfg.one()]
    eq_col = build_eq_x_r_vec(r_col) if r_col else [cfg.one()]
    acc = cfg.zero()
    for i, row in enumerate(m.rows):
        ei = eq_row[i]
        for v, c in row:
            acc = acc + ei * eq_col[c] * v
    return acc
