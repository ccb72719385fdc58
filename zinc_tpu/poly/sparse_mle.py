"""Sparse multilinear extensions (dict-backed) over the field and over ℤ.

Mirror of /root/reference/src/poly_f/mle/sparse.rs:22-541 and
/root/reference/src/poly_z/mle/sparse.rs (the BTreeMap-backed twins of the
dense MLEs): entries are {index: value} with the same little-endian
variable order as the dense layout (poly/mle.py).  Host backend — sparse
MLEs only appear at setup/verification scale in the protocol, never on the
prover's hot path.
"""

from __future__ import annotations

from ..fields.config import FieldConfig, Fp
from .mle import DenseMleF, DenseMleZ


class SparseMleF:
    """Sparse MLE over the random field.

    Reference: SparseMultilinearExtension (src/poly_f/mle/sparse.rs:22-30);
    `from_sparse_slice` (:121), `evaluate` (:56), `fix_variables` (:169),
    `to_dense` == `to_evaluations` (:199).
    """

    __slots__ = ("num_vars", "entries", "cfg")

    def __init__(self, num_vars: int, entries: dict[int, Fp], cfg: FieldConfig):
        for idx in entries:
            if idx >= 1 << num_vars:
                raise ValueError(f"index {idx} out of range for {num_vars} vars")
        self.num_vars = num_vars
        self.entries = {i: v for i, v in entries.items() if not v.is_zero()}
        self.cfg = cfg

    @staticmethod
    def from_sparse_slice(num_vars: int, pairs, cfg: FieldConfig) -> "SparseMleF":
        return SparseMleF(num_vars, dict(pairs), cfg)

    @staticmethod
    def from_matrix(matrix, cfg: FieldConfig) -> "SparseMleF":
        """Column-major matrix flattening (same layout as DenseMleF.from_matrix,
        reference src/poly_f/mle/sparse.rs:100-119)."""
        s = max(matrix.n_rows - 1, 1).bit_length() if matrix.n_rows > 1 else 0
        sp = max(matrix.n_cols - 1, 1).bit_length() if matrix.n_cols > 1 else 0
        padded_rows = 1 << s
        entries = {}
        for row_i, row in enumerate(matrix.rows):
            for val, col_i in row:
                entries[padded_rows * col_i + row_i] = val
        return SparseMleF(s + sp, entries, cfg)

    def fix_variables(self, point: list[Fp]) -> "SparseMleF":
        """Fix the first len(point) variables (pairing indices 2b/2b+1)."""
        assert len(point) <= self.num_vars
        entries = self.entries
        nv = self.num_vars
        one = self.cfg.one()
        for r in point:
            nxt: dict[int, Fp] = {}
            for idx, val in entries.items():
                w = r if idx & 1 else one - r
                tgt = idx >> 1
                cur = nxt.get(tgt)
                contrib = val * w
                nxt[tgt] = contrib if cur is None else cur + contrib
            entries = nxt
            nv -= 1
        return SparseMleF(nv, entries, self.cfg)

    def evaluate(self, point: list[Fp]) -> Fp:
        if len(point) != self.num_vars:
            raise ValueError("point/vars mismatch")
        fixed = self.fix_variables(point)
        return fixed.entries.get(0, self.cfg.zero())

    def to_dense(self) -> DenseMleF:
        evals = [self.cfg.zero()] * (1 << self.num_vars)
        for idx, val in self.entries.items():
            evals[idx] = val
        return DenseMleF(self.num_vars, evals, self.cfg)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SparseMleF)
            and self.num_vars == other.num_vars
            and self.entries == other.entries
        )


class SparseMleZ:
    """Sparse MLE over ℤ (integer twin, src/poly_z/mle/sparse.rs)."""

    __slots__ = ("num_vars", "entries")

    def __init__(self, num_vars: int, entries: dict[int, int]):
        for idx in entries:
            if idx >= 1 << num_vars:
                raise ValueError(f"index {idx} out of range for {num_vars} vars")
        self.num_vars = num_vars
        self.entries = {i: v for i, v in entries.items() if v != 0}

    def map_to_field(self, cfg: FieldConfig) -> SparseMleF:
        return SparseMleF(self.num_vars, {i: cfg.fp(v) for i, v in self.entries.items()}, cfg)

    def fix_variables(self, point: list[int]) -> "SparseMleZ":
        entries = self.entries
        nv = self.num_vars
        for r in point:
            nxt: dict[int, int] = {}
            for idx, val in entries.items():
                w = r if idx & 1 else 1 - r
                tgt = idx >> 1
                nxt[tgt] = nxt.get(tgt, 0) + val * w
            entries = nxt
            nv -= 1
        return SparseMleZ(nv, entries)

    def evaluate(self, point: list[int]) -> int:
        if len(point) != self.num_vars:
            raise ValueError("point/vars mismatch")
        return self.fix_variables(point).entries.get(0, 0)

    def to_dense(self) -> DenseMleZ:
        evals = [0] * (1 << self.num_vars)
        for idx, val in self.entries.items():
            evals[idx] = val
        return DenseMleZ(self.num_vars, evals)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SparseMleZ)
            and self.num_vars == other.num_vars
            and self.entries == other.entries
        )
