"""Multilinear Zip PCS: commit / open / verify (host backend).

Pipeline mirrors /root/reference/src/zip/pcs/:

* ``commit`` (commit.rs:50-87): reshape the 2^n integer evaluations into a
  num_rows × row_len matrix, RAA-encode each row N→K, build one BLAKE3
  Merkle tree per row; the commitment is the list of roots.
* ``open`` (open_z.rs:22-143): (1) testing phase — per proximity test,
  squeeze integer coefficients from the (fresh) PCS transcript and send the
  coefficient-combined row in width M; then for each of the 1000 column
  openings squeeze a column index and send the column values + one Merkle
  path per row; (2) evaluation phase — send q₀ᵀ·U over the field.
* ``verify`` (verify_z.rs): re-encode the claimed combined rows, spot-check
  every opened column against the Merkle roots and the linear combinations,
  then check ⟨q₀-row, q₁⟩ = v and per-column proximity of the field-encoded
  row.

The evaluation point splits as (hi ‖ lo) with the LAST log₂(num_rows)
coordinates selecting the row (pcs/utils.rs:253-292).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.config import FieldConfig, Fp
from ..poly.mle import DenseMleZ, build_eq_x_r_vec
from .merkle import MerkleTree, int_to_leaf_bytes, verify_merkle_path
from .transcript import PcsTranscript


class PcsError(Exception):
    pass


@dataclass
class ZipParams:
    num_vars: int
    num_rows: int
    code: object  # RaaCode | ZipLinearCode
    zt: object  # ZipTypes


@dataclass
class ZipCommitmentData:
    """Prover-side data: encoded rows (flat, row-major) + per-row trees."""

    rows: list  # list[int], num_rows * codeword_len entries (width K)
    trees: list  # list[MerkleTree]

    def roots(self) -> list[bytes]:
        return [t.root for t in self.trees]


@dataclass
class ZipCommitment:
    roots: list  # list[bytes]


def setup(poly_size: int, code, zt) -> ZipParams:
    assert poly_size & (poly_size - 1) == 0
    num_vars = poly_size.bit_length() - 1
    num_rows = (1 << num_vars) // code.row_len
    num_rows = 1 if num_rows <= 1 else 1 << (num_rows - 1).bit_length()
    return ZipParams(num_vars=num_vars, num_rows=num_rows, code=code, zt=zt)


def _validate(tag: str, pp: ZipParams, poly: DenseMleZ | None, points: list) -> None:
    if poly is not None and pp.num_vars < poly.num_vars:
        raise PcsError(f"too many variates to {tag} ({pp.num_vars} < {poly.num_vars})")
    nv = poly.num_vars if poly is not None else (len(points[0]) if points else 0)
    for p in points:
        if len(p) != nv:
            raise PcsError(f"invalid point length {len(p)} != {nv}")


def commit(pp: ZipParams, poly: DenseMleZ) -> tuple[ZipCommitmentData, ZipCommitment]:
    _validate("commit", pp, poly, [])
    row_len = pp.code.row_len
    codeword_len = pp.code.codeword_len()
    expected = pp.num_rows * row_len
    assert len(poly.evaluations) == expected, (
        f"polynomial has {len(poly.evaluations)} evaluations, expected {expected}"
    )
    depth = max((codeword_len - 1).bit_length(), 0)

    rows: list[int] = []
    trees: list[MerkleTree] = []
    kw = pp.zt.k_words
    for r in range(pp.num_rows):
        codeword = pp.code.encode(poly.evaluations[r * row_len : (r + 1) * row_len])
        rows.extend(codeword)
        leaves = [int_to_leaf_bytes(v, kw) for v in codeword]
        trees.append(MerkleTree.from_leaves(depth, leaves))

    return ZipCommitmentData(rows, trees), ZipCommitment([t.root for t in trees])


def batch_commit(pp: ZipParams, polys: list[DenseMleZ]):
    return [commit(pp, p) for p in polys]


def _left_tensor(num_rows: int, point: list[Fp], cfg: FieldConfig) -> list[Fp]:
    log_rows = num_rows.bit_length() - 1
    lo = point[len(point) - log_rows :]
    return build_eq_x_r_vec(lo) if lo else [cfg.one()]


def _point_to_tensor(num_rows: int, point: list[Fp], cfg: FieldConfig):
    log_rows = num_rows.bit_length() - 1
    hi = point[: len(point) - log_rows]
    lo = point[len(point) - log_rows :]
    q_0 = build_eq_x_r_vec(lo) if lo else []
    q_1 = build_eq_x_r_vec(hi) if hi else []
    return q_0, q_1


def open_poly(
    pp: ZipParams,
    poly: DenseMleZ,
    data: ZipCommitmentData,
    point: list[Fp],
    cfg: FieldConfig,
    transcript: PcsTranscript,
) -> None:
    _validate("open", pp, poly, [point])
    row_len = pp.code.row_len
    codeword_len = pp.code.codeword_len()

    # ---- testing phase ----------------------------------------------------
    if pp.num_rows > 1:
        for _ in range(pp.code.num_proximity_testing()):
            coeffs = transcript.fs.get_integer_challenges(pp.num_rows, pp.zt.n_words)
            combined = [
                sum(
                    coeffs[r] * poly.evaluations[r * row_len + c]
                    for r in range(pp.num_rows)
                )
                for c in range(row_len)
            ]
            transcript.write_integers(combined, pp.zt.m_words)

    for _ in range(pp.code.num_column_opening()):
        column = transcript.squeeze_challenge_idx(cfg, codeword_len)
        column_values = [
            data.rows[r * codeword_len + column] for r in range(pp.num_rows)
        ]
        transcript.write_integers(column_values, pp.zt.k_words)
        for tree in data.trees:
            transcript.write_merkle_path(tree.path(column))

    # ---- evaluation phase -------------------------------------------------
    q_0 = _left_tensor(pp.num_rows, point, cfg)
    evaluations_f = [cfg.fp(v) for v in poly.evaluations]
    if pp.num_rows > 1:
        combined_row = []
        for c in range(row_len):
            acc = cfg.zero()
            for r in range(pp.num_rows):
                acc = acc + q_0[r] * evaluations_f[r * row_len + c]
            combined_row.append(acc)
    else:
        combined_row = evaluations_f
    transcript.write_field_elements(combined_row)


def batch_open(pp, polys, datas, points, cfg, transcript):
    for poly, data, point in zip(polys, datas, points):
        open_poly(pp, poly, data, point, cfg, transcript)


def verify_poly(
    pp: ZipParams,
    comm: ZipCommitment,
    point: list[Fp],
    eval_claim: Fp,
    transcript: PcsTranscript,
    cfg: FieldConfig,
) -> None:
    _validate("verify", pp, None, [point])
    row_len = pp.code.row_len
    codeword_len = pp.code.codeword_len()
    kw = pp.zt.k_words

    # ---- testing phase ----------------------------------------------------
    prox: list[tuple[list[int], list[int]]] = []
    if pp.num_rows > 1:
        for _ in range(pp.code.num_proximity_testing()):
            coeffs = transcript.fs.get_integer_challenges(pp.num_rows, pp.zt.n_words)
            combined_row = transcript.read_integers(row_len, pp.zt.m_words)
            encoded_combined_row = pp.code.encode(combined_row)
            prox.append((coeffs, encoded_combined_row))

    columns_opened: list[tuple[int, list[int]]] = []
    # collect (leaf bytes, sibling path, index) per opened (column, row) so
    # the BLAKE3 path folds run as ONE native batch call (1000·num_rows paths)
    pending_leaves: list[bytes] = []
    pending_paths: list[bytes] = []
    pending_indices: list[int] = []
    pending_roots: list[bytes] = []
    depth = None
    for _ in range(pp.code.num_column_opening()):
        column = transcript.squeeze_challenge_idx(cfg, codeword_len)
        column_values = transcript.read_integers(pp.num_rows, kw)
        for coeffs, encoded in prox:
            if pp.num_rows > 1:
                comb = sum(c * v for c, v in zip(coeffs, column_values))
            else:
                comb = column_values[0]
            if comb != encoded[column]:
                raise PcsError("proximity failure (integer phase)")
        for r, root in enumerate(comm.roots):
            path = transcript.read_merkle_path()
            if depth is None:
                depth = len(path)
            elif depth != len(path):
                raise PcsError("inconsistent Merkle path depth")
            pending_leaves.append(int_to_leaf_bytes(column_values[r], kw))
            pending_paths.append(b"".join(path))
            pending_indices.append(column)
            pending_roots.append(root)
        columns_opened.append((column, column_values))

    if pending_leaves:
        from ..hashing.blake3 import blake3
        from ..native import blake3_batch, merkle_fold_batch

        leaf_len = len(pending_leaves[0])
        leaves_hashed = blake3_batch(
            b"".join(pending_leaves), len(pending_leaves), leaf_len
        )
        if leaves_hashed is None:
            leaves_hashed = b"".join(blake3(lb) for lb in pending_leaves)
        folded = merkle_fold_batch(
            leaves_hashed, b"".join(pending_paths), pending_indices, depth or 0
        )
        if folded is not None:
            if any(
                folded[32 * i : 32 * i + 32] != pending_roots[i]
                for i in range(len(pending_roots))
            ):
                raise PcsError("Merkle path verification failed")
        else:  # pure-Python fallback
            for lb, pb, idx, root in zip(
                pending_leaves, pending_paths, pending_indices, pending_roots
            ):
                path = [pb[32 * d : 32 * d + 32] for d in range(depth or 0)]
                if not verify_merkle_path(root, lb, idx, path):
                    raise PcsError("Merkle path verification failed")

    # ---- evaluation phase -------------------------------------------------
    q_0_combined_row = transcript.read_field_elements(row_len, cfg)
    encoded_combined_row_f = pp.code.encode_f(q_0_combined_row, cfg)
    q_0, q_1 = _point_to_tensor(pp.num_rows, point, cfg)

    acc = cfg.zero()
    for a, b in zip(q_0_combined_row, q_1):
        acc = acc + a * b
    if not acc == eval_claim:
        raise PcsError("evaluation consistency failure")

    for column, column_values in columns_opened:
        if pp.num_rows > 1:
            comb = cfg.zero()
            for qv, cv in zip(q_0, column_values):
                comb = comb + qv * cfg.fp(cv)
        else:
            comb = cfg.fp(column_values[0])
        if not comb == encoded_combined_row_f[column]:
            raise PcsError("proximity failure (field phase)")


def batch_verify(pp, comms, points, evals, transcript, cfg):
    for comm, point, ev in zip(comms, points, evals):
        verify_poly(pp, comm, point, ev, transcript, cfg)
