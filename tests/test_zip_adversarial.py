"""Adversarial Zip PCS tests: codeword corruption around the proximity check.

Mirrors the reference's negative suites (/root/reference/src/zip/pcs/
open_z.rs:222-345 close-vs-far corruption, commit.rs:643-709 bad proximity
hints): a prover whose committed codeword matrix disagrees with the claimed
rows must be caught by the 1000-column spot check, and corrupting the
witness between commit and open must be caught by the proximity combination.
"""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import DenseMleZ
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zip.code import DefaultLinearCodeSpec, RaaCode, ZipTypes
from zinc_tpu.zip.pcs import PcsError, commit, open_poly, setup, verify_poly
from zinc_tpu.zip.transcript import PcsTranscript

ZT = ZipTypes(1)
CFG = FieldConfig((1 << 255) + 95, 4)
NV = 6


def _setup(seed: int):
    rng = random.Random(seed)
    evals = [rng.randrange(-(1 << 30), 1 << 30) for _ in range(1 << NV)]
    poly = DenseMleZ(NV, evals)
    t = KeccakTranscript()
    t.absorb(b"adversarial")
    code = RaaCode(DefaultLinearCodeSpec(), 1 << NV, t, ZT)
    pp = setup(1 << NV, code, ZT)
    point = [CFG.fp(rng.randrange(CFG.q)) for _ in range(NV)]
    return pp, poly, point


def _prove(pp, poly, point, corrupt_rows=None, corrupt_poly=None):
    data, comm = commit(pp, poly)
    if corrupt_rows is not None:
        corrupt_rows(data)
    open_poly_input = poly
    if corrupt_poly is not None:
        open_poly_input = corrupt_poly(poly)
    pt = PcsTranscript()
    open_poly(pp, open_poly_input, data, point, CFG, pt)
    v = poly.map_to_field(CFG).evaluate(point)
    return comm, v, pt.into_proof()


def test_far_codeword_corruption_rejected():
    """Corrupt EVERY codeword entry of one row: far from the code, so many
    of the 1000 opened columns disagree with the re-encoded combined row."""
    pp, poly, point = _setup(1)
    cw = pp.code.codeword_len()

    def corrupt(data):
        for c in range(cw):
            data.rows[c] += 1  # row 0, all columns

    comm, v, proof = _prove(pp, poly, point, corrupt_rows=corrupt)
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), CFG)


def test_single_column_corruption_rejected_or_caught_by_merkle():
    """A single corrupted codeword entry is inside the proximity radius, but
    the committed tree was built over the corrupted entry, so either the
    column spot-check or the final evaluation consistency must fail."""
    pp, poly, point = _setup(2)

    def corrupt(data):
        data.rows[3] += 12345

    comm, v, proof = _prove(pp, poly, point, corrupt_rows=corrupt)
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), CFG)


def test_witness_swap_between_commit_and_open_rejected():
    """Open a DIFFERENT polynomial against an honest commitment: the
    proximity combination rows disagree with the opened columns."""
    pp, poly, point = _setup(3)
    rng = random.Random(99)

    def other(_poly):
        evals = [rng.randrange(-(1 << 30), 1 << 30) for _ in range(1 << NV)]
        return DenseMleZ(NV, evals)

    comm, v, proof = _prove(pp, poly, point, corrupt_poly=other)
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), CFG)


def test_honest_prover_accepts():
    pp, poly, point = _setup(4)
    comm, v, proof = _prove(pp, poly, point)
    verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), CFG)


def test_close_codeword_still_opens():
    """Accept-side proximity boundary: a corruption WITHIN the proximity
    radius (one codeword entry bumped by 1, Merkle trees rebuilt over the
    corrupted rows) must still open successfully — the mirror of
    /root/reference/src/zip/pcs/open_z.rs:221-258
    (successful_opening_with_a_close_codeword)."""
    from zinc_tpu.zip.merkle import MerkleTree, int_to_leaf_bytes

    pp, poly, point = _setup(5)
    data, _comm = commit(pp, poly)
    cw = pp.code.codeword_len()
    depth = max((cw - 1).bit_length(), 0)
    data.rows[0] += 1
    data.trees = [
        MerkleTree.from_leaves(
            depth,
            [
                int_to_leaf_bytes(v, pp.zt.k_words)
                for v in data.rows[r * cw : (r + 1) * cw]
            ],
        )
        for r in range(pp.num_rows)
    ]
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)  # must not raise
    assert pt.into_proof()  # a non-empty opening was produced


def test_merkle_failures_are_typed():
    """Merkle-layer rejections surface as MerkleError (a PcsError subclass)
    — the typed twin of /root/reference/src/zip/pcs/error.rs:4-26."""
    from zinc_tpu.zip.pcs import MerkleError

    pp, poly, point = _setup(6)
    data, comm = commit(pp, poly)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    v = poly.map_to_field(CFG).evaluate(point)
    # corrupt one root: every path fold mismatches that row's root
    comm.roots[0] = bytes(32)
    with pytest.raises(MerkleError):
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(pt.into_proof()), CFG)
