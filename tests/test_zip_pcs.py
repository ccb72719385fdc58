"""Zip PCS tests — mirrors /root/reference/src/zip/tests.rs and the
commit/open adversarial tests: roundtrip, batch, tamper rejection, RAA code
linearity, seeded-shuffle determinism, Merkle proofs."""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import DenseMleZ
from zinc_tpu.rng import ChaCha12, permutation_from_seed
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zip.code import DefaultLinearCodeSpec, RaaCode, ZipLinearCode, ZipTypes
from zinc_tpu.zip.merkle import MerkleTree, int_to_leaf_bytes, verify_merkle_path
from zinc_tpu.zip.pcs import (
    PcsError,
    ZipCommitment,
    commit,
    open_poly,
    setup,
    verify_poly,
)
from zinc_tpu.zip.transcript import PcsTranscript

Q256 = 57316695564490278656402085503  # prime used in the reference PCS tests
CFG = FieldConfig(Q256, 4)
ZT1 = ZipTypes(1)


class MockTranscript:
    """Deterministic counter transcript (pcs/tests.rs:26-56)."""

    def __init__(self):
        self.counter = 0

    def get_u64(self):
        self.counter += 1
        return self.counter

    def get_encoding_element(self):
        self.counter += 1
        return self.counter & 1

    def sample_unique_columns(self, start, end, columns, count):
        self.counter += 1
        added = 0
        for i in range(start, end):
            if i not in columns:
                columns.add(i)
                added += 1
                if added == count:
                    break
        return added


def make_pcs(num_vars, seed_transcript=None):
    poly_size = 1 << num_vars
    t = seed_transcript or MockTranscript()
    code = RaaCode(DefaultLinearCodeSpec(), poly_size, t, ZT1)
    pp = setup(poly_size, code, ZT1)
    evaluations = list(range(1, poly_size + 1))
    poly = DenseMleZ(num_vars, evaluations)
    return pp, poly


def rand_point(num_vars, rng):
    return [CFG.fp(rng.randrange(CFG.q)) for _ in range(num_vars)]


def test_pcs_roundtrip():
    num_vars = 4
    pp, poly = make_pcs(num_vars)
    rng = random.Random(1)
    data, comm = commit(pp, poly)
    point = rand_point(num_vars, rng)
    v = poly.map_to_field(CFG).evaluate(point)

    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    proof = pt.into_proof()

    vt = PcsTranscript.from_proof(proof)
    verify_poly(pp, comm, point, v, vt, CFG)


def test_pcs_rejects_wrong_eval():
    num_vars = 4
    pp, poly = make_pcs(num_vars)
    rng = random.Random(2)
    data, comm = commit(pp, poly)
    point = rand_point(num_vars, rng)
    v = poly.map_to_field(CFG).evaluate(point)

    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    vt = PcsTranscript.from_proof(pt.into_proof())
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v + CFG.one(), vt, CFG)


def test_pcs_rejects_tampered_proof():
    num_vars = 4
    pp, poly = make_pcs(num_vars)
    rng = random.Random(3)
    data, comm = commit(pp, poly)
    point = rand_point(num_vars, rng)
    v = poly.map_to_field(CFG).evaluate(point)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    proof = bytearray(pt.into_proof())
    proof[5] ^= 0xFF  # corrupt the proximity combined row
    vt = PcsTranscript.from_proof(bytes(proof))
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, vt, CFG)


def test_pcs_rejects_wrong_root():
    num_vars = 4
    pp, poly = make_pcs(num_vars)
    rng = random.Random(4)
    data, comm = commit(pp, poly)
    point = rand_point(num_vars, rng)
    v = poly.map_to_field(CFG).evaluate(point)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    comm.roots[0] = b"\x00" * 32
    vt = PcsTranscript.from_proof(pt.into_proof())
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, vt, CFG)


def test_pcs_batch():
    num_vars = 4
    pp, _ = make_pcs(num_vars)
    rng = random.Random(5)
    polys = [
        DenseMleZ(num_vars, [rng.randrange(-100, 100) for _ in range(1 << num_vars)])
        for _ in range(3)
    ]
    results = [commit(pp, p) for p in polys]
    points = [rand_point(num_vars, rng) for _ in polys]
    evals = [p.map_to_field(CFG).evaluate(pt) for p, pt in zip(polys, points)]

    pt = PcsTranscript()
    for p, (data, _), point in zip(polys, results, points):
        open_poly(pp, p, data, point, CFG, pt)
    vt = PcsTranscript.from_proof(pt.into_proof())
    for (_, comm), point, v in zip(results, points, evals):
        verify_poly(pp, comm, point, v, vt, CFG)


def test_raa_linearity():
    t = MockTranscript()
    code = RaaCode(DefaultLinearCodeSpec(), 16, t, ZT1)
    rng = random.Random(7)
    a = [rng.randrange(-50, 50) for _ in range(code.row_len)]
    b = [rng.randrange(-50, 50) for _ in range(code.row_len)]
    ea, eb = code.encode(a), code.encode(b)
    esum = code.encode([x + y for x, y in zip(a, b)])
    assert esum == [x + y for x, y in zip(ea, eb)]
    assert code.encode([0] * code.row_len) == [0] * code.codeword_len()


def test_zip_linear_code():
    t = KeccakTranscript()
    t.absorb(b"ziplincode")
    code = ZipLinearCode(DefaultLinearCodeSpec(), 16, t, ZT1)
    rng = random.Random(8)
    a = [rng.randrange(-50, 50) for _ in range(code.row_len)]
    b = [rng.randrange(-50, 50) for _ in range(code.row_len)]
    ea, eb = code.encode(a), code.encode(b)
    esum = code.encode([x + y for x, y in zip(a, b)])
    assert esum == [x + y for x, y in zip(ea, eb)]
    assert len(ea) == code.codeword_len()


def test_shuffle_determinism():
    p1 = permutation_from_seed(12345, 64)
    p2 = permutation_from_seed(12345, 64)
    p3 = permutation_from_seed(54321, 64)
    assert (p1 == p2).all()
    assert not (p1 == p3).all()
    assert sorted(p1.tolist()) == list(range(64))


def test_shuffle_rand09_pinned_vectors():
    """Pinned rand-0.9.2 ``StdRng`` shuffle schedule (docs/RAND_PARITY.md):
    partial_shuffle forward walk + IncreasingUniform chunks + Canon's-method
    bounded sampling.  Any change to the draw schedule breaks wire parity
    with the reference and must fail here."""
    assert permutation_from_seed(12345, 16).tolist() == [
        4, 9, 7, 13, 3, 11, 5, 14, 1, 12, 6, 0, 10, 2, 15, 8]
    assert permutation_from_seed(0, 16).tolist() == [
        11, 6, 14, 10, 13, 8, 1, 9, 5, 7, 0, 12, 2, 15, 4, 3]
    assert permutation_from_seed((1 << 64) - 1, 16).tolist() == [
        0, 1, 9, 13, 7, 2, 4, 6, 14, 12, 8, 11, 10, 5, 3, 15]
    assert permutation_from_seed(7, 8).tolist() == [0, 4, 7, 6, 5, 3, 1, 2]
    # Canon's-method bounded draws straight off the ChaCha12 stream
    r = ChaCha12.from_seed_u64(9)
    assert [r.next_below(10) for _ in range(12)] == [0, 6, 8, 5, 3, 6, 1, 6, 7, 8, 9, 9]


def test_chacha12_structure():
    # keystream must be deterministic per seed and differ across seeds
    a = ChaCha12.from_seed_u64(1)
    b = ChaCha12.from_seed_u64(1)
    c = ChaCha12.from_seed_u64(2)
    sa = [a.next_u32() for _ in range(20)]
    sb = [b.next_u32() for _ in range(20)]
    sc = [c.next_u32() for _ in range(20)]
    assert sa == sb
    assert sa != sc
    # bounded sampling is in range and deterministic
    d = ChaCha12.from_seed_u64(9)
    vals = [d.next_below(10) for _ in range(100)]
    assert all(0 <= v < 10 for v in vals)


def test_merkle_tree_roundtrip():
    rng = random.Random(11)
    leaves_data = [rng.randrange(-(1 << 190), 1 << 190) for _ in range(64)]
    leaf_bytes = [int_to_leaf_bytes(v, 3) for v in leaves_data]
    tree = MerkleTree.from_leaves(6, leaf_bytes)
    for i, lb in enumerate(leaf_bytes):
        path = tree.path(i)
        assert len(path) == 6
        assert verify_merkle_path(tree.root, lb, i, path)
        # wrong index fails
        assert not verify_merkle_path(tree.root, lb, i ^ 1, path)


def test_leaf_serialization_word_order():
    # LE word order, BE bytes within each word (field/int.rs:201-210)
    v = 0x0102030405060708 | (0x1112131415161718 << 64)
    b = int_to_leaf_bytes(v, 2)
    assert b.hex() == "01020304050607081112131415161718"
    # negative: two's complement
    assert int_to_leaf_bytes(-1, 1).hex() == "ffffffffffffffff"


def test_proof_size_formula():
    """Proof size matches the analytic formula (commit.rs:711-775):
    (1+num_ldt)·row_len·|M| + n_open·(num_rows·|K| + num_rows·(8+depth·32))
    + row_len·|F|."""
    num_vars = 6
    pp, poly = make_pcs(num_vars)
    rng = random.Random(13)
    data, comm = commit(pp, poly)
    point = rand_point(num_vars, rng)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    proof = pt.into_proof()
    row_len = pp.code.row_len
    depth = (pp.code.codeword_len() - 1).bit_length()
    n_open = pp.code.num_column_opening()
    expected = (
        pp.code.num_proximity_testing() * row_len * 8 * ZT1.m_words
        + n_open * (pp.num_rows * 8 * ZT1.k_words + pp.num_rows * (8 + depth * 32))
        + row_len * CFG.nbytes
    )
    assert len(proof) == expected


def test_commit_no_merkle_matches_commit_rows():
    """commit_no_merkle = commit minus trees (commit.rs:104-119)."""
    from zinc_tpu.poly.mle import DenseMleZ
    from zinc_tpu.zip.pcs import commit, commit_no_merkle, setup

    t = KeccakTranscript()
    t.absorb(b"cnm")
    n = 64
    code = RaaCode(DefaultLinearCodeSpec(), n, t, ZT1)
    pp = setup(n, code, ZT1)
    rng = random.Random(5)
    poly = DenseMleZ(6, [rng.randrange(-(1 << 40), 1 << 40) for _ in range(n)])
    data_full, comm_full = commit(pp, poly)
    data_nm, comm_nm = commit_no_merkle(pp, poly)
    assert data_nm.rows == data_full.rows
    assert data_nm.trees == [] and comm_nm.roots == []
    assert comm_full.roots  # the full commit still produces roots


def make_zip_lincode_pcs(num_vars, rng):
    """PCS instance over the original ZipLinearCode (code.rs:77-215)."""
    poly_size = 1 << num_vars
    t = KeccakTranscript()
    t.absorb(b"zlc-pcs")
    code = ZipLinearCode(DefaultLinearCodeSpec(), poly_size, t, ZT1)
    pp = setup(poly_size, code, ZT1)
    evaluations = [rng.randrange(-(1 << 30), 1 << 30) for _ in range(poly_size)]
    return pp, DenseMleZ(num_vars, evaluations)


def test_zip_lincode_pcs_roundtrip():
    rng = random.Random(21)
    pp, poly = make_zip_lincode_pcs(4, rng)
    data, comm = commit(pp, poly)
    point = rand_point(4, rng)
    v = poly.map_to_field(CFG).evaluate(point)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    vt = PcsTranscript.from_proof(pt.into_proof())
    verify_poly(pp, comm, point, v, vt, CFG)


def test_zip_lincode_pcs_rejects_wrong_eval_and_tamper():
    rng = random.Random(22)
    pp, poly = make_zip_lincode_pcs(4, rng)
    data, comm = commit(pp, poly)
    point = rand_point(4, rng)
    v = poly.map_to_field(CFG).evaluate(point)
    pt = PcsTranscript()
    open_poly(pp, poly, data, point, CFG, pt)
    proof = pt.into_proof()
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v + CFG.one(), PcsTranscript.from_proof(proof), CFG)
    bad = bytearray(proof)
    bad[5] ^= 0xFF
    with pytest.raises(PcsError):
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(bytes(bad)), CFG)
    bad_root = ZipCommitment([b"\x00" * 32] * len(comm.roots))
    with pytest.raises(PcsError):
        verify_poly(pp, bad_root, point, v, PcsTranscript.from_proof(proof), CFG)
