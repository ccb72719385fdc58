"""Spartan prover/verifier tests — mirrors /root/reference/src/zinc/tests.rs
(roundtrip on the Vitalik R1CS, roundtrip on a dummy CCS, corrupted-witness
rejection) plus CCS relation checks."""

import random

import pytest

from zinc_tpu.ccs import CSError, dummy_ccs_of_size, vitalik_fixture
from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import DenseMleZ
from zinc_tpu.spartan import SpartanError, spartan_prove, spartan_verify
from zinc_tpu.transcript import KeccakTranscript

Q128 = 312829638388039969874974628075306023441
CFG = FieldConfig(Q128, 3)


def prepare(ccs, statement, witness, cfg):
    """prepare_for_random_field_piop (prover.rs:172-239)."""
    z_ccs = statement.get_z_vector(witness.w_ccs)
    if len(z_ccs) <= ccs.m:
        z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))
    z_mle = DenseMleZ(ccs.s_prime, z_ccs)
    z_ccs_f = [cfg.fp(v) for v in z_ccs]
    ccs_f = ccs.map_to_field(cfg)
    statement_f = statement.map_to_field(cfg)
    return z_ccs_f, z_mle, ccs_f, statement_f


def test_ccs_relation_vitalik():
    ccs, statement, witness = vitalik_fixture(3)
    z = statement.get_z_vector(witness.w_ccs)
    z = z + [0] * (ccs.n - len(z))
    ccs.check_relation(statement.constraints, z)


def test_ccs_relation_violation():
    ccs, statement, witness = vitalik_fixture(3)
    witness.w_ccs[0] += 1
    z = statement.get_z_vector(witness.w_ccs)
    z = z + [0] * (ccs.n - len(z))
    with pytest.raises(CSError):
        ccs.check_relation(statement.constraints, z)


def test_ccs_relation_field_flavor():
    ccs, statement, witness = vitalik_fixture(3)
    z_ccs, z_mle, ccs_f, statement_f = prepare(ccs, statement, witness, CFG)
    ccs_f.check_relation(statement_f.constraints, z_ccs)


def test_spartan_roundtrip_vitalik():
    ccs, statement, witness = vitalik_fixture(3)
    z_ccs, z_mle, ccs_f, statement_f = prepare(ccs, statement, witness, CFG)

    pt = KeccakTranscript()
    proof, r_y = spartan_prove(statement_f, z_ccs, z_mle, ccs_f, pt, CFG)

    vt = KeccakTranscript()
    points = spartan_verify(proof, ccs_f, vt, CFG)
    assert points.rx_ry[ccs.s :] == r_y
    # e_y must equal (Σ γ^j rₓᵀMⱼ)(r_y) · z̃(r_y); checked via PCS later, here
    # recompute directly
    from zinc_tpu.sparse import evaluate_mle
    from zinc_tpu.spartan import lin_comb_gamma

    r_x = points.rx_ry[: ccs.s]
    v_xy = [
        evaluate_mle(m, r_x, r_y, CFG) for m in statement_f.constraints
    ]
    z_f = z_mle.map_to_field(CFG)
    v = z_f.evaluate(r_y)
    assert lin_comb_gamma(points.gamma, v_xy) * v == points.e_y


def test_spartan_roundtrip_dummy_ccs():
    rng = random.Random(42)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 8, rng)
    z_ccs, z_mle, ccs_f, statement_f = prepare(ccs, statement, wit, CFG)
    pt = KeccakTranscript()
    proof, r_y = spartan_prove(statement_f, z_ccs, z_mle, ccs_f, pt, CFG)
    vt = KeccakTranscript()
    points = spartan_verify(proof, ccs_f, vt, CFG)
    assert len(points.rx_ry) == ccs.s + ccs.s_prime


def test_spartan_rejects_corrupted_witness():
    rng = random.Random(43)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 6, rng)
    wit.w_ccs[3] = wit.w_ccs[3] + 1  # break the squaring relation
    z_ccs, z_mle, ccs_f, statement_f = prepare(ccs, statement, wit, CFG)
    pt = KeccakTranscript()
    proof, _ = spartan_prove(statement_f, z_ccs, z_mle, ccs_f, pt, CFG)
    vt = KeccakTranscript()
    with pytest.raises(SpartanError):
        spartan_verify(proof, ccs_f, vt, CFG)


def test_spartan_rejects_tampered_v_s():
    ccs, statement, witness = vitalik_fixture(3)
    z_ccs, z_mle, ccs_f, statement_f = prepare(ccs, statement, witness, CFG)
    pt = KeccakTranscript()
    proof, _ = spartan_prove(statement_f, z_ccs, z_mle, ccs_f, pt, CFG)
    proof.V_s[0] = proof.V_s[0] + CFG.one()
    vt = KeccakTranscript()
    with pytest.raises(SpartanError):
        spartan_verify(proof, ccs_f, vt, CFG)


def test_sparse_mle_evaluation_matches_dense():
    """evaluate_mle (sparse) vs the reference's dense column-major layout."""
    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sparse import evaluate_mle

    ccs, statement, witness = vitalik_fixture(3)
    statement_f = statement.map_to_field(CFG)
    rng = random.Random(44)
    m = statement_f.constraints[0]
    r_row = [CFG.fp(rng.randrange(CFG.q)) for _ in range(3)]
    r_col = [CFG.fp(rng.randrange(CFG.q)) for _ in range(3)]
    dense = DenseMleF.from_matrix(m, CFG)
    assert dense.num_vars == 6
    assert dense.evaluate(r_row + r_col) == evaluate_mle(m, r_row, r_col, CFG)
