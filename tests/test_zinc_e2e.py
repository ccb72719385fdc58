"""Full Zinc protocol end-to-end tests (mirror of zinc/tests.rs +
examples/simple_r1cs.rs): prove+verify on the Vitalik R1CS and a dummy CCS,
rejection of corrupted witnesses / wrong configs / tampered proofs."""

import random

import pytest

from zinc_tpu.ccs import dummy_ccs_of_size, vitalik_fixture
from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.prime import draw_random_field
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincError, ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

ZT = ZipTypes(1)
FIELD_LIMBS = 4


def prove_vitalik(input_value=3):
    prover = ZincProver(ZT)
    ccs, statement, witness = vitalik_fixture(input_value)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, FIELD_LIMBS)
    proof = prover.prove(statement, witness, t, ccs, cfg)
    return ccs, statement, proof, cfg


def test_zinc_e2e_accept():
    ccs, statement, proof, cfg = prove_vitalik(3)
    verifier = ZincVerifier(ZT)
    vt = KeccakTranscript()
    verifier.verify(statement, proof, vt, ccs, cfg)


def test_zinc_e2e_other_input():
    ccs, statement, proof, cfg = prove_vitalik(7)
    verifier = ZincVerifier(ZT)
    verifier.verify(statement, proof, KeccakTranscript(), ccs, cfg)


def test_zinc_rejects_wrong_field_config():
    ccs, statement, proof, cfg = prove_vitalik(3)
    wrong_cfg = FieldConfig(312829638388039969874974628075306023441, 4)
    verifier = ZincVerifier(ZT)
    with pytest.raises(ZincError, match="field config mismatch"):
        verifier.verify(statement, proof, KeccakTranscript(), ccs, wrong_cfg)


def test_zinc_rejects_corrupted_witness():
    prover = ZincProver(ZT)
    ccs, statement, witness = vitalik_fixture(3)
    witness.w_ccs[1] += 1  # invalid witness
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, FIELD_LIMBS)
    proof = prover.prove(statement, witness, t, ccs, cfg)
    verifier = ZincVerifier(ZT)
    with pytest.raises(ZincError):
        verifier.verify(statement, proof, KeccakTranscript(), ccs, cfg)


def test_zinc_rejects_tampered_pcs_proof():
    ccs, statement, proof, cfg = prove_vitalik(3)
    tampered = bytearray(proof.zip_proof.pcs_proof)
    tampered[len(tampered) // 2] ^= 1
    proof.zip_proof.pcs_proof = bytes(tampered)
    verifier = ZincVerifier(ZT)
    with pytest.raises(ZincError):
        verifier.verify(statement, proof, KeccakTranscript(), ccs, cfg)


def test_zinc_rejects_tampered_v():
    ccs, statement, proof, cfg = prove_vitalik(3)
    proof.zip_proof.v = proof.zip_proof.v + cfg.one()
    verifier = ZincVerifier(ZT)
    with pytest.raises(ZincError):
        verifier.verify(statement, proof, KeccakTranscript(), ccs, cfg)


def test_zinc_e2e_dummy_ccs():
    rng = random.Random(99)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 4, rng, int_bits=40)
    prover = ZincProver(ZT)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, FIELD_LIMBS)
    proof = prover.prove(statement, wit, t, ccs, cfg)
    verifier = ZincVerifier(ZT)
    verifier.verify(statement, proof, KeccakTranscript(), ccs, cfg)


def test_example_runs():
    from zinc_tpu.examples.simple_r1cs import run_example

    run_example(3, verbose=False)


def test_mesh_example_runs():
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    from zinc_tpu.examples.mesh_prove import run_example

    run_example(log_n=6, verbose=False)
