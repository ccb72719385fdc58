"""Full device-backend Zinc prove must be bit-identical to host and verify."""

import random

from zinc_tpu.ccs import dummy_ccs_of_size
from zinc_tpu.prime import draw_random_field
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

ZT = ZipTypes(1)
FIELD_LIMBS = 4


def test_device_zinc_prove_identical_and_verifies():
    rng = random.Random(21)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 5, rng, int_bits=62)

    # host prove
    th = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, th, ZT.n_words, FIELD_LIMBS)
    proof_h = ZincProver(ZT, backend="host").prove(statement, wit, th, ccs, cfg)

    # device prove
    td = KeccakTranscript()
    cfg_d = draw_random_field(statement.public_input, td, ZT.n_words, FIELD_LIMBS)
    assert cfg_d == cfg
    proof_d = ZincProver(ZT, backend="device").prove(statement, wit, td, ccs, cfg_d)

    assert proof_d.spartan_proof.linearization_sumcheck == proof_h.spartan_proof.linearization_sumcheck
    assert proof_d.spartan_proof.second_sumcheck == proof_h.spartan_proof.second_sumcheck
    assert proof_d.spartan_proof.V_s == proof_h.spartan_proof.V_s
    assert proof_d.zip_proof.v == proof_h.zip_proof.v
    assert proof_d.zip_proof.z_comm.roots == proof_h.zip_proof.z_comm.roots
    assert proof_d.zip_proof.pcs_proof == proof_h.zip_proof.pcs_proof

    # and verifies end-to-end
    ZincVerifier(ZT).verify(statement, proof_d, KeccakTranscript(), ccs, cfg)


def test_device_backend_verifier_accepts_and_rejects():
    """ZincVerifier(backend="device") — integer matrices projected on device
    in the final γ-combination — must agree with the host verifier on both
    acceptance and rejection."""
    import pytest

    from zinc_tpu.zinc import ZincError

    rng = random.Random(22)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 5, rng, int_bits=62)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, FIELD_LIMBS)
    proof = ZincProver(ZT, backend="device").prove(statement, wit, t, ccs, cfg)
    ZincVerifier(ZT, backend="device").verify(statement, proof, KeccakTranscript(), ccs, cfg)
    # tamper: corrupt the claimed evaluation
    from zinc_tpu.zinc import ZincProof, ZipProof

    bad_zip = ZipProof(
        z_comm=proof.zip_proof.z_comm,
        v=proof.zip_proof.v + cfg.one(),
        pcs_proof=proof.zip_proof.pcs_proof,
    )
    bad = ZincProof(spartan_proof=proof.spartan_proof, zip_proof=bad_zip)
    with pytest.raises(ZincError):
        ZincVerifier(ZT, backend="device").verify(statement, bad, KeccakTranscript(), ccs, cfg)
