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
