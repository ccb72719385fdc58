"""ZincProof wire-format roundtrip + the verifier accepts a deserialized proof."""

import pytest

from zinc_tpu.ccs import vitalik_fixture
from zinc_tpu.ccs.utils import hadamard, vec_add, vec_scalar_mul
from zinc_tpu.prime import draw_random_field
from zinc_tpu.serialize import deserialize_proof, serialize_proof
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

ZT = ZipTypes(1)


def test_proof_roundtrip_and_verify():
    ccs, statement, wit = vitalik_fixture(3)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, 4)
    proof = ZincProver(ZT).prove(statement, wit, t, ccs, cfg)

    blob = serialize_proof(proof, cfg)
    restored = deserialize_proof(blob, cfg)
    assert restored.spartan_proof.linearization_sumcheck == proof.spartan_proof.linearization_sumcheck
    assert restored.spartan_proof.second_sumcheck == proof.spartan_proof.second_sumcheck
    assert restored.spartan_proof.V_s == proof.spartan_proof.V_s
    assert restored.zip_proof.z_comm.roots == proof.zip_proof.z_comm.roots
    assert restored.zip_proof.v == proof.zip_proof.v
    assert restored.zip_proof.pcs_proof == proof.zip_proof.pcs_proof

    ZincVerifier(ZT).verify(statement, restored, KeccakTranscript(), ccs, cfg)

    # corrupting the stream is detected structurally or by the verifier
    with pytest.raises(Exception):
        bad = b"NOTMAGIC" + blob[8:]
        deserialize_proof(bad, cfg)


def test_vec_utils():
    assert vec_add([1, 2], [3, 4]) == [4, 6]
    assert vec_scalar_mul([1, 2, 3], 5) == [5, 10, 15]
    assert hadamard([2, 3], [4, 5]) == [8, 15]
    with pytest.raises(ValueError):
        vec_add([1], [1, 2])
