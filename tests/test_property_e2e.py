"""Randomized end-to-end property test: random shapes, sizes, and IO splits.

Every sampled instance must prove and verify; a random witness corruption
must be rejected.  (The reference's integration suite uses fixed fixtures;
this adds cheap shape fuzzing on top.)
"""

import random

import pytest

from zinc_tpu.ccs import dummy_ccs_from_z
from zinc_tpu.prime import draw_random_field
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincError, ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

ZT = ZipTypes(1)


@pytest.mark.parametrize("seed", range(4))
def test_random_instance_roundtrip(seed):
    rng = random.Random(1000 + seed)
    log_n = rng.choice([3, 4, 5, 6])
    pub_io = rng.choice([1, 2, 3])
    bits = rng.choice([8, 31, 62])
    z = [rng.randrange(-(1 << bits), 1 << bits) for _ in range(1 << log_n)]
    z[pub_io] = 1  # the fixed one-entry after the public IO
    ccs, statement, wit = dummy_ccs_from_z(z, pub_io_len=pub_io)

    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, 4)
    proof = ZincProver(ZT).prove(statement, wit, t, ccs, cfg)
    ZincVerifier(ZT).verify(statement, proof, KeccakTranscript(), ccs, cfg)

    # corrupt one random witness value and re-prove: the verifier must reject
    if len(wit.w_ccs) > 0:
        bad = list(wit.w_ccs)
        bad[rng.randrange(len(bad))] += 1
        from zinc_tpu.ccs import Witness

        t2 = KeccakTranscript()
        cfg2 = draw_random_field(statement.public_input, t2, ZT.n_words, 4)
        bad_proof = ZincProver(ZT).prove(statement, Witness(w_ccs=bad), t2, ccs, cfg2)
        with pytest.raises(ZincError):
            ZincVerifier(ZT).verify(statement, bad_proof, KeccakTranscript(), ccs, cfg2)
