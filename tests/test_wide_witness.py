"""Width-ladder coverage: ZipTypes(2) with witness values beyond 64 bits.

The reference instantiates the N→2N→4N→8N ladder for several N via
implement_random_field_zip_types! (src/field/int.rs:276-289); the protocol
must work when witness integers exceed the int64 fast path.
"""

import random

from zinc_tpu.ccs import dummy_ccs_from_z
from zinc_tpu.prime import draw_random_field
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes


def test_wide_witness_roundtrip_host_and_device():
    zt = ZipTypes(2)  # 128-bit witness words
    rng = random.Random(123)
    z = [rng.randrange(-(1 << 100), 1 << 100) for _ in range(1 << 5)]
    z[1] = 1
    ccs, statement, wit = dummy_ccs_from_z(z, pub_io_len=1)

    th = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, th, zt.n_words, 4)
    proof_h = ZincProver(zt, backend="host").prove(statement, wit, th, ccs, cfg)
    ZincVerifier(zt).verify(statement, proof_h, KeccakTranscript(), ccs, cfg)

    td = KeccakTranscript()
    cfg_d = draw_random_field(statement.public_input, td, zt.n_words, 4)
    assert cfg_d == cfg
    proof_d = ZincProver(zt, backend="device").prove(statement, wit, td, ccs, cfg_d)
    assert proof_d.zip_proof.pcs_proof == proof_h.zip_proof.pcs_proof
    assert proof_d.zip_proof.z_comm.roots == proof_h.zip_proof.z_comm.roots
    ZincVerifier(zt).verify(statement, proof_d, KeccakTranscript(), ccs, cfg)


def test_ccs_pad():
    rng = random.Random(5)
    z = [rng.randrange(-100, 100) for _ in range(24)]  # not a power of two
    z[1] = 1
    ccs, statement, wit = dummy_ccs_from_z(z, pub_io_len=1)
    ccs.pad(statement, len(z))  # explicit, like the reference (ccs_z.rs:110-130)
    assert ccs.m == 32 and ccs.s == 5
    for m in statement.constraints:
        assert m.n_rows == 32 and m.n_cols == 32
    z_vec = statement.get_z_vector(wit.w_ccs)
    z_vec = z_vec + [0] * (ccs.m - len(z_vec))
    ccs.check_relation(statement.constraints, z_vec)
