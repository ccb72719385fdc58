"""Device Spartan prover must be transcript- and proof-identical to host."""

import random

from zinc_tpu.ccs import dummy_ccs_of_size, vitalik_fixture
from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import DenseMleZ
from zinc_tpu.spartan import spartan_prove, spartan_verify
from zinc_tpu.spartan_dev import DeviceStatement, spartan_prove_device, z_to_device
from zinc_tpu.transcript import KeccakTranscript

Q128 = 312829638388039969874974628075306023441
CFG = FieldConfig(Q128, 3)


def _prepare_host(ccs, statement, wit, cfg):
    z_ccs = statement.get_z_vector(wit.w_ccs)
    if len(z_ccs) <= ccs.m:
        z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))
    z_mle = DenseMleZ(ccs.s_prime, z_ccs)
    z_f = [cfg.fp(v) for v in z_ccs]
    return z_ccs, z_mle, z_f


def test_device_spartan_matches_host_dummy():
    rng = random.Random(7)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 5, rng, int_bits=62)
    z_ccs, z_mle, z_f_host = _prepare_host(ccs, statement, wit, CFG)

    # host
    th = KeccakTranscript()
    ccs_f = ccs.map_to_field(CFG)
    statement_f = statement.map_to_field(CFG)
    proof_h, ry_h = spartan_prove(statement_f, z_f_host, z_mle, ccs_f, th, CFG)

    # device
    td = KeccakTranscript()
    dstat = DeviceStatement.upload(CFG, statement)
    zdev = z_to_device(CFG, z_ccs)
    proof_d, ry_d, v_d = spartan_prove_device(dstat, zdev, ccs, td, CFG)

    assert proof_d.linearization_sumcheck == proof_h.linearization_sumcheck
    assert proof_d.second_sumcheck == proof_h.second_sumcheck
    assert proof_d.V_s == proof_h.V_s
    assert ry_d == ry_h
    assert th.get_random_bytes(16) == td.get_random_bytes(16)
    # v must equal the host evaluation of z̃ at r_y
    assert v_d == z_mle.map_to_field(CFG).evaluate(ry_h)

    # device proof verifies
    points = spartan_verify(proof_d, ccs_f, KeccakTranscript(), CFG)
    assert points.rx_ry[ccs.s :] == ry_d


def test_device_spartan_matches_host_vitalik():
    ccs, statement, wit = vitalik_fixture(3)
    z_ccs, z_mle, z_f_host = _prepare_host(ccs, statement, wit, CFG)

    th = KeccakTranscript()
    ccs_f = ccs.map_to_field(CFG)
    statement_f = statement.map_to_field(CFG)
    proof_h, ry_h = spartan_prove(statement_f, z_f_host, z_mle, ccs_f, th, CFG)

    td = KeccakTranscript()
    dstat = DeviceStatement.upload(CFG, statement)
    zdev = z_to_device(CFG, z_ccs)
    proof_d, ry_d, _ = spartan_prove_device(dstat, zdev, ccs, td, CFG)

    assert proof_d.linearization_sumcheck == proof_h.linearization_sumcheck
    assert proof_d.second_sumcheck == proof_h.second_sumcheck
    assert proof_d.V_s == proof_h.V_s
    assert ry_d == ry_h


def test_evaluate_mle_device_matches_host():
    import random

    from zinc_tpu.ccs import dummy_ccs_of_size
    from zinc_tpu.ops.sparse import evaluate_mle_device, upload_matrix_f
    from zinc_tpu.prime import draw_random_field
    from zinc_tpu.sparse import evaluate_mle
    from zinc_tpu.transcript import KeccakTranscript

    rng = random.Random(9)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 5, rng, int_bits=40)
    cfg = draw_random_field(statement.public_input, KeccakTranscript(), 1, 4)
    statement_f = statement.map_to_field(cfg)
    r_x = [cfg.fp(rng.randrange(cfg.q)) for _ in range(ccs.s)]
    r_y = [cfg.fp(rng.randrange(cfg.q)) for _ in range(ccs.s_prime)]
    for m in statement_f.constraints:
        host = evaluate_mle(m, r_x, r_y, cfg)
        dev = evaluate_mle_device(cfg, upload_matrix_f(cfg, m), r_x, r_y)
        assert host == dev


def test_device_verifier_backend():
    import random

    from zinc_tpu.ccs import dummy_ccs_of_size
    from zinc_tpu.prime import draw_random_field
    from zinc_tpu.transcript import KeccakTranscript
    from zinc_tpu.zinc import ZincProver, ZincVerifier
    from zinc_tpu.zip.code import ZipTypes

    zt = ZipTypes(1)
    rng = random.Random(10)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 5, rng, int_bits=40)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, zt.n_words, 4)
    proof = ZincProver(zt).prove(statement, wit, t, ccs, cfg)
    ZincVerifier(zt, backend="device").verify(
        statement, proof, KeccakTranscript(), ccs, cfg
    )
