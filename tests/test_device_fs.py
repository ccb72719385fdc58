"""Device-resident Fiat-Shamir sumcheck must be bit-identical to the host.

Runs the XLA variant of the FS kernel on the CPU backend (the Pallas
variant shares every line except the round primitive and is covered by the
TPU-gated tests + e2e proofs).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.device import fps_to_limbs
from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs
from zinc_tpu.sumcheck.prover import prove_as_subprotocol
from zinc_tpu.transcript import KeccakTranscript

CFG = FieldConfig((1 << 255) + 95, 4)


def _setup(nv, n_mles, seed):
    rng = random.Random(seed)
    tables_f = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, CFG)) for tf in tables_f])
    return tables_f, stacked


@pytest.mark.parametrize("nv", [10, 11])
def test_device_fs_transcript_identical(nv):
    tables_f, stacked = _setup(nv, 3, nv)
    comb = [(CFG.one(), (0, 1)), (-CFG.one(), (2,)), (CFG.fp(9), (0, 2))]

    from zinc_tpu.poly.mle import DenseMleF

    th = KeccakTranscript()
    th.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_h, state_h = prove_as_subprotocol(
        th, [DenseMleF(nv, list(t), CFG) for t in tables_f], nv, 2, comb, CFG
    )

    td = KeccakTranscript()
    td.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs(td, CFG, stacked, nv, 2, comb)

    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
    # the host transcript objects must end in the same state
    assert th.h.digest() == td.h.digest()
    r_next_h = th.get_challenge(CFG)
    r_next_d = td.get_challenge(CFG)
    assert r_next_h == r_next_d


def test_device_fs_128bit_field_regime():
    """Challenge masking regime bits < 128 (2-word field)."""
    cfg = FieldConfig(0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF61, 2)
    rng = random.Random(3)
    nv, n_mles = 10, 2
    tables_f = [
        [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, cfg)) for tf in tables_f])
    comb = [(cfg.one(), (0, 1))]

    from zinc_tpu.poly.mle import DenseMleF

    th = KeccakTranscript()
    proof_h, state_h = prove_as_subprotocol(
        th, [DenseMleF(nv, list(t), cfg) for t in tables_f], nv, 2, comb, cfg
    )
    td = KeccakTranscript()
    proof_d, rs_d, _ = prove_as_subprotocol_device_fs(td, cfg, stacked, nv, 2, comb)
    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    assert th.h.digest() == td.h.digest()


def test_device_fs_degree4_terms():
    """Degree-4 combination (a 4-factor term) through the device-FS kernel
    (plain-XLA rounds on CPU; the widened MXU tier itself is pinned by
    test_mxu_twins + the sharded-executor degree-4 test) — byte identity
    (VERDICT r2 item 8).  nv=10 is the smallest FS-driver shape (suite cost)."""
    nv = 10
    tables_f, stacked = _setup(nv, 4, 7)
    comb = [(CFG.fp(5), (0, 1, 2, 3)), (-CFG.one(), (1, 2, 3)), (CFG.one(), (0, 3))]

    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sumcheck.mxu_exec import mxu_supported

    assert mxu_supported(tuple(t for _, t in comb), CFG.n16)

    th = KeccakTranscript()
    proof_h, state_h = prove_as_subprotocol(
        th, [DenseMleF(nv, list(t), CFG) for t in tables_f], nv, 4, comb, CFG
    )
    td = KeccakTranscript()
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs(td, CFG, stacked, nv, 4, comb)
    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
    assert th.h.digest() == td.h.digest()


def test_device_fs_gruen_degree4():
    """Gruen FS kernel with a 3-P-factor term (E joins the last factor as
    the lazy e-side): full byte identity vs the host prover.  nv=10 is the
    smallest Gruen-eligible shape (suite cost — the compile dominates)."""
    from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r
    from zinc_tpu.sumcheck.device_fs import wants_gruen

    nv = 10
    rng = random.Random(8)
    tables_f, stacked = _setup(nv, 3, 8)
    beta = [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]
    eq_tab = build_eq_x_r(beta, CFG).evaluations
    comb = [(CFG.fp(3), (0, 1, 2, 3)), (CFG.one(), (0, 3))]
    assert wants_gruen(CFG, comb, 3, 1 << nv)

    th = KeccakTranscript()
    proof_h, state_h = prove_as_subprotocol(
        th,
        [DenseMleF(nv, list(t), CFG) for t in tables_f]
        + [DenseMleF(nv, list(eq_tab), CFG)],
        nv, 4, comb, CFG,
    )
    td = KeccakTranscript()
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs(
        td, CFG, stacked, nv, 4, comb, eq_beta=beta
    )
    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
    assert th.h.digest() == td.h.digest()
