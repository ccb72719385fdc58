"""Gruen eq-factorized sumcheck tier (sumcheck/mxu_exec.py §Gruen).

Pins, against the host oracle on the CPU backend:
  * the flat suffix-eq buffer (levels E_j, bit-reversed lane order),
  * round evaluations s_j(t) = pref·c_j(t)·Σ coeff·h (host + device decode),
  * full device-FS byte identity of the Gruen kernel (XLA twins), including
    the reconstructed eq row the host tail consumes.

Reference combination shape: /root/reference/src/spartan/prover.rs (every
linearization term carries the same eq(β,·) factor).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.fields.montgomery import device_field
from zinc_tpu.poly.device import fps_to_limbs, limbs_to_fp
from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r
from zinc_tpu.sumcheck.mxu_exec import (
    TILE,
    build_eq_suffix_flat,
    eval_lm_gruen_ref,
    fold_lm_ref,
    gruen_g_to_evals_device,
    gruen_g_to_evals_host,
    gruen_supported,
    gruen_term_meta,
    suffix_offsets,
    _to_lm,
)
from zinc_tpu.sumcheck.prover import _fold, _round_evals, prove_as_subprotocol
from zinc_tpu.transcript import KeccakTranscript

CFG = FieldConfig((1 << 255) + 95, 4)
CTX = device_field(CFG)


def _beta(nv, seed):
    rng = random.Random(seed)
    return [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]


def test_suffix_flat_matches_host_eq_levels():
    nv = 4
    beta = _beta(nv, 1)
    flat = np.asarray(
        build_eq_suffix_flat(CTX, jnp.asarray(fps_to_limbs(beta, CFG)), nv)
    )
    offs = suffix_offsets(nv)
    one = CFG.one()
    for j in range(1, nv + 1):  # level E_j: suffix vars j+1..nv, bit-reversed
        lanes = 1 << (nv - j)
        for p in range(lanes):
            expect = one
            for m in range(1, nv - j + 1):  # x_{j+m} = bit (nv-j-m) of p (MSB first)
                bit = (p >> (nv - j - m)) & 1
                bk = beta[j + m - 1]
                expect = expect * (bk if bit else (one - bk))
            got = limbs_to_fp(flat[:, offs[j - 1] + p], CFG)
            assert got == expect, (j, p)


def _gruen_setup(nv, seed):
    rng = random.Random(seed)
    n_tabs = 3
    tabs = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(n_tabs)
    ]
    beta = _beta(nv, seed + 100)
    eq_tab = build_eq_x_r(beta, CFG).evaluations
    comb = [(CFG.fp(7), (0, 1, 3)), (-CFG.one(), (2, 3))]
    return tabs, beta, eq_tab, comb


def test_gruen_round_evals_match_host_oracle():
    nv = 10
    tabs, beta, eq_tab, comb = _gruen_setup(nv, 2)
    degree = 3
    idx_terms = tuple(idxs for _, idxs in comb)
    assert gruen_supported(idx_terms, 3, CFG.n16)
    terms = gruen_term_meta(idx_terms, 3)

    mles = [list(t) for t in tabs] + [list(eq_tab)]
    beta_l = jnp.asarray(fps_to_limbs(beta, CFG))
    e_flat = build_eq_suffix_flat(CTX, beta_l, nv)
    buf = _to_lm(jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tabs]), 1 << nv)

    # round 1: E_1 at offset 0, pref = 1
    host1 = _round_evals(mles, degree, comb, CFG)
    gs = eval_lm_gruen_ref(CTX, buf, e_flat, terms, (1 << nv) // (2 * TILE), 0)
    got1 = gruen_g_to_evals_host(CFG, gs, comb, terms, degree, beta[0], CFG.one())
    assert got1 == host1

    # device decode twin: same G planes → same evals
    coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], CFG))
    dev1 = np.asarray(
        gruen_g_to_evals_device(
            CTX, gs, coeffs, terms, degree,
            jnp.asarray(fps_to_limbs([beta[0]], CFG)[0]), jnp.asarray(CTX.one),
        )
    )
    assert [limbs_to_fp(dev1[t], CFG) for t in range(degree + 1)] == host1

    # round 2: fold r, pref = eq(β_1, r), E_2 at offset 2^{nv-1}
    r = CFG.fp(random.Random(77).randrange(CFG.q))
    mles = _fold(mles, r)
    host2 = _round_evals(mles, degree, comb, CFG)
    r_l = jnp.asarray(fps_to_limbs([r], CFG)[0])
    act = 1 << nv
    buf = fold_lm_ref(CTX, buf, r_l, act // (4 * TILE))
    act //= 2
    gs2 = eval_lm_gruen_ref(
        CTX, buf, e_flat, terms, act // (2 * TILE), ((1 << nv) - act) // TILE
    )
    one = CFG.one()
    pref = (one - beta[0]) * (one - r) + beta[0] * r
    got2 = gruen_g_to_evals_host(CFG, gs2, comb, terms, degree, beta[1], pref)
    assert got2 == host2


@pytest.mark.parametrize("nv", [10])
def test_device_fs_gruen_byte_identity(nv):
    """Full Gruen FS kernel (XLA twins) vs the host prover — proof bytes,
    randomness, transcript end state, and the reconstructed eq row that the
    host tail consumes.

    One nv suffices: the r5 durations run showed the nv=11 twin cost +94 s
    of pure XLA:CPU compile for the same program structure (suite-cost
    VERDICT r3 item 6); odd/even device-round splits are still covered by
    test_device_fs_transcript_identical[10,11]."""
    from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs, wants_gruen

    tabs, beta, eq_tab, comb = _gruen_setup(nv, nv)
    degree = 3
    assert wants_gruen(CFG, comb, 3, 1 << nv)

    th = KeccakTranscript()
    th.absorb(b"gruen-prefix")
    g_mles = [DenseMleF(nv, list(t), CFG) for t in tabs] + [
        DenseMleF(nv, list(eq_tab), CFG)
    ]
    proof_h, state_h = prove_as_subprotocol(th, g_mles, nv, degree, comb, CFG)

    td = KeccakTranscript()
    td.absorb(b"gruen-prefix")
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tabs])
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs(
        td, CFG, stacked, nv, degree, comb, eq_beta=beta
    )

    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    # final values: 3 tables + the factored-out eq, all must match the host
    assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
    assert th.h.digest() == td.h.digest()
    assert th.get_challenge(CFG) == td.get_challenge(CFG)


def test_spartan_device_gruen_production_route():
    """spartan_prove_device at a Gruen-eligible size (2^10) must produce the
    exact host-prover transcript through the Gruen FS kernel."""
    import os

    from zinc_tpu.ccs import dummy_ccs_of_size
    from zinc_tpu.spartan import spartan_prove
    from zinc_tpu.spartan_dev import DeviceStatement, spartan_prove_device, z_to_device
    from zinc_tpu.poly.mle import DenseMleZ

    rng = random.Random(5)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 10, rng, int_bits=62)
    cfg = CFG
    z_ccs = statement.get_z_vector(wit.w_ccs)
    if len(z_ccs) <= ccs.m:
        z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))
    z_mle = DenseMleZ(ccs.s_prime, z_ccs)
    z_f = [cfg.fp(v) for v in z_ccs]
    ccs_f = ccs.map_to_field(cfg)
    statement_f = statement.map_to_field(cfg)

    th = KeccakTranscript()
    proof_h, ry_h = spartan_prove(statement_f, z_f, z_mle, ccs_f, th, cfg)

    td = KeccakTranscript()
    dstat = DeviceStatement.upload(cfg, statement)
    proof_d, ry_d, v_d = spartan_prove_device(
        dstat, z_to_device(cfg, z_ccs), ccs, td, cfg
    )

    assert proof_d.linearization_sumcheck == proof_h.linearization_sumcheck
    assert proof_d.second_sumcheck == proof_h.second_sumcheck
    assert proof_d.V_s == proof_h.V_s
    assert ry_d == ry_h
    assert th.h.digest() == td.h.digest()
