"""Sumcheck protocol tests — mirrors the reference soundness suite
(/root/reference/src/sumcheck/tests.rs): roundtrip, wrong sum, tampered
message, wrong degree, tampered transcript, incomplete proof, determinism."""

import random

import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r_vec, eq_eval
from zinc_tpu.sumcheck import (
    SumcheckError,
    interpolate_uni_poly,
    prove_as_subprotocol,
    verify_as_subprotocol,
)
from zinc_tpu.transcript import KeccakTranscript

Q128 = 312829638388039969874974628075306023441
CFG = FieldConfig(Q128, 3)


def rand_product_poly(nv, num_multiplicands_range, num_products, cfg, rng):
    """Random sum of products of MLEs, returning (mles, degree, comb, sum)."""
    mles = []
    comb = []
    total = cfg.zero()
    degree = 0
    idx = 0
    for _ in range(num_products):
        k = rng.randrange(*num_multiplicands_range)
        degree = max(degree, k)
        coeff = cfg.fp(rng.randrange(cfg.q))
        product_tables = [
            [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(k)
        ]
        # product sum over hypercube
        psum = cfg.zero()
        for b in range(1 << nv):
            t = cfg.one()
            for tab in product_tables:
                t = t * tab[b]
            psum = psum + t
        total = total + coeff * psum
        mles.extend(DenseMleF(nv, t, cfg) for t in product_tables)
        comb.append((coeff, tuple(range(idx, idx + k))))
        idx += k
    return mles, degree, comb, total


def prove_and_get(nv=5, seed=0, num_products=3):
    rng = random.Random(seed)
    mles, degree, comb, total = rand_product_poly(nv, (2, 4), num_products, CFG, rng)
    t = KeccakTranscript()
    proof, state = prove_as_subprotocol(t, mles, nv, degree, comb, CFG)
    return mles, degree, comb, total, proof, state


def test_sumcheck_roundtrip():
    mles, degree, comb, total, proof, state = prove_and_get()
    vt = KeccakTranscript()
    sub = verify_as_subprotocol(vt, 5, degree, total, proof, CFG)
    # final check: evaluate the polynomial at the subclaim point
    vals = [m.evaluate(sub.point) for m in mles]
    acc = CFG.zero()
    for coeff, idxs in comb:
        term = coeff
        for j in idxs:
            term = term * vals[j]
        acc = acc + term
    assert acc == sub.expected_evaluation
    # prover randomness equals verifier point (same transcript)
    assert state.randomness == sub.point


def test_sumcheck_wrong_sum_rejected():
    _, degree, _, total, proof, _ = prove_and_get()
    vt = KeccakTranscript()
    with pytest.raises(SumcheckError):
        verify_as_subprotocol(vt, 5, degree, total + CFG.one(), proof, CFG)


def test_sumcheck_tampered_message_rejected():
    _, degree, _, total, proof, _ = prove_and_get()
    proof = [list(r) for r in proof]
    proof[2][1] = proof[2][1] + CFG.one()
    vt = KeccakTranscript()
    with pytest.raises(SumcheckError):
        verify_as_subprotocol(vt, 5, degree, total, proof, CFG)


def test_sumcheck_tampered_transcript_rejected():
    _, degree, _, total, proof, _ = prove_and_get()
    vt = KeccakTranscript()
    vt.absorb(b"extra bytes the prover never saw")
    with pytest.raises(SumcheckError):
        verify_as_subprotocol(vt, 5, degree, total, proof, CFG)


def test_sumcheck_incomplete_proof_rejected():
    _, degree, _, total, proof, _ = prove_and_get()
    vt = KeccakTranscript()
    with pytest.raises(SumcheckError):
        verify_as_subprotocol(vt, 5, degree, total, proof[:-1], CFG)


def test_sumcheck_wrong_degree_rejected():
    _, degree, _, total, proof, _ = prove_and_get()
    vt = KeccakTranscript()
    with pytest.raises(SumcheckError):
        verify_as_subprotocol(vt, 5, degree + 1, total, proof, CFG)


def test_sumcheck_determinism():
    *_, proof1, s1 = prove_and_get(seed=7)
    *_, proof2, s2 = prove_and_get(seed=7)
    assert proof1 == proof2
    assert s1.randomness == s2.randomness


def test_extract_sum():
    _, degree, _, total, proof, _ = prove_and_get()
    assert proof[0][0] + proof[0][1] == total


def test_interpolate_uni_poly():
    rng = random.Random(3)
    # polynomial p(x) = 3x^3 + x + 7 sampled at 0..3, interpolated anywhere
    def p(x):
        return CFG.fp(3) * x * x * x + x + CFG.fp(7)

    evals = [p(CFG.fp(i)) for i in range(4)]
    for _ in range(20):
        x = CFG.fp(rng.randrange(CFG.q))
        assert interpolate_uni_poly(evals, x) == p(x)
    # node early-exit path
    assert interpolate_uni_poly(evals, CFG.fp(2)) == evals[2]


def test_eq_table_and_eval():
    rng = random.Random(5)
    r = [CFG.fp(rng.randrange(CFG.q)) for _ in range(4)]
    table = build_eq_x_r_vec(r)
    assert len(table) == 16
    one, zero = CFG.one(), CFG.zero()
    for i in range(16):
        x = [one if (i >> j) & 1 else zero for j in range(4)]
        assert eq_eval(x, r) == table[i]
    # table sums to 1
    acc = CFG.zero()
    for v in table:
        acc = acc + v
    assert acc == one


def test_zero_vars_sumcheck():
    t = KeccakTranscript()
    proof, state = prove_as_subprotocol(t, [DenseMleF(0, [CFG.fp(5)], CFG)], 0, 1, [(CFG.one(), (0,))], CFG)
    assert proof == []
    vt = KeccakTranscript()
    sub = verify_as_subprotocol(vt, 0, 1, CFG.fp(5), proof, CFG)
    assert sub.expected_evaluation == CFG.fp(5)
