"""XLA twins of the MXU limb-major kernels vs the host oracle (CPU suite).

The Pallas MXU round kernels (sumcheck/mxu_exec.py) were previously pinned
only by the on-chip suite; the XLA twins (fold_lm_ref / eval_lm_ref) run the
identical limb/REDC/byte-plane algebra as plain XLA, so the fused v3 fold
chain and the G-plane evaluation are value-pinned against the pure-Python
oracle on every CPU run — and the sharded limb-major executor
(parallel/sumcheck.py) exercises the same code path on the virtual mesh.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.fields.montgomery import device_field
from zinc_tpu.poly.device import fps_to_limbs
from zinc_tpu.sumcheck.mxu_exec import (
    TILE,
    _from_lm,
    _to_lm,
    eval_lm_ref,
    fold_lm_ref,
    g_to_evals_host,
    term_meta,
)
from zinc_tpu.sumcheck.prover import _fold, _round_evals

CFG = FieldConfig((1 << 255) + 95, 4)
IDX_TERMS = ((0, 3), (1, 3), (2, 3))
DEGREE = 3


def _setup(b: int, n_mles: int = 4, seed: int = 0):
    rng = random.Random(seed)
    comb = [(CFG.one(), t) for t in IDX_TERMS]
    mles = [[CFG.fp(rng.randrange(CFG.q)) for _ in range(b)] for _ in range(n_mles)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, CFG)) for m in mles])
    r = CFG.fp(rng.randrange(CFG.q))
    return comb, mles, tabs, r


def test_fold_lm_ref_matches_host_fold():
    b = 4 * TILE * 2
    ctx = device_field(CFG)
    comb, mles, tabs, r = _setup(b)
    buf = _to_lm(jnp.asarray(tabs), b)
    r_limbs = jnp.asarray(fps_to_limbs([r], CFG)[0])
    folded = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    got = np.asarray(_from_lm(folded, b // 2))
    want = np.stack([np.asarray(fps_to_limbs(m, CFG)) for m in _fold(mles, r)])
    assert np.array_equal(got, want)


def test_eval_lm_ref_matches_host_round_evals():
    b = 4 * TILE * 2
    ctx = device_field(CFG)
    comb, mles, tabs, r = _setup(b, seed=1)
    terms = term_meta(IDX_TERMS)
    buf = _to_lm(jnp.asarray(tabs), b)
    # round 0
    gs = eval_lm_ref(ctx, buf, terms, b // (2 * TILE))
    evals = g_to_evals_host(CFG, [np.asarray(g) for g in gs], comb, terms, DEGREE)
    assert evals == _round_evals(mles, DEGREE, comb, CFG)
    # round 1 after a fold
    r_limbs = jnp.asarray(fps_to_limbs([r], CFG)[0])
    buf = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    gs = eval_lm_ref(ctx, buf, terms, (b // 2) // (2 * TILE))
    evals = g_to_evals_host(CFG, [np.asarray(g) for g in gs], comb, terms, DEGREE)
    assert evals == _round_evals(_fold(mles, r), DEGREE, comb, CFG)


def test_eval_lm_ref_two_factor_terms():
    """2-factor terms (npj == 2 P-basis) through the same twin."""
    b = 2 * TILE * 2
    ctx = device_field(CFG)
    idx_terms = ((0, 1), (2, 1))
    comb_terms = term_meta(idx_terms)
    rng = random.Random(2)
    comb = [(CFG.one(), t) for t in idx_terms]
    mles = [[CFG.fp(rng.randrange(CFG.q)) for _ in range(b)] for _ in range(3)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, CFG)) for m in mles])
    buf = _to_lm(jnp.asarray(tabs), b)
    gs = eval_lm_ref(ctx, buf, comb_terms, b // (2 * TILE))
    evals = g_to_evals_host(CFG, [np.asarray(g) for g in gs], comb, comb_terms, 2)
    assert evals == _round_evals(mles, 2, comb, CFG)


def test_eval_lm_ref_four_factor_terms_degree4():
    """4-factor terms (VERDICT r2 item 8): the e-MLE pairs with one P factor
    as a lazy-product side (ne = 4) — degree-4 evals must match the oracle."""
    b = 2 * TILE * 2
    ctx = device_field(CFG)
    idx_terms = ((0, 1, 2, 3), (1, 2, 3))  # one 4-factor + one 3-factor term
    degree = 4
    comb_terms = term_meta(idx_terms, CFG.n16)
    rng = random.Random(3)
    comb = [(CFG.fp(5), idx_terms[0]), (-CFG.one(), idx_terms[1])]
    mles = [[CFG.fp(rng.randrange(CFG.q)) for _ in range(b)] for _ in range(4)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, CFG)) for m in mles])
    buf = _to_lm(jnp.asarray(tabs), b)
    gs = eval_lm_ref(ctx, buf, comb_terms, b // (2 * TILE))
    evals = g_to_evals_host(CFG, [np.asarray(g) for g in gs], comb, comb_terms, degree)
    assert evals == _round_evals(mles, degree, comb, CFG)
    # and after a fold (round 1)
    r = CFG.fp(rng.randrange(CFG.q))
    r_limbs = jnp.asarray(fps_to_limbs([r], CFG)[0])
    buf = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    gs = eval_lm_ref(ctx, buf, comb_terms, (b // 2) // (2 * TILE))
    evals = g_to_evals_host(CFG, [np.asarray(g) for g in gs], comb, comb_terms, degree)
    assert evals == _round_evals(_fold(mles, r), degree, comb, CFG)


def test_lm_twins_384bit_field():
    """>16-limb fields (VERDICT r2 item 8): the full fold+eval twin chain on
    a 384-bit prime (l16 = 24) must match the oracle."""
    from zinc_tpu.sumcheck.mxu_exec import mxu_supported

    cfg6 = FieldConfig((1 << 383) + 369, 6)  # 384-bit prime (2^383+369)
    assert cfg6.n16 == 24 and mxu_supported(IDX_TERMS, cfg6.n16)
    b = 2 * TILE * 2
    ctx = device_field(cfg6)
    terms = term_meta(IDX_TERMS, cfg6.n16)
    rng = random.Random(4)
    comb = [(cfg6.one(), t) for t in IDX_TERMS]
    mles = [[cfg6.fp(rng.randrange(cfg6.q)) for _ in range(b)] for _ in range(4)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, cfg6)) for m in mles])
    buf = _to_lm(jnp.asarray(tabs), b)
    gs = eval_lm_ref(ctx, buf, terms, b // (2 * TILE))
    evals = g_to_evals_host(cfg6, [np.asarray(g) for g in gs], comb, terms, DEGREE)
    assert evals == _round_evals(mles, DEGREE, comb, cfg6)
    r = cfg6.fp(rng.randrange(cfg6.q))
    r_limbs = jnp.asarray(fps_to_limbs([r], cfg6)[0])
    folded = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    got = np.asarray(_from_lm(folded, b // 2))
    want = np.stack([np.asarray(fps_to_limbs(m, cfg6)) for m in _fold(mles, r)])
    assert np.array_equal(got, want)


def test_gruen_ref_four_factor_term():
    """Gruen tier with a 3-P-factor term: E joins the last factor as the
    lazy e-side (ne = 2) — round evals must match the host oracle."""
    from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r
    from zinc_tpu.sumcheck.mxu_exec import (
        build_eq_suffix_flat,
        eval_lm_gruen_ref,
        gruen_g_to_evals_host,
        gruen_supported,
        gruen_term_meta,
    )

    nv = 11
    b = 1 << nv
    ctx = device_field(CFG)
    rng = random.Random(5)
    tabs_f = [[CFG.fp(rng.randrange(CFG.q)) for _ in range(b)] for _ in range(3)]
    beta = [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]
    eq_tab = build_eq_x_r(beta, CFG).evaluations
    idx_terms = ((0, 1, 2, 3), (0, 3))  # deg-4 gruen term + linear term
    degree = 4
    assert gruen_supported(idx_terms, 3, CFG.n16)
    terms = gruen_term_meta(idx_terms, 3, CFG.n16)
    comb = [(CFG.fp(3), idx_terms[0]), (CFG.one(), idx_terms[1])]

    mles = [list(t) for t in tabs_f] + [list(eq_tab)]
    host = _round_evals(mles, degree, comb, CFG)

    beta_l = jnp.asarray(fps_to_limbs(beta, CFG))
    e_flat = build_eq_suffix_flat(ctx, beta_l, nv)
    buf = _to_lm(jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tabs_f]), b)
    gs = eval_lm_gruen_ref(ctx, buf, e_flat, terms, b // (2 * TILE), 0)
    got = gruen_g_to_evals_host(CFG, gs, comb, terms, degree, beta[0], CFG.one())
    assert got == host


@pytest.mark.parametrize("q", [(1 << 255) + 95, (1 << 256) - 189])
def test_redc_tail_boundaries(q):
    """The single-sweep REDC tail (resolve + divide-by-R + mod-q with
    lane-stacked candidates) must reduce u = x*R correctly at every
    boundary of [0, 3q) - random fold values land in [2q, 3q) with
    probability ~0.02% at the default q, so the k=2 branch needs directed
    vectors; the second q is the largest 256-bit prime (3q-1 nearly
    saturates the 2l+2-limb grid)."""
    from zinc_tpu.fields.limbs import int_to_limbs, limbs_to_int
    from zinc_tpu.sumcheck.mxu_exec import _redc_tail_T

    cfg = FieldConfig(q, 4)
    l = cfg.n16
    ctx = device_field(cfg)
    rng = random.Random(6)
    vals = [0, 1, q - 1, q, q + 1, 2 * q - 1, 2 * q, 2 * q + 1, 3 * q - 1]
    vals += [rng.randrange(3 * q) for _ in range(23)]
    # u = x*R as lazy 16-bit columns: x's limbs at positions l..3l-1
    u = np.zeros((2 * l + 2, len(vals)), np.uint32)
    for i, v in enumerate(vals):
        u[l : 2 * l + 1, i] = np.asarray(int_to_limbs(v, l + 1))
    for kmax in (1, 2):
        cap = (kmax + 1) * q
        got = np.asarray(
            _redc_tail_T(jnp.asarray(u), jnp.asarray(ctx.q_wide), l, kmax)
        )
        for i, v in enumerate(vals):
            if v < cap:
                assert limbs_to_int(got[:, i]) == v % q, (kmax, v)


def test_fold_lm_ref_below_half_R_prime():
    """Fold twin at q = 2^255 − 19 ≤ R/2: the fused fold's REDC tail picks
    kmax = 1 at trace time for this field class (~half of the primes
    draw_random_field produces) — the cheaper branch must stay exact at
    typical vectors."""
    cfg1 = FieldConfig((1 << 255) - 19, 4)
    assert 2 * cfg1.q <= 1 << (16 * cfg1.n16)  # the kmax=1 class
    b = 4 * TILE
    ctx = device_field(cfg1)
    rng = random.Random(8)
    mles = [[cfg1.fp(rng.randrange(cfg1.q)) for _ in range(b)] for _ in range(2)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, cfg1)) for m in mles])
    buf = _to_lm(jnp.asarray(tabs), b)
    r = cfg1.fp(rng.randrange(cfg1.q))
    r_limbs = jnp.asarray(fps_to_limbs([r], cfg1)[0])
    folded = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    got = np.asarray(_from_lm(folded, b // 2))
    want = np.stack([np.asarray(fps_to_limbs(m, cfg1)) for m in _fold(mles, r)])
    assert np.array_equal(got, want)


def test_fold_lm_ref_near_R_prime():
    """Fold twin at q = 2^256 − 189 (the largest 256-bit prime): with
    q/R ≈ 1 the fused fold's u/R ranges up to ~2.97q, so the REDC tail's
    k = 2 candidate is selected by TYPICAL vectors rather than only
    directed ones (at the default q = 2^255+95 that region has measure
    ~2^-13 per element)."""
    cfgR = FieldConfig((1 << 256) - 189, 4)
    assert cfgR.n16 == 16
    b = 4 * TILE
    ctx = device_field(cfgR)
    rng = random.Random(7)
    mles = [[cfgR.fp(rng.randrange(cfgR.q)) for _ in range(b)] for _ in range(2)]
    tabs = np.stack([np.asarray(fps_to_limbs(m, cfgR)) for m in mles])
    buf = _to_lm(jnp.asarray(tabs), b)
    r = cfgR.fp(rng.randrange(cfgR.q))
    r_limbs = jnp.asarray(fps_to_limbs([r], cfgR)[0])
    folded = fold_lm_ref(ctx, buf, r_limbs, b // (4 * TILE))
    got = np.asarray(_from_lm(folded, b // 2))
    want = np.stack([np.asarray(fps_to_limbs(m, cfgR)) for m in _fold(mles, r)])
    assert np.array_equal(got, want)
