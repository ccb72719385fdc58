"""Pallas round kernels must match the XLA round body bit-for-bit.

These only run where Pallas TPU kernels can execute (the attached chip);
on the CPU test backend they are skipped — the XLA path they are checked
against is what the CPU suite exercises everywhere else.
"""

import random

import jax
import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs the TPU backend"
)


@requires_tpu
def test_pallas_round_matches_xla():
    import jax.numpy as jnp

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.limbs import ints_to_limbs, limbs_to_int
    from zinc_tpu.fields.montgomery import device_field
    from zinc_tpu.ops.pallas_field import mont_fold_pallas, round_eval_pallas
    from zinc_tpu.sumcheck.device import _round_body

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    pr = random.Random(7)
    n_mles, b, l = 4, 512, 16
    degree, idx_terms = 3, ((0, 3), (1, 3), (2, 3))
    tabs = jnp.asarray(
        np.stack([ints_to_limbs([pr.randrange(cfg.q) for _ in range(b)], l) for _ in range(n_mles)])
    )
    coeffs = jnp.asarray(ints_to_limbs([pr.randrange(cfg.q) for _ in range(len(idx_terms))], l))
    r = jnp.asarray(ints_to_limbs([pr.randrange(cfg.q)], l)[0])

    folded_ref, wide_ref = _round_body(ctx, tabs, (r, coeffs), False, degree, idx_terms)
    folded_p = mont_fold_pallas(ctx, tabs, r, 128)
    assert np.array_equal(np.asarray(folded_p), np.asarray(folded_ref))

    sums_p = np.asarray(round_eval_pallas(ctx, folded_p, coeffs, degree, idx_terms, 128))
    wide_ref2 = np.asarray(_round_body(ctx, folded_ref, (r, coeffs), True, degree, idx_terms)[1])
    for p in range(degree + 1):
        assert limbs_to_int(sums_p[p]) % cfg.q == limbs_to_int(wide_ref2[p]) % cfg.q


@requires_tpu
def test_pallas_mont_mul_matches_xla():
    import jax.numpy as jnp

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.limbs import ints_to_limbs
    from zinc_tpu.fields.montgomery import device_field, mont_mul
    from zinc_tpu.ops.pallas_field import mont_mul_pallas_t

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    pr = random.Random(8)
    vals_a = [pr.randrange(cfg.q) for _ in range(256)]
    vals_b = [pr.randrange(cfg.q) for _ in range(256)]
    a = jnp.asarray(ints_to_limbs(vals_a, 16))
    b = jnp.asarray(ints_to_limbs(vals_b, 16))
    assert np.array_equal(
        np.asarray(mont_mul_pallas_t(ctx, a, b, 128)), np.asarray(mont_mul(ctx, a, b))
    )


def _cfg_ctx():
    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.montgomery import device_field

    cfg = FieldConfig((1 << 255) + 95, 4)
    return cfg, device_field(cfg)


def _rand_tables(cfg, n_mles, b, seed):
    import jax.numpy as jnp

    from zinc_tpu.poly.device import fps_to_limbs

    pr = random.Random(seed)
    mles = [[cfg.fp(pr.randrange(cfg.q)) for _ in range(b)] for _ in range(n_mles)]
    tabs = jnp.asarray(
        np.stack([np.asarray(fps_to_limbs(m, cfg)) for m in mles])
    )
    return mles, tabs


@requires_tpu
def test_vpu_fixed_buffer_fused_round_matches_round_body():
    import jax.numpy as jnp

    from zinc_tpu.fields.limbs import limbs_to_int
    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.sumcheck.device import _round_body
    from zinc_tpu.sumcheck.pallas_exec import TILE, _fold_eval_fixed

    cfg, ctx = _cfg_ctx()
    pr = random.Random(11)
    degree, idx_terms, kinds = 3, ((0, 3), (1, 3), (2, 3)), ("u", "n", "u")
    _, tabs = _rand_tables(cfg, 4, 4 * TILE, 12)
    coeffs = jnp.asarray(fps_to_limbs([cfg.one(), -cfg.one(), cfg.one()], cfg))
    r = jnp.asarray(fps_to_limbs([cfg.fp(pr.randrange(cfg.q))], cfg)[0])

    ref_folded, _ = _round_body(ctx, tabs, (r, coeffs), False, degree, idx_terms)
    _, ref_wide = _round_body(ctx, ref_folded, (r, coeffs), True, degree, idx_terms)
    buf, wide = _fold_eval_fixed(
        ctx, tabs + jnp.uint32(0), r, coeffs, degree, idx_terms, kinds, 1
    )
    half = tabs.shape[1] // 2
    assert np.array_equal(np.asarray(buf[:, :half]), np.asarray(ref_folded))
    for p in range(degree + 1):
        assert (
            limbs_to_int(np.asarray(wide)[p]) % cfg.q
            == limbs_to_int(np.asarray(ref_wide)[p]) % cfg.q
        )


@requires_tpu
def test_mxu_fold_matches_vpu_fold():
    import jax.numpy as jnp

    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.sumcheck.device import _round_body
    from zinc_tpu.sumcheck.mxu_exec import TILE as MT, _fold_lm, _from_lm, _to_lm

    cfg, ctx = _cfg_ctx()
    pr = random.Random(13)
    b = 8 * MT
    _, tabs = _rand_tables(cfg, 4, b, 14)
    r = jnp.asarray(fps_to_limbs([cfg.fp(pr.randrange(cfg.q))], cfg)[0])
    coeffs = jnp.asarray(fps_to_limbs([cfg.one()], cfg))
    ref_folded, _ = _round_body(ctx, tabs, (r, coeffs), False, 1, ((0,),))

    buf_lm = _to_lm(tabs, b)
    buf_lm = _fold_lm(ctx, buf_lm, r, b // (4 * MT))
    got = _from_lm(buf_lm, b // 2)
    assert np.array_equal(np.asarray(got), np.asarray(ref_folded))


@requires_tpu
def test_mxu_eval_g_decode_matches_host_round_evals():
    from zinc_tpu.sumcheck.mxu_exec import (
        TILE as MT,
        _eval_lm,
        _to_lm,
        g_to_evals_host,
        term_meta,
    )
    from zinc_tpu.sumcheck.prover import _round_evals

    cfg, ctx = _cfg_ctx()
    b = 4 * MT
    mles, tabs = _rand_tables(cfg, 4, b, 15)
    comb = [(cfg.one(), (0, 1, 3)), (-cfg.one(), (2, 3))]
    terms = term_meta(tuple(t for _, t in comb))
    gs = _eval_lm(ctx, _to_lm(tabs, b), terms, b // (2 * MT))
    got = g_to_evals_host(cfg, gs, comb, terms, 3)
    want = _round_evals(mles, 3, comb, cfg)
    assert got == want


@requires_tpu
def test_mxu_g_decode_device_matches_host():
    import jax.numpy as jnp

    from zinc_tpu.poly.device import fps_to_limbs, limbs_to_fp
    from zinc_tpu.sumcheck.mxu_exec import (
        TILE as MT,
        _eval_lm,
        _to_lm,
        g_to_evals_device,
        g_to_evals_host,
        term_meta,
    )

    cfg, ctx = _cfg_ctx()
    b = 4 * MT
    _, tabs = _rand_tables(cfg, 4, b, 16)
    comb = [(cfg.one(), (0, 1, 3)), (-cfg.one(), (2, 3))]
    terms = term_meta(tuple(t for _, t in comb))
    gs = _eval_lm(ctx, _to_lm(tabs, b), terms, b // (2 * MT))
    host = g_to_evals_host(cfg, gs, comb, terms, 3)
    coeff_limbs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
    dev = np.asarray(jax.jit(g_to_evals_device, static_argnums=(0, 3, 4))(
        ctx, tuple(gs), coeff_limbs, terms, 3
    ))
    got = [limbs_to_fp(dev[t], cfg) for t in range(4)]
    assert got == host


@requires_tpu
def test_mxu_executor_sumcheck_identical_to_host():
    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sumcheck.device import prove_as_subprotocol_device
    from zinc_tpu.sumcheck.mxu_exec import MxuSumcheckExecutor
    from zinc_tpu.sumcheck.prover import prove_as_subprotocol
    from zinc_tpu.transcript import KeccakTranscript

    cfg, _ = _cfg_ctx()
    nv = 13
    mles, tabs = _rand_tables(cfg, 4, 1 << nv, 0)
    comb = [(cfg.one(), (0, 1, 3)), (-cfg.one(), (2, 3))]
    ph, _ = prove_as_subprotocol(
        KeccakTranscript(), [DenseMleF(nv, list(m), cfg) for m in mles],
        nv, 3, comb, cfg,
    )
    ex = MxuSumcheckExecutor(cfg, tabs, 3, comb)
    pd, _ = prove_as_subprotocol_device(KeccakTranscript(), ex, nv, 3, cfg)
    assert ph == pd


@requires_tpu
def test_mxu_executor_degree2_identical_to_host():
    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sumcheck.device import prove_as_subprotocol_device
    from zinc_tpu.sumcheck.mxu_exec import MxuSumcheckExecutor
    from zinc_tpu.sumcheck.prover import prove_as_subprotocol
    from zinc_tpu.transcript import KeccakTranscript

    cfg, _ = _cfg_ctx()
    nv = 11
    mles, tabs = _rand_tables(cfg, 2, 1 << nv, 4)
    comb = [(cfg.one(), (0, 1))]
    ph, _ = prove_as_subprotocol(
        KeccakTranscript(), [DenseMleF(nv, list(m), cfg) for m in mles],
        nv, 2, comb, cfg,
    )
    ex = MxuSumcheckExecutor(cfg, tabs, 2, comb)
    pd, _ = prove_as_subprotocol_device(KeccakTranscript(), ex, nv, 2, cfg)
    assert ph == pd


@requires_tpu
def test_device_fs_mxu_transcript_identical_to_host():
    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs
    from zinc_tpu.sumcheck.prover import prove_as_subprotocol
    from zinc_tpu.transcript import KeccakTranscript

    cfg, _ = _cfg_ctx()
    nv = 13
    mles, tabs = _rand_tables(cfg, 4, 1 << nv, 5)
    comb = [(cfg.one(), (0, 1, 3)), (-cfg.one(), (2, 3))]
    t1 = KeccakTranscript(); t1.absorb(b"fs")
    ph, _ = prove_as_subprotocol(
        t1, [DenseMleF(nv, list(m), cfg) for m in mles], nv, 3, comb, cfg,
    )
    t2 = KeccakTranscript(); t2.absorb(b"fs")
    pd, _, _ = prove_as_subprotocol_device_fs(t2, cfg, tabs, nv, 3, comb)
    assert ph == pd
    assert t1.get_challenge(cfg) == t2.get_challenge(cfg)


@requires_tpu
def test_pallas_executor_sumcheck_identical_to_host():
    from zinc_tpu.poly.mle import DenseMleF
    from zinc_tpu.sumcheck.device import prove_as_subprotocol_device
    from zinc_tpu.sumcheck.pallas_exec import PallasSumcheckExecutor
    from zinc_tpu.sumcheck.prover import prove_as_subprotocol
    from zinc_tpu.transcript import KeccakTranscript

    cfg, _ = _cfg_ctx()
    nv = 11
    mles, tabs = _rand_tables(cfg, 4, 1 << nv, 6)
    comb = [(cfg.one(), (0, 3)), (-cfg.one(), (1, 3)), (cfg.one(), (2, 3))]
    ph, _ = prove_as_subprotocol(
        KeccakTranscript(), [DenseMleF(nv, list(m), cfg) for m in mles],
        nv, 3, comb, cfg,
    )
    ex = PallasSumcheckExecutor(cfg, tabs, 3, comb)
    pd, _ = prove_as_subprotocol_device(KeccakTranscript(), ex, nv, 3, cfg)
    assert ph == pd


@requires_tpu
def test_blake3_merkle_on_chip_matches_host():
    import jax.numpy as jnp

    from zinc_tpu.fields.limbs import ints_to_limbs
    from zinc_tpu.ops.blake3_kernel import merkle_tree_device
    from zinc_tpu.zip.merkle import MerkleTree, int_to_leaf_bytes

    pr = random.Random(17)
    vals = [pr.randrange(-(1 << 120), 1 << 120) for _ in range(64)]
    enc = jnp.asarray(ints_to_limbs(vals, 8)).reshape(1, 64, 8)
    layers = merkle_tree_device(enc, 2)
    root = np.asarray(layers[-1][0, 0]).astype("<u4").tobytes()
    tree = MerkleTree.from_leaves(6, [int_to_leaf_bytes(v, 2) for v in vals])
    assert root == tree.root


@requires_tpu
def test_gruen_eval_pallas_matches_twin():
    """Pallas Gruen evaluation == XLA twin, bit-identical G byte planes."""
    import jax.numpy as jnp

    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.sumcheck.mxu_exec import (
        TILE as MT,
        _eval_lm_gruen,
        _to_lm,
        build_eq_suffix_flat,
        eval_lm_gruen_ref,
        gruen_term_meta,
    )

    cfg, ctx = _cfg_ctx()
    nv = 12
    _, tabs = _rand_tables(cfg, 3, 1 << nv, 21)
    pr = random.Random(22)
    beta = [cfg.fp(pr.randrange(cfg.q)) for _ in range(nv)]
    e_flat = build_eq_suffix_flat(ctx, jnp.asarray(fps_to_limbs(beta, cfg)), nv)
    terms = gruen_term_meta(((0, 1, 3), (2, 3)), 3)
    buf = _to_lm(tabs, 1 << nv)
    nbh = (1 << nv) // (2 * MT)
    for e_off in (0, nbh):
        gp = _eval_lm_gruen(
            ctx, buf, e_flat, terms,
            jnp.asarray(nbh, jnp.int32), jnp.asarray(e_off, jnp.int32),
        )
        gt = eval_lm_gruen_ref(ctx, buf, e_flat, terms, nbh, e_off)
        for a, b in zip(gp, gt):
            assert np.array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
def test_device_fs_gruen_on_chip_byte_identity():
    """Full Gruen FS sumcheck on the chip == host prover bytes."""
    import jax.numpy as jnp

    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r
    from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs
    from zinc_tpu.sumcheck.prover import prove_as_subprotocol
    from zinc_tpu.transcript import KeccakTranscript

    cfg, _ = _cfg_ctx()
    nv = 12
    mles, tabs = _rand_tables(cfg, 3, 1 << nv, 23)
    pr = random.Random(24)
    beta = [cfg.fp(pr.randrange(cfg.q)) for _ in range(nv)]
    eq_tab = build_eq_x_r(beta, cfg).evaluations
    comb = [(cfg.one(), (0, 1, 3)), (-cfg.one(), (2, 3))]

    th = KeccakTranscript()
    ph, sh = prove_as_subprotocol(
        th,
        [DenseMleF(nv, list(m), cfg) for m in mles]
        + [DenseMleF(nv, list(eq_tab), cfg)],
        nv, 3, comb, cfg,
    )
    td = KeccakTranscript()
    pd, rd, md = prove_as_subprotocol_device_fs(
        td, cfg, tabs, nv, 3, comb, eq_beta=beta
    )
    assert pd == ph
    assert rd == sh.randomness
    assert [m[0] for m in md] == [m.evaluations[0] for m in sh.mles]
    assert th.h.digest() == td.h.digest()


@requires_tpu
def test_eval_pallas_four_factor_and_384bit_match_twins():
    """Widened MXU scope on-chip: 4-factor terms (ne = 4 lazy e-side) and a
    384-bit field must produce bit-identical G planes to the XLA twins."""
    import jax.numpy as jnp

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.montgomery import device_field
    from zinc_tpu.sumcheck.mxu_exec import (
        TILE as MT,
        _eval_lm,
        _fold_lm,
        _to_lm,
        eval_lm_ref,
        fold_lm_ref,
        term_meta,
    )

    # 4-factor terms, 256-bit field
    cfg, ctx = _cfg_ctx()
    _, tabs = _rand_tables(cfg, 4, 1 << 11, 31)
    terms = term_meta(((0, 1, 2, 3), (1, 2, 3)), cfg.n16)
    buf = _to_lm(tabs, 1 << 11)
    nbh = (1 << 11) // (2 * MT)
    gp = _eval_lm(ctx, buf, terms, nbh)
    gt = eval_lm_ref(ctx, buf, terms, nbh)
    for a, b in zip(gp, gt):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # 384-bit field (l16 = 24): fold + eval
    cfg6 = FieldConfig((1 << 383) + 369, 6)
    ctx6 = device_field(cfg6)
    _, tabs6 = _rand_tables(cfg6, 3, 1 << 11, 32)
    terms6 = term_meta(((0, 2), (1, 2)), cfg6.n16)
    buf6 = _to_lm(tabs6, 1 << 11)
    from zinc_tpu.poly.device import fps_to_limbs

    r = jnp.asarray(
        fps_to_limbs([cfg6.fp(random.Random(33).randrange(cfg6.q))], cfg6)[0]
    )
    fp_ = _fold_lm(ctx6, buf6 + jnp.uint32(0), r, (1 << 11) // (4 * MT))
    ft = fold_lm_ref(ctx6, buf6 + jnp.uint32(0), r, (1 << 11) // (4 * MT))
    assert np.array_equal(np.asarray(fp_), np.asarray(ft))
    gp6 = _eval_lm(ctx6, buf6, terms6, (1 << 11) // (2 * MT))
    gt6 = eval_lm_ref(ctx6, buf6, terms6, (1 << 11) // (2 * MT))
    for a, b in zip(gp6, gt6):
        assert np.array_equal(np.asarray(a), np.asarray(b))
