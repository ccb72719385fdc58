"""Sharded (8-virtual-device mesh) prover must be bit-identical to unsharded.

The reference has no multi-device analog; these are the shard-invariance
tests SURVEY.md §4 calls for: transcripts, roots, and full proofs must not
depend on the mesh layout.
"""

import random

import jax
import pytest

from zinc_tpu.ccs import dummy_ccs_of_size
from zinc_tpu.parallel import local_mesh
from zinc_tpu.prime import draw_random_field
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver, ZincVerifier
from zinc_tpu.zip.code import ZipTypes

ZT = ZipTypes(1)
FIELD_LIMBS = 4


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return local_mesh(8)


def _prove(backend_mesh, statement, wit, ccs):
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, ZT.n_words, FIELD_LIMBS)
    prover = ZincProver(ZT, backend="device", mesh=backend_mesh)
    return cfg, prover.prove(statement, wit, t, ccs, cfg)


def test_sharded_prove_bit_identical_and_verifies(mesh):
    rng = random.Random(33)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 6, rng, int_bits=62)

    cfg_u, proof_u = _prove(None, statement, wit, ccs)
    cfg_s, proof_s = _prove(mesh, statement, wit, ccs)
    assert cfg_u == cfg_s

    assert proof_s.spartan_proof.linearization_sumcheck == proof_u.spartan_proof.linearization_sumcheck
    assert proof_s.spartan_proof.second_sumcheck == proof_u.spartan_proof.second_sumcheck
    assert proof_s.spartan_proof.V_s == proof_u.spartan_proof.V_s
    assert proof_s.zip_proof.v == proof_u.zip_proof.v
    assert proof_s.zip_proof.z_comm.roots == proof_u.zip_proof.z_comm.roots
    assert proof_s.zip_proof.pcs_proof == proof_u.zip_proof.pcs_proof

    ZincVerifier(ZT).verify(statement, proof_s, KeccakTranscript(), ccs, cfg_s)


def test_sharded_sumcheck_matches_host(mesh):
    """Sharded executor alone vs the host sumcheck prover on a random comb."""
    from zinc_tpu.parallel.sumcheck import ShardedSumcheckExecutor
    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.sumcheck.device import DeviceSumcheckExecutor

    import jax.numpy as jnp

    rng = random.Random(7)
    t = KeccakTranscript()
    t.absorb(b"seed")
    cfg = draw_random_field([123], KeccakTranscript(), ZT.n_words, FIELD_LIMBS)

    nv, n_mles = 6, 3
    tables_f = [
        [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, cfg)) for tf in tables_f])
    comb = [(cfg.one(), (0, 1, 2)), (cfg.fp(5), (1, 2))]

    exs = ShardedSumcheckExecutor(cfg, stacked, 3, comb, mesh)
    exd = DeviceSumcheckExecutor(cfg, stacked, 3, comb)

    r_prev_s = r_prev_d = None
    for rnd in range(nv):
        es = exs.round(r_prev_s)
        ed = exd.round(r_prev_d)
        assert es == ed, f"round {rnd} diverged"
        # drive both with the same (arbitrary but valid) challenge
        r = cfg.fp(rng.randrange(cfg.q))
        r_prev_s = r_prev_d = r
    exs.final_fold(r_prev_s)
    exd.final_fold(r_prev_d)
    assert exs.final_values() == exd.final_values()


def test_commit_2d_mesh_bit_identical(mesh):
    """2-D (rows × row-interior) mesh commit: same enc/layers/roots as 1-chip."""
    import numpy as np

    from zinc_tpu.parallel import local_mesh_2d
    from zinc_tpu.parallel.zip import commit_device_sharded_2d
    from zinc_tpu.transcript import KeccakTranscript as KT
    from zinc_tpu.zip.code import DefaultLinearCodeSpec, RaaCode
    from zinc_tpu.zip.device import commit_device
    from zinc_tpu.zip.pcs import setup

    rng = random.Random(5)
    log_n = 8
    n = 1 << log_n
    cfg_q = draw_random_field([1, 2, 3], KT(), ZT.n_words, FIELD_LIMBS)
    z_vals = [rng.randrange(-(1 << 62), 1 << 62) for _ in range(n)]

    t = KT()
    t.absorb(b"mesh2d")
    code = RaaCode(DefaultLinearCodeSpec(), n, t, ZT)
    pp = setup(n, code, ZT)

    data_ref, comm_ref = commit_device(pp, z_vals, cfg_q)
    mesh2d = local_mesh_2d(2, 4)
    data_2d, comm_2d = commit_device_sharded_2d(pp, z_vals, cfg_q, mesh2d)

    assert comm_2d.roots == comm_ref.roots
    assert np.array_equal(data_2d.enc_limbs, data_ref.enc_limbs)
    assert len(data_2d.layers) == len(data_ref.layers)
    for a, b in zip(data_2d.layers, data_ref.layers):
        assert np.array_equal(a, b)


def test_2d_mesh_full_prove_bit_identical_and_verifies(mesh):
    """The COMPLETE prove on the ("r","c") production layout — sumcheck
    sharded over both axes, 2-D distributed commit, sharded open — must be
    byte-identical to the unsharded device prover (SURVEY §7 stage 9)."""
    from zinc_tpu.parallel import local_mesh_2d
    from zinc_tpu.serialize import serialize_proof

    rng = random.Random(44)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 6, rng, int_bits=62)
    cfg_ref, proof_ref = _prove(None, statement, wit, ccs)
    mesh2d = local_mesh_2d(2, 4)
    cfg_2d, proof_2d = _prove(mesh2d, statement, wit, ccs)
    assert cfg_ref.q == cfg_2d.q
    assert serialize_proof(proof_2d, cfg_2d) == serialize_proof(proof_ref, cfg_ref)
    ZincVerifier(ZT).verify(statement, proof_2d, KeccakTranscript(), ccs, cfg_2d)


def test_sharded_lm_executor_matches_xla_sharded(mesh):
    """The limb-major MXU-tier sharded executor (psum'd G byte planes, local
    bit-reversed blocks, fused v3 fold) must produce the same transcripts as
    the XLA-body sharded executor — which is itself pinned against the host
    oracle above.  On CPU this runs the XLA twins of the Pallas kernels:
    the exact code path shard_mapped on a real TPU mesh."""
    from zinc_tpu.parallel.sumcheck import (
        ShardedLmSumcheckExecutor,
        ShardedSumcheckExecutor,
        make_sharded_executor,
    )
    from zinc_tpu.poly.device import fps_to_limbs

    import jax.numpy as jnp

    rng = random.Random(8)
    cfg = draw_random_field([123], KeccakTranscript(), ZT.n_words, FIELD_LIMBS)

    # 1024 entries/device: the LM tier engages.  A 4-device mesh at nv=12
    # hits the same gating bound at half the XLA:CPU compile cost (suite
    # budget); the shard_map code is device-count-agnostic and the 8-device
    # layout is covered by the full-prove mesh tests.
    mesh = local_mesh(4)
    nv, n_mles = 12, 4
    tables_f = [
        [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, cfg)) for tf in tables_f])
    comb = [(cfg.one(), (0, 3)), (cfg.one(), (1, 3)), (cfg.one(), (2, 3))]

    exs = make_sharded_executor(cfg, stacked, 3, comb, mesh)
    assert isinstance(exs, ShardedLmSumcheckExecutor)
    exd = ShardedSumcheckExecutor(cfg, stacked, 3, comb, mesh)

    # the LM tier drives the first rounds; the small-shape tail demotes to
    # the same code in both executors (covered end-to-end by the full-prove
    # mesh tests) — each extra round is a fresh XLA:CPU compile in BOTH
    # executors, so stop after the LM rounds + the fold into the tail
    r_prev = None
    for rnd in range(4):
        es = exs.round(r_prev)
        ed = exd.round(r_prev)
        assert es == ed, f"round {rnd} diverged"
        r_prev = cfg.fp(rng.randrange(cfg.q))


def test_hierarchical_mesh_full_prove_bit_identical(mesh):
    """DCN-shaped ("host","chip") hierarchical mesh (parallel/mesh.py):
    the full prove with the "host" axis standing in for the multi-process
    DCN boundary must stay byte-identical (VERDICT r2 item 7)."""
    from zinc_tpu.parallel import hierarchical_mesh, init_distributed
    from zinc_tpu.serialize import serialize_proof

    assert init_distributed() is False  # single-process run: local fallback
    rng = random.Random(55)
    _, ccs, statement, wit = dummy_ccs_of_size(1 << 6, rng, int_bits=62)
    cfg_ref, proof_ref = _prove(None, statement, wit, ccs)
    mesh_dcn = hierarchical_mesh(2, 4)
    assert mesh_dcn.axis_names == ("host", "chip")
    cfg_d, proof_d = _prove(mesh_dcn, statement, wit, ccs)
    assert cfg_ref.q == cfg_d.q
    assert serialize_proof(proof_d, cfg_d) == serialize_proof(proof_ref, cfg_ref)
    ZincVerifier(ZT).verify(statement, proof_d, KeccakTranscript(), ccs, cfg_d)


def test_sharded_lm_executor_degree4(mesh):
    """Widened MXU scope on the sharded LM executor (XLA twins on the CPU
    mesh): a 4-factor term must match the XLA-body sharded executor."""
    import jax.numpy as jnp

    from zinc_tpu.parallel.sumcheck import (
        ShardedLmSumcheckExecutor,
        ShardedSumcheckExecutor,
        make_sharded_executor,
    )
    from zinc_tpu.poly.device import fps_to_limbs

    rng = random.Random(66)
    cfg = draw_random_field([1], KeccakTranscript(), ZT.n_words, FIELD_LIMBS)
    mesh = local_mesh(4)  # same LM gating at half the compile (see above)
    nv, n_mles = 12, 4
    tables_f = [
        [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, cfg)) for tf in tables_f])
    comb = [(cfg.fp(7), (0, 1, 2, 3)), (-cfg.one(), (1, 3))]

    exs = make_sharded_executor(cfg, stacked, 4, comb, mesh)
    assert isinstance(exs, ShardedLmSumcheckExecutor)
    exd = ShardedSumcheckExecutor(cfg, stacked, 4, comb, mesh)

    r_prev = None
    for rnd in range(4):  # the LM-tier rounds; the tail demotes identically
        es = exs.round(r_prev)
        ed = exd.round(r_prev)
        assert es == ed, f"round {rnd} diverged"
        r_prev = cfg.fp(rng.randrange(cfg.q))


def test_sharded_gruen_executor_matches_classic(mesh):
    """The Gruen sharded executor (eq factored out of the fold on every
    device, per-device-scaled local suffix buffers, psum'd G planes) must
    produce the same round evals / finals as the classic sharded executor
    fed the explicit eq table."""
    import jax.numpy as jnp

    from zinc_tpu.parallel.sumcheck import (
        ShardedGruenSumcheckExecutor,
        ShardedSumcheckExecutor,
        make_sharded_executor,
        wants_gruen_sharded,
    )
    from zinc_tpu.poly.device import fps_to_limbs
    from zinc_tpu.poly.mle import build_eq_x_r

    rng = random.Random(77)
    cfg = draw_random_field([1], KeccakTranscript(), ZT.n_words, FIELD_LIMBS)
    mesh = local_mesh(4)  # 4 devices × 4·TILE = 2^12: the gating minimum
    nv, n_tabs = 12, 3  # (same bound, half the XLA:CPU compile — suite cost)
    tables_f = [
        [cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << nv)] for _ in range(n_tabs)
    ]
    beta = [cfg.fp(rng.randrange(cfg.q)) for _ in range(nv)]
    eq_tab = build_eq_x_r(beta, cfg).evaluations
    comb = [(cfg.fp(7), (0, 1, 3)), (-cfg.one(), (2, 3))]
    assert wants_gruen_sharded(cfg, comb, 3, 1 << nv, mesh)

    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, cfg)) for t in tables_f])
    exg = make_sharded_executor(cfg, stacked, 3, comb, mesh, eq_beta=beta)
    assert isinstance(exg, ShardedGruenSumcheckExecutor)
    full = jnp.concatenate(
        [stacked, jnp.asarray(fps_to_limbs(eq_tab, cfg))[None]], axis=0
    )
    exc = ShardedSumcheckExecutor(cfg, full, 3, comb, mesh)

    r_prev = None
    for rnd in range(nv):
        eg = exg.round(r_prev)
        ec = exc.round(r_prev)
        assert eg == ec, f"round {rnd} diverged"
        r_prev = cfg.fp(rng.randrange(cfg.q))
    exg.final_fold(r_prev)
    exc.final_fold(r_prev)
    assert exg.final_values() == exc.final_values()


def _mesh_prove_2p14_body():
    """At 2^14 the production mesh prove routes sumcheck-1 through the
    sharded Gruen executor (b_local = 2^11 ≥ 4·TILE) — the full proof must
    be byte-identical to the HOST ORACLE, pinned via the in-tree 2^14
    golden sha256 (tests/golden/proof_2p14.sha256, same statement/seed).
    Comparing against the digest instead of re-proving unsharded in-test
    halves the subprocess cost (suite budget) and is the stronger assert:
    mesh → host oracle directly, not mesh → device."""
    import hashlib
    from pathlib import Path

    from tests.golden.gen import N14, SEED14
    from zinc_tpu.parallel import local_mesh
    from zinc_tpu.parallel.sumcheck import wants_gruen_sharded
    from zinc_tpu.serialize import serialize_proof

    mesh = local_mesh(8)
    rng = random.Random(SEED14)
    _, ccs, statement, wit = dummy_ccs_of_size(N14, rng, int_bits=62)
    cfg_probe = draw_random_field(
        statement.public_input, KeccakTranscript(), ZT.n_words, FIELD_LIMBS
    )
    comb_shape = [(cfg_probe.one(), tuple(s) + (len(ccs.S),)) for s in ccs.S]
    assert wants_gruen_sharded(cfg_probe, comb_shape, len(ccs.S), ccs.m, mesh)

    cfg_s, proof_s = _prove(mesh, statement, wit, ccs)
    blob = serialize_proof(proof_s, cfg_s)
    want_digest, want_len = (
        (Path(__file__).parent / "golden" / "proof_2p14.sha256")
        .read_text()
        .split()
    )
    assert len(blob) == int(want_len)
    assert hashlib.sha256(blob).hexdigest() == want_digest
    print("2p14 mesh prove matches the pinned host-oracle digest: OK")


def test_mesh_full_prove_2p14_gruen_sharded_bit_identical():
    """Runs `_mesh_prove_2p14_body` in a FRESH subprocess (always on the
    8-virtual-device CPU mesh).

    This is the largest XLA:CPU compile in the suite; executing it after
    ~180 earlier tests' compiles segfaults inside LLVM JIT finalization
    (cumulative JIT state — the conftest per-module cache clears bound the
    resident executables but don't reset LLVM itself).  Process isolation
    makes the scale test deterministic in full-suite order; the assertions
    are unchanged."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # never dial the tunnel from the child
    env.pop("ZINC_TPU_TEST_TPU", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "from tests.test_parallel import _mesh_prove_2p14_body; "
         "_mesh_prove_2p14_body()" % root],
        cwd=root, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, (
        f"2^14 mesh prove subprocess failed (rc={r.returncode})\n"
        f"stdout tail: {r.stdout[-2000:]}\nstderr tail: {r.stderr[-2000:]}"
    )
