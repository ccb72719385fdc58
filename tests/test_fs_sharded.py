"""The one-sync sharded FS sumcheck must be bit-identical to the host.

Runs the XLA-twin variant under shard_map on the virtual CPU mesh (the
Pallas variant shares every line except the round primitives, which the
TPU-gated and sharded-executor tests cover).  Pins: proofs, challenges,
final values, and the exact post-sumcheck transcript state — for the
classic kernel, the Gruen eq-factorized kernel, and a 2-D mesh.
"""

import random

import jax.numpy as jnp
import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.parallel import local_mesh, local_mesh_2d
from zinc_tpu.parallel.fs import (
    prove_as_subprotocol_device_fs_sharded,
    wants_fs_sharded,
)
from zinc_tpu.poly.device import fps_to_limbs
from zinc_tpu.sumcheck.prover import prove_as_subprotocol
from zinc_tpu.transcript import KeccakTranscript

CFG = FieldConfig((1 << 255) + 95, 4)


def _tables(nv, n_mles, seed):
    rng = random.Random(seed)
    tables_f = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(n_mles)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(tf, CFG)) for tf in tables_f])
    return tables_f, stacked


def _host(nv, tables_f, degree, comb):
    from zinc_tpu.poly.mle import DenseMleF

    th = KeccakTranscript()
    th.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_h, state_h = prove_as_subprotocol(
        th, [DenseMleF(nv, list(t), CFG) for t in tables_f], nv, degree, comb, CFG
    )
    return th, proof_h, state_h


def _check(td, th, proof_d, proof_h, rs_d, state_h, mles_d):
    assert proof_d == proof_h
    assert rs_d == state_h.randomness
    assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
    assert th.h.digest() == td.h.digest()
    assert th.get_challenge(CFG) == td.get_challenge(CFG)


def test_fs_sharded_classic_transcript_identical():
    nv = 11
    mesh = local_mesh(2)
    tables_f, stacked = _tables(nv, 3, 7)
    comb = [(CFG.one(), (0, 1)), (-CFG.one(), (2,)), (CFG.fp(9), (0, 2))]
    # the 1-factor term (2,) is outside the MXU tier — drop it for gating
    comb = [comb[0], comb[2]]
    assert wants_fs_sharded(CFG, comb, 1 << nv, mesh)

    th, proof_h, state_h = _host(nv, tables_f, 2, comb)
    td = KeccakTranscript()
    td.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs_sharded(
        td, CFG, stacked, nv, 2, comb, mesh
    )
    _check(td, th, proof_d, proof_h, rs_d, state_h, mles_d)


def test_fs_sharded_gruen_transcript_identical():
    """Gruen sharded FS: tables EXCLUDE eq; every term carries eq last."""
    from zinc_tpu.poly.mle import build_eq_x_r

    nv = 11
    mesh = local_mesh(2)
    tables_f, stacked = _tables(nv, 3, 8)
    rng = random.Random(9)
    beta = [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]
    eq_tab = list(build_eq_x_r(beta, CFG).evaluations)
    comb = [(CFG.one(), (0, 1, 3)), (CFG.fp(5), (2, 3))]
    assert wants_fs_sharded(CFG, comb, 1 << nv, mesh, eq_idx=3)

    th, proof_h, state_h = _host(nv, tables_f + [eq_tab], 3, comb)
    td = KeccakTranscript()
    td.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs_sharded(
        td, CFG, stacked, nv, 3, comb, mesh, eq_beta=beta
    )
    _check(td, th, proof_d, proof_h, rs_d, state_h, mles_d)


def test_fs_sharded_export_cache_roundtrip(tmp_path, monkeypatch, capsys):
    """The sharded FS program routes through the jax.export disk cache with
    mesh-topology-keyed sharded avals (VERDICT r3 item 4): the first call
    writes the artifact, the second call DESERIALIZES it (what every later
    process on the same topology runs) and stays byte-identical; a poisoned
    artifact falls back to the plain jitted program."""
    monkeypatch.setenv("ZINC_TPU_EXPORT_CACHE", "1")
    monkeypatch.setenv("ZINC_TPU_EXPORT_CACHE_DIR", str(tmp_path))

    nv = 11
    mesh = local_mesh(2)
    tables_f, stacked = _tables(nv, 3, 7)
    comb = [(CFG.one(), (0, 1)), (CFG.fp(9), (0, 2))]
    assert wants_fs_sharded(CFG, comb, 1 << nv, mesh)
    th, proof_h, state_h = _host(nv, tables_f, 2, comb)
    # snapshot the post-prove host state ONCE: get_challenge ratchets the
    # sponge, so the usual _check helper can't be reused across drives
    digest_h = th.h.digest()
    chal_h = th.get_challenge(CFG)

    def check(td, proof_d, rs_d, mles_d):
        assert proof_d == proof_h
        assert rs_d == state_h.randomness
        assert [m[0] for m in mles_d] == [m.evaluations[0] for m in state_h.mles]
        assert td.h.digest() == digest_h
        assert td.get_challenge(CFG) == chal_h

    def drive():
        td = KeccakTranscript()
        td.absorb(b"prefix-bytes-to-offset-the-sponge")
        out = prove_as_subprotocol_device_fs_sharded(
            td, CFG, stacked, nv, 2, comb, mesh
        )
        return td, out

    # write pass
    td1, (proof_1, rs_1, mles_1) = drive()
    arts = list(tmp_path.glob("fs-sharded-classic-*.jaxexport"))
    assert len(arts) == 1 and arts[0].stat().st_size > 0
    check(td1, proof_1, rs_1, mles_1)

    # deserialize pass (the cold-process path; drop the in-process memo)
    from zinc_tpu.utils.export_cache import _EXP_MEMO

    _EXP_MEMO.clear()
    td2, (proof_2, rs_2, mles_2) = drive()
    check(td2, proof_2, rs_2, mles_2)
    capsys.readouterr()  # discard

    # a poisoned artifact must fall back, not break the prover
    arts[0].write_bytes(b"\x00garbage")
    _EXP_MEMO.clear()
    td3, (proof_3, rs_3, mles_3) = drive()
    check(td3, proof_3, rs_3, mles_3)
    assert "export cache bypass" in capsys.readouterr().err


def test_fs_sharded_2d_mesh():
    """Same kernel over a 2-D ("r","c") mesh: psum closes over both axes."""
    nv = 12
    mesh = local_mesh_2d(2, 2)
    tables_f, stacked = _tables(nv, 2, 10)
    comb = [(CFG.one(), (0, 1))]
    assert wants_fs_sharded(CFG, comb, 1 << nv, mesh)

    th, proof_h, state_h = _host(nv, tables_f, 2, comb)
    td = KeccakTranscript()
    td.absorb(b"prefix-bytes-to-offset-the-sponge")
    proof_d, rs_d, mles_d = prove_as_subprotocol_device_fs_sharded(
        td, CFG, stacked, nv, 2, comb, mesh
    )
    _check(td, th, proof_d, proof_h, rs_d, state_h, mles_d)
