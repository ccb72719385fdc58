"""jax.export disk cache for the FS kernels (utils/export_cache.py).

Pins that (a) a cache-routed FS sumcheck stays byte-identical to the host
prover, (b) the artifact lands on disk and a SECOND call loads it (the
deserialize path — what a cold process runs), and (c) a poisoned cache file
falls back to the plain jitted call instead of breaking the prover.
"""

import os
import random

import jax.numpy as jnp
import pytest

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.device import fps_to_limbs
from zinc_tpu.poly.mle import DenseMleF
from zinc_tpu.sumcheck.prover import prove_as_subprotocol
from zinc_tpu.transcript import KeccakTranscript

CFG = FieldConfig((1 << 255) + 95, 4)


@pytest.fixture()
def export_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("ZINC_TPU_EXPORT_CACHE", "1")
    monkeypatch.setenv("ZINC_TPU_EXPORT_CACHE_DIR", str(tmp_path))
    return tmp_path


def _simulate_fresh_process():
    """Drop the in-process memo of deserialized artifacts so the next
    cached_call exercises the disk path exactly like a cold process."""
    from zinc_tpu.utils.export_cache import _EXP_MEMO

    _EXP_MEMO.clear()


def _fs_prove(nv, tables_f, stacked, comb):
    from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs

    td = KeccakTranscript()
    return prove_as_subprotocol_device_fs(td, CFG, stacked, nv, 2, comb), td


def test_export_cache_roundtrip_byte_identity(export_cache):
    rng = random.Random(11)
    nv = 10
    tables_f = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(2)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tables_f])
    comb = [(CFG.one(), (0, 1))]

    th = KeccakTranscript()
    proof_h, state_h = prove_as_subprotocol(
        th, [DenseMleF(nv, list(t), CFG) for t in tables_f], nv, 2, comb, CFG
    )

    # first call: exports + writes the artifact
    (proof_1, rs_1, _), td1 = _fs_prove(nv, tables_f, stacked, comb)
    arts = list(export_cache.glob("fs-classic-*.jaxexport"))
    assert len(arts) == 1 and arts[0].stat().st_size > 0
    assert proof_1 == proof_h and rs_1 == state_h.randomness
    assert td1.h.digest() == th.h.digest()

    # second call: must LOAD the artifact (mutating it to garbage afterwards
    # proves the load path is really exercised, see the next test) and stay
    # byte-identical
    _simulate_fresh_process()
    (proof_2, rs_2, _), td2 = _fs_prove(nv, tables_f, stacked, comb)
    assert proof_2 == proof_h and rs_2 == state_h.randomness
    assert td2.h.digest() == th.h.digest()


def test_export_cache_nested_pytree_args(export_cache):
    """The Spartan setup programs pass a tuple-of-tuples of CSR arrays as
    one dynamic arg (spartan_dev.py sc1/sc2 routing, r4): the cache must
    key and replay nested pytrees correctly."""
    import jax.numpy as jnp
    import numpy as np

    from zinc_tpu.utils.export_cache import cached_call

    def make(mats, z):
        (a, b), (c, d) = mats
        return a * b + c * d + z

    mats = ((jnp.arange(4.0), jnp.ones(4)), (jnp.arange(4.0) * 2, jnp.ones(4)))
    z = jnp.full(4, 7.0)
    out1 = np.asarray(cached_call("nested-demo", ("k",), make, mats, z))
    arts = list(export_cache.glob("nested-demo-*.jaxexport"))
    assert len(arts) == 1
    out2 = np.asarray(cached_call("nested-demo", ("k",), make, mats, z))
    assert np.array_equal(out1, out2)
    assert np.array_equal(out1, np.asarray(make(mats, z)))


def test_export_cache_corrupt_artifact_falls_back(export_cache, capsys):
    rng = random.Random(12)
    nv = 10
    tables_f = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(2)
    ]
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tables_f])
    comb = [(CFG.one(), (0, 1))]

    (proof_1, _, _), _ = _fs_prove(nv, tables_f, stacked, comb)
    [art] = list(export_cache.glob("fs-classic-*.jaxexport"))
    art.write_bytes(b"\x00garbage")

    _simulate_fresh_process()
    (proof_2, _, _), _ = _fs_prove(nv, tables_f, stacked, comb)
    assert proof_2 == proof_1  # fell back to the plain jitted kernel
    assert "export cache bypass" in capsys.readouterr().err


def test_export_cache_gruen_roundtrip(export_cache):
    """The production 2^20 path is Gruen FS + export cache: pin the cached
    write AND read paths byte-identical for the Gruen kernel too."""
    from zinc_tpu.poly.mle import DenseMleF, build_eq_x_r
    from zinc_tpu.sumcheck.device_fs import prove_as_subprotocol_device_fs

    rng = random.Random(21)
    nv = 10
    tables_f = [
        [CFG.fp(rng.randrange(CFG.q)) for _ in range(1 << nv)] for _ in range(3)
    ]
    beta = [CFG.fp(rng.randrange(CFG.q)) for _ in range(nv)]
    eq_tab = build_eq_x_r(beta, CFG).evaluations
    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, CFG)) for t in tables_f])
    comb = [(CFG.one(), (0, 1, 3)), (-CFG.one(), (2, 3))]

    th = KeccakTranscript()
    proof_h, state_h = prove_as_subprotocol(
        th,
        [DenseMleF(nv, list(t), CFG) for t in tables_f]
        + [DenseMleF(nv, list(eq_tab), CFG)],
        nv, 3, comb, CFG,
    )

    for _ in range(2):  # write pass, then the deserialize pass
        _simulate_fresh_process()
        td = KeccakTranscript()
        proof_d, rs_d, _ = prove_as_subprotocol_device_fs(
            td, CFG, stacked, nv, 3, comb, eq_beta=beta
        )
        assert proof_d == proof_h and rs_d == state_h.randomness
        assert td.h.digest() == th.h.digest()
    assert len(list(export_cache.glob("fs-gruen-*.jaxexport"))) == 1
