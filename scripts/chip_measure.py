"""On-chip measurement battery (run when the axon tunnel is up).

Usage: python scripts/chip_measure.py [prove|verify|cold|sharded|all]

Produces the numbers VERDICT items need:
  prove   - warm 2^20 device prove x4 with ZINC_TPU_TRACE stage splits
  verify  - warm 2^20 device verify with stage splits
  cold    - fresh-process cold prove (export cache + persistent XLA cache)
  sharded - shard_map overhead on 1 chip: kernel chain direct vs under a
            1-device mesh, + whole-sumcheck walls (unsharded FS vs one-sync
            sharded FS vs per-round sharded executor) at 2^20
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 20
SEED = 5


def _setup():
    import random

    from zinc_tpu.ccs import dummy_ccs_of_size
    from zinc_tpu.prime import draw_random_field
    from zinc_tpu.transcript import KeccakTranscript
    from zinc_tpu.zip.code import ZipTypes

    rng = random.Random(SEED)
    _, ccs, statement, wit = dummy_ccs_of_size(N, rng, int_bits=62)
    zt = ZipTypes(1)
    t = KeccakTranscript()
    cfg = draw_random_field(statement.public_input, t, zt.n_words, 4)
    return ccs, statement, wit, zt, t, cfg


def run_prove(n_runs=4, setup=None):
    from zinc_tpu.transcript import KeccakTranscript
    from zinc_tpu.zinc import ZincProver

    ccs, statement, wit, zt, t0, cfg = setup if setup is not None else _setup()
    times = []
    proof = None
    for i in range(n_runs):
        t = KeccakTranscript()
        from zinc_tpu.prime import draw_random_field

        cfg_i = draw_random_field(statement.public_input, t, zt.n_words, 4)
        start = time.perf_counter()
        proof = ZincProver(zt, backend="device").prove(statement, wit, t, ccs, cfg_i)
        dt = time.perf_counter() - start
        times.append(dt)
        print(f"[prove] run {i}: {dt:.1f} s", flush=True)
    print(f"[prove] runs: {['%.1f' % x for x in times]} "
          f"best {min(times):.1f} spread ±{(max(times)-min(times))/2/min(times)*100:.0f}%")
    return proof, cfg


def run_verify(n_runs=3):
    import pickle

    from zinc_tpu.transcript import KeccakTranscript
    from zinc_tpu.zinc import ZincVerifier

    setup = _setup()
    ccs, statement, wit, zt, t0, cfg = setup
    proof, cfg = run_prove(n_runs=1, setup=setup)
    times = []
    for i in range(n_runs):
        start = time.perf_counter()
        ZincVerifier(zt, backend="device").verify(
            statement, proof, KeccakTranscript(), ccs, cfg
        )
        dt = time.perf_counter() - start
        times.append(dt)
        print(f"[verify] run {i}: {dt:.1f} s", flush=True)
    print(f"[verify] best {min(times):.1f} s")
    # the production pattern: ONE verifier checking many proofs of the same
    # circuit (the statement-matrix upload amortizes via the csr cache)
    ver = ZincVerifier(zt, backend="device")
    times_amort = []
    for i in range(n_runs):
        start = time.perf_counter()
        ver.verify(statement, proof, KeccakTranscript(), ccs, cfg)
        times_amort.append(time.perf_counter() - start)
        print(f"[verify] reused-verifier run {i}: {times_amort[-1]:.1f} s",
              flush=True)
    print(f"[verify] reused-verifier best {min(times_amort[1:]):.1f} s")


def run_cold():
    # populate the persistent caches with one prove in a SUBPROCESS (an
    # in-process warm prove keeps its device buffers alive and OOMs the
    # single chip when the measured subprocess starts — r4 battery), then
    # measure a second fresh process: the true cold-start with caches on.
    code = (
        "import sys, time; sys.path.insert(0, %r); t0=time.time(); "
        "from scripts.chip_measure import run_prove; run_prove(n_runs=1); "
        "print('[cold] fresh-process prove: %%.1f s' %% (time.time()-t0))"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    print("[cold] warming caches in a subprocess...", flush=True)
    subprocess.run([sys.executable, "-u", "-c", code], check=True)
    t0 = time.time()
    subprocess.run([sys.executable, "-u", "-c", code], check=True)
    print(f"[cold] total incl. interpreter: {time.time()-t0:.1f} s")


def run_coldverify():
    """Cold fresh-process VERIFY: the wall a freshly booted verifier process
    pays to check ONE 2^20 proof (production bring-up), persistent caches
    populated.  Process A mints + serializes the proof and runs one verify
    (warming the verify-side compile caches); process B — the measurement —
    deserializes the blob and verifies from nothing."""
    blob_path = "/tmp/zinc_coldverify_2p20.bin"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    warm = (
        "import sys, time; sys.path.insert(0, %r); "
        "from scripts.chip_measure import _setup; "
        "from zinc_tpu.serialize import serialize_proof; "
        "from zinc_tpu.transcript import KeccakTranscript; "
        "from zinc_tpu.zinc import ZincProver, ZincVerifier; "
        "from zinc_tpu.prime import draw_random_field; "
        "ccs, st, wit, zt, t0, cfg = _setup(); "
        "t = KeccakTranscript(); "
        "cfg = draw_random_field(st.public_input, t, zt.n_words, 4); "
        "p = ZincProver(zt, backend='device').prove(st, wit, t, ccs, cfg); "
        "open(%r, 'wb').write(serialize_proof(p, cfg)); "
        "t1 = time.time(); "
        "ZincVerifier(zt, backend='device').verify(st, p, KeccakTranscript(), ccs, cfg); "
        "print('[coldverify] warming verify: %%.1f s' %% (time.time() - t1))"
        % (root, blob_path)
    )
    cold = (
        "import sys, time; sys.path.insert(0, %r); "
        "t_boot = time.time(); "
        "from scripts.chip_measure import _setup; "
        "from zinc_tpu.serialize import deserialize_proof; "
        "from zinc_tpu.transcript import KeccakTranscript; "
        "from zinc_tpu.zinc import ZincVerifier; "
        "ccs, st, wit, zt, t0, cfg = _setup(); "
        "t_setup = time.time(); "
        "proof = deserialize_proof(open(%r, 'rb').read(), cfg); "
        "t_deser = time.time(); "
        "ZincVerifier(zt, backend='device').verify(st, proof, KeccakTranscript(), ccs, cfg); "
        "t_ver = time.time(); "
        "print('[coldverify] fresh process: statement build %%.1f s, "
        "deserialize %%.1f s, verify %%.1f s, total %%.1f s' %% "
        "(t_setup - t_boot, t_deser - t_setup, t_ver - t_deser, t_ver - t_boot))"
        % (root, blob_path)
    )
    print("[coldverify] warming caches + minting the proof in a subprocess...",
          flush=True)
    subprocess.run([sys.executable, "-u", "-c", warm], check=True)
    subprocess.run([sys.executable, "-u", "-c", cold], check=True)


def run_sharded():
    """VERDICT r3 item 5: the only shard-perf evidence obtainable on 1 chip.

    (a) kernel level — the bench.py chained-differencing round (classic MXU
        fold+eval) run directly vs under a 1-device-mesh shard_map; the
        delta IS the shard_map dispatch/psum overhead.
    (b) whole-sumcheck walls at 2^20 (Gruen SC1 shape, 3 tables + factored
        eq): unsharded device-FS vs the one-sync sharded FS on a 1-device
        mesh vs the per-round sharded executor (one host sync per round).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zinc_tpu.fields.config import FieldConfig
    from zinc_tpu.fields.montgomery import device_field
    from zinc_tpu.parallel import local_mesh
    from zinc_tpu.parallel.fs import (
        prove_as_subprotocol_device_fs_sharded,
        wants_fs_sharded,
    )
    from zinc_tpu.parallel.sumcheck import (
        _sharded_lm_eval_dyn,
        _sharded_lm_fold_dyn,
        _sharded_lm_prep,
        make_sharded_executor,
        wants_gruen_sharded,
    )
    from zinc_tpu.sumcheck.device_fs import (
        prove_as_subprotocol_device_fs,
        wants_gruen,
    )
    from zinc_tpu.sumcheck.mxu_exec import TILE, _eval_lm, _fold_lm, term_meta
    from zinc_tpu.transcript import KeccakTranscript

    cfg = FieldConfig((1 << 255) + 95, 4)
    ctx = device_field(cfg)
    l16 = cfg.n16
    nv, b = 20, 1 << 20
    rng = np.random.default_rng(0)
    mesh1 = local_mesh(1)
    axes = tuple(mesh1.axis_names)

    # ---- (a) kernel chain: direct vs 1-device shard_map --------------------
    idx_terms = ((0, 3), (1, 3), (2, 3))  # the bench.py headline shape
    terms = term_meta(idx_terms, l16)
    tables = rng.integers(0, 1 << 16, (4, b, l16), dtype=np.uint32)
    tables[..., -1] &= 0x7FFF  # value < 2^255 <= q (limbs little-endian)
    r = jax.device_put(rng.integers(0, 1 << 16, (l16,), dtype=np.uint32))
    nbh = b // (4 * TILE)
    lm_host = np.transpose(tables, (0, 2, 1)).copy()

    def chained(make_round, buf0):
        def chain_s(k):
            t0 = time.perf_counter()
            buf = buf0 + jnp.uint32(0)
            gs = None
            for _ in range(k):
                buf, gs = make_round(buf)
            np.asarray(gs[0])
            return time.perf_counter() - t0

        chain_s(1)  # warmup/compile
        short = min(chain_s(1) for _ in range(3))
        long = min(chain_s(9) for _ in range(3))
        return max(long - short, 1e-9) / 8 * 1e3

    direct_buf = jax.device_put(lm_host)

    def direct_round(buf):
        buf = _fold_lm(ctx, buf, r, nbh)
        return buf, _eval_lm(ctx, buf, terms, nbh)

    direct_ms = chained(direct_round, direct_buf)
    print(f"[sharded] (a) direct classic MXU round: {direct_ms:.2f} ms", flush=True)

    sharded_tabs = jax.device_put(
        jnp.asarray(tables), NamedSharding(mesh1, P(None, axes, None))
    )
    buf0 = _sharded_lm_prep(mesh1, b)(sharded_tabs)
    # the production pallas route: dynamic-grid shard_mapped kernels
    # (ShardedLmSumcheckExecutor._do_fold/_do_eval)
    fold_fn = _sharded_lm_fold_dyn(mesh1, ctx)
    eval_fn = _sharded_lm_eval_dyn(mesh1, ctx, terms)
    nbh_arr = jnp.asarray([nbh], jnp.int32)

    def sharded_round(buf):
        buf = fold_fn(buf, r, nbh_arr)
        return buf, eval_fn(buf, nbh_arr)

    sharded_ms = chained(sharded_round, buf0)
    print(
        f"[sharded] (a) same round under 1-device-mesh shard_map: "
        f"{sharded_ms:.2f} ms (overhead "
        f"{(sharded_ms / direct_ms - 1) * 100:+.0f}%)",
        flush=True,
    )

    # ---- (b) whole-sumcheck walls at 2^20 (Gruen SC1 shape) ---------------
    comb = [(cfg.one(), (0, 1, 3)), (cfg.fp(5), (2, 3))]
    beta = [cfg.fp(int(rng.integers(1 << 62))) for _ in range(nv)]
    stacked = jnp.asarray(tables[:3])
    assert wants_gruen(cfg, comb, 3, b)
    assert wants_fs_sharded(cfg, comb, b, mesh1, eq_idx=3)
    assert wants_gruen_sharded(cfg, comb, 3, b, mesh1)

    def wall(tag, fn, n_runs=3):
        times = []
        for i in range(n_runs):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
            print(f"[sharded] (b) {tag} run {i}: {times[-1]:.2f} s", flush=True)
        print(f"[sharded] (b) {tag}: warm best {min(times[1:]):.2f} s "
              f"(first/cold {times[0]:.2f} s)", flush=True)
        return min(times[1:])

    def run_unsharded():
        t = KeccakTranscript()
        t.absorb(b"sharded-bench")
        prove_as_subprotocol_device_fs(t, cfg, stacked, nv, 3, comb, eq_beta=beta)

    def run_fs_sharded():
        t = KeccakTranscript()
        t.absorb(b"sharded-bench")
        prove_as_subprotocol_device_fs_sharded(
            t, cfg, stacked, nv, 3, comb, mesh1, eq_beta=beta
        )

    def run_per_round():
        # device phase only: same 12 rounds the FS drivers run on device,
        # with one host sync (G-plane fetch + challenge upload) per round
        ex = make_sharded_executor(cfg, stacked, 3, comb, mesh1, eq_beta=beta)
        r_prev = None
        for i in range(12):
            ex.round(r_prev)
            r_prev = cfg.fp(0x1234567 + i)

    un = wall("unsharded device-FS (whole sumcheck incl. host tail)", run_unsharded)
    fs = wall("one-sync sharded FS, 1-device mesh (incl. host tail)", run_fs_sharded)
    pr = wall("per-round sharded executor, 12 device rounds only", run_per_round)
    print(
        f"[sharded] summary: kernel round {direct_ms:.2f}->{sharded_ms:.2f} ms "
        f"under shard_map; whole-sumcheck unsharded {un:.2f} s vs one-sync "
        f"sharded {fs:.2f} s; per-round sharded device phase {pr:.2f} s",
        flush=True,
    )


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.environ.setdefault("ZINC_TPU_TRACE", "1")
    if what in ("prove", "all"):
        run_prove()
    if what in ("verify", "all"):
        run_verify()
    if what in ("cold", "all"):
        run_cold()
    if what in ("coldverify", "all"):
        run_coldverify()
    if what in ("sharded", "all"):
        run_sharded()
