"""Round-3 on-chip measurement battery (run when the axon tunnel is up).

Usage: python scripts/chip_measure.py [prove|verify|cold|all]

Produces the numbers VERDICT r3 items 1/3/4/6 need:
  prove  - warm 2^20 device prove x4 with ZINC_TPU_TRACE stage splits
  verify - warm 2^20 device verify with stage splits
  cold   - fresh-process cold prove (export cache + persistent XLA cache)
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


def run_cold():
    # populate caches with one in-process prove, then measure a FRESH process
    code = (
        "import sys, time; sys.path.insert(0, %r); t0=time.time(); "
        "from scripts.chip_measure import run_prove; run_prove(n_runs=1); "
        "print('[cold] fresh-process prove: %%.1f s' %% (time.time()-t0))"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    run_prove(n_runs=1)  # warm the caches
    t0 = time.time()
    subprocess.run([sys.executable, "-u", "-c", code], check=True)
    print(f"[cold] total incl. interpreter: {time.time()-t0:.1f} s")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    os.environ.setdefault("ZINC_TPU_TRACE", "1")
    if what in ("prove", "all"):
        run_prove()
    if what in ("verify", "all"):
        run_verify()
    if what in ("cold", "all"):
        run_cold()
