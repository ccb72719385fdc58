"""Sumcheck prove+verify benchmark (mirror of
/root/reference/benches/sumcheck_benches.rs:17-40: 20 variables, 7-factor
product, via the device executor + host verifier).

Usage: python benches/bench_sumcheck.py [nv]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.poly.device import fps_to_limbs
from zinc_tpu.sumcheck.device import DeviceSumcheckExecutor, prove_as_subprotocol_device
from zinc_tpu.sumcheck.verifier import verify_as_subprotocol
from zinc_tpu.transcript import KeccakTranscript

NV = int(sys.argv[1]) if len(sys.argv) > 1 else (20 if jax.devices()[0].platform == "tpu" else 10)
N_FACTORS = 7


def main() -> None:
    cfg = FieldConfig((1 << 255) + 95, 4)
    rng = random.Random(0)
    tables = []
    for _ in range(N_FACTORS):
        tables.append([cfg.fp(rng.randrange(cfg.q)) for _ in range(1 << NV)])
    claimed = cfg.zero()
    for b in range(1 << NV):
        prod = cfg.one()
        for t in tables:
            prod = prod * t[b]
        claimed = claimed + prod

    stacked = jnp.stack([jnp.asarray(fps_to_limbs(t, cfg)) for t in tables])
    comb = [(cfg.one(), tuple(range(N_FACTORS)))]

    # Criterion-style warm measurement: the first prove pays every per-round
    # trace/compile; the recorded pass is the steady-state cost (the r5 cold
    # pass measured 545 s at 20v/7prod vs the warm stage cost).
    def prove():
        ex = DeviceSumcheckExecutor(cfg, stacked, N_FACTORS, comb)
        tp = KeccakTranscript()
        return prove_as_subprotocol_device(tp, ex, NV, N_FACTORS, cfg)[0]

    prove()
    t0 = time.perf_counter()
    proof = prove()
    prove_s = time.perf_counter() - t0

    verify_as_subprotocol(KeccakTranscript(), NV, N_FACTORS, claimed, proof, cfg)
    t0 = time.perf_counter()
    verify_as_subprotocol(KeccakTranscript(), NV, N_FACTORS, claimed, proof, cfg)
    verify_s = time.perf_counter() - t0

    print(json.dumps({"metric": f"sumcheck_prove_{NV}v_{N_FACTORS}prod", "value": round(prove_s * 1e3, 1), "unit": "ms"}))
    print(json.dumps({"metric": f"sumcheck_verify_{NV}v_{N_FACTORS}prod", "value": round(verify_s * 1e3, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
