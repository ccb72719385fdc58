"""Spartan prover/verifier benchmark (mirror of
/root/reference/benches/spartan_benches.rs:24-151: dummy CCS at n = 2^12..,
256-bit prime, device-backend prover + host verifier).

Usage: python benches/bench_spartan.py [log2_n ...]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from zinc_tpu.ccs import dummy_ccs_of_size
from zinc_tpu.prime import draw_random_field
from zinc_tpu.spartan import spartan_verify
from zinc_tpu.spartan_dev import DeviceStatement, spartan_prove_device, z_to_device
from zinc_tpu.transcript import KeccakTranscript

SIZES = [int(a) for a in sys.argv[1:]] or ([12, 14, 16] if jax.devices()[0].platform == "tpu" else [8])


def main() -> None:
    for log_n in SIZES:
        rng = random.Random(42)
        _, ccs, statement, wit = dummy_ccs_of_size(1 << log_n, rng, int_bits=62)
        t = KeccakTranscript()
        cfg = draw_random_field(statement.public_input, t, 1, 4)

        z_ccs = statement.get_z_vector(wit.w_ccs)
        if len(z_ccs) <= ccs.m:
            z_ccs = z_ccs + [0] * (ccs.m - len(z_ccs))
        ds = DeviceStatement.upload(cfg, statement)
        z_f = z_to_device(cfg, z_ccs)

        # Criterion-style warm measurement (first pass = traces/compiles)
        def prove():
            tp = KeccakTranscript()
            cfg_p = draw_random_field(statement.public_input, tp, 1, 4)
            assert cfg_p == cfg
            return spartan_prove_device(ds, z_f, ccs, tp, cfg)[0]

        prove()
        t0 = time.perf_counter()
        proof = prove()
        prove_s = time.perf_counter() - t0

        ccs_f = ccs.map_to_field(cfg)

        def verify():
            tv = KeccakTranscript()
            assert draw_random_field(statement.public_input, tv, 1, 4) == cfg
            spartan_verify(proof, ccs_f, tv, cfg)

        verify()
        t0 = time.perf_counter()
        verify()
        verify_s = time.perf_counter() - t0

        print(json.dumps({"metric": f"spartan_prove_2p{log_n}", "value": round(prove_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"spartan_verify_2p{log_n}", "value": round(verify_s * 1e3, 1), "unit": "ms"}))


if __name__ == "__main__":
    main()
