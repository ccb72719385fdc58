"""Zip PCS benchmark (mirror of /root/reference/benches/zip_benches.rs:225-268:
encode_rows / merkle / commit / open / verify at poly sizes 2^12.., RAA code,
DefaultLinearCodeSpec — device-backend commit/open, host verify).

Usage: python benches/bench_zip.py [log2_n ...]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from zinc_tpu.fields.config import FieldConfig
from zinc_tpu.ops.field_map import i64_to_field_device
from zinc_tpu.zip.code import DefaultLinearCodeSpec, RaaCode, ZipTypes
from zinc_tpu.zip.device import commit_device, open_device
from zinc_tpu.zip.pcs import setup, verify_poly
from zinc_tpu.zip.transcript import PcsTranscript
from zinc_tpu.transcript import KeccakTranscript

SIZES = [int(a) for a in sys.argv[1:]] or ([12, 14, 16] if jax.devices()[0].platform == "tpu" else [8])
ZT = ZipTypes(1)


def main() -> None:
    cfg = FieldConfig((1 << 255) + 95, 4)
    for log_n in SIZES:
        n = 1 << log_n
        rng = random.Random(7)
        z_vals = np.array([rng.randrange(-(1 << 62), 1 << 62) for _ in range(n)], np.int64)
        t = KeccakTranscript()
        t.absorb(b"bench")
        code = RaaCode(DefaultLinearCodeSpec(), n, t, ZT)
        pp = setup(n, code, ZT)

        # sub-metrics mirroring zip_benches.rs: encode_rows (on-chip, forced
        # by a scalar reduction), merkle_root, commit_no_merkle (encode +
        # codeword download, i.e. commit minus the tree)
        import jax.numpy as jnp

        from zinc_tpu.fields.limbs import i64_to_limbs
        from zinc_tpu.ops.blake3_kernel import merkle_tree_device
        from zinc_tpu.zip.device import _raa_encode_rows

        lk = 4 * ZT.k_words
        p1, p2 = pp.code.permutations()
        z_limbs = jax.device_put(i64_to_limbs(z_vals, 4 * ZT.n_words))
        p1_d, p2_d = jax.device_put(np.asarray(p1)), jax.device_put(np.asarray(p2))

        def encode():
            return _raa_encode_rows(z_limbs, pp.code.row_len, pp.code.repetition_factor, lk, p1_d, p2_d)

        np.asarray(jnp.max(encode()))  # warmup/compile
        t0 = time.perf_counter()
        enc = encode()
        np.asarray(jnp.max(enc))
        encode_s = time.perf_counter() - t0

        # Criterion-style warm measurement: every stage runs once to compile/
        # trace/populate caches, then the recorded pass — otherwise the
        # numbers are first-run compile walls, not the stage cost (the r5
        # cold pass measured open_2p14 at 122 s vs ~9 s warm).
        def merkle():
            layers = merkle_tree_device(enc, ZT.k_words)
            np.asarray(jnp.max(layers[-1]))

        merkle()
        t0 = time.perf_counter()
        merkle()
        merkle_s = time.perf_counter() - t0

        np.asarray(encode().astype(jnp.uint16))
        t0 = time.perf_counter()
        np.asarray(encode().astype(jnp.uint16))
        commit_nm_s = time.perf_counter() - t0

        commit_device(pp, z_vals, cfg)
        t0 = time.perf_counter()
        data, comm = commit_device(pp, z_vals, cfg)
        commit_s = time.perf_counter() - t0

        point = [cfg.fp(rng.randrange(cfg.q)) for _ in range(log_n)]
        z_f = i64_to_field_device(cfg, z_vals)
        open_device(pp, z_vals, z_f, data, point, cfg, PcsTranscript())
        pt = PcsTranscript()
        t0 = time.perf_counter()
        open_device(pp, z_vals, z_f, data, point, cfg, pt)
        open_s = time.perf_counter() - t0

        from zinc_tpu.poly.mle import DenseMleZ

        v = DenseMleZ(log_n, z_vals.tolist()).map_to_field(cfg).evaluate(point)
        proof = pt.into_proof()
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), cfg)
        t0 = time.perf_counter()
        verify_poly(pp, comm, point, v, PcsTranscript.from_proof(proof), cfg)
        verify_s = time.perf_counter() - t0

        print(json.dumps({"metric": f"zip_encode_rows_2p{log_n}", "value": round(encode_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_merkle_root_2p{log_n}", "value": round(merkle_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_commit_no_merkle_2p{log_n}", "value": round(commit_nm_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_commit_2p{log_n}", "value": round(commit_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_open_2p{log_n}", "value": round(open_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_verify_2p{log_n}", "value": round(verify_s * 1e3, 1), "unit": "ms"}))
        print(json.dumps({"metric": f"zip_proof_bytes_2p{log_n}", "value": len(proof), "unit": "bytes"}))


if __name__ == "__main__":
    main()
