"""End-to-end example: the SAME prove sharded over a device mesh.

The reference parallelizes with Rayon inside one host; zinc-tpu shards the
whole pipeline (sumcheck, RAA encode, Merkle, open) over a
``jax.sharding.Mesh`` and proves byte-identically to a single chip — this
example runs both and checks the serialized proofs match, then verifies.

Run on real chips as-is (the mesh uses every visible device), or on a
virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m zinc_tpu.examples.mesh_prove
"""

from __future__ import annotations

import random
import time

from ..ccs import dummy_ccs_of_size
from ..prime import draw_random_field
from ..serialize import serialize_proof
from ..transcript import KeccakTranscript
from ..zinc import ZincProver, ZincVerifier
from ..zip.code import ZipTypes

INT_LIMBS = 1
FIELD_LIMBS = 4


def run_example(log_n: int = 8, verbose: bool = True):
    import jax

    from ..parallel import local_mesh

    zt = ZipTypes(INT_LIMBS)
    rng = random.Random(7)
    _, ccs, statement, witness = dummy_ccs_of_size(1 << log_n, rng, int_bits=62)

    def prove(mesh):
        t = KeccakTranscript()
        cfg = draw_random_field(statement.public_input, t, zt.n_words, FIELD_LIMBS)
        prover = ZincProver(zt, backend="device", mesh=mesh)
        t0 = time.perf_counter()
        proof = prover.prove(statement, witness, t, ccs, cfg)
        return cfg, proof, time.perf_counter() - t0

    n_dev = len(jax.devices())
    mesh = local_mesh(n_dev)
    if verbose:
        print(f"2^{log_n} constraints, mesh = {n_dev}×{jax.devices()[0].platform}")

    cfg_1, proof_1, dt_1 = prove(None)  # single-device reference
    cfg_m, proof_m, dt_m = prove(mesh)  # sharded over every visible device
    assert cfg_1.q == cfg_m.q

    blob_1 = serialize_proof(proof_1, cfg_1)
    blob_m = serialize_proof(proof_m, cfg_m)
    assert blob_1 == blob_m, "mesh proof bytes diverge from single-device"
    if verbose:
        print(f"unsharded {dt_1:.2f} s | {n_dev}-device mesh {dt_m:.2f} s "
              f"(includes trace/compile on first use)")
        print(f"proof bytes identical across layouts ({len(blob_m)} bytes)")

    ZincVerifier(zt).verify(statement, proof_m, KeccakTranscript(), ccs, cfg_m)
    if verbose:
        print("verification: ACCEPT")
    return proof_m


if __name__ == "__main__":
    run_example()
