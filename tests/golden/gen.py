"""Regenerate the golden proof fixture (also imported by the pinning test).

The fixture pins the full serialized wire format end-to-end: a silent
framing drift in transcript/PCS serialization would otherwise let prover
and verifier drift together unnoticed (the reference pins its canonical
sequences the same way, /root/reference/src/zip/tests.rs:115-148).
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from zinc_tpu.ccs import dummy_ccs_of_size
from zinc_tpu.prime import draw_random_field
from zinc_tpu.serialize import serialize_proof
from zinc_tpu.transcript import KeccakTranscript
from zinc_tpu.zinc import ZincProver
from zinc_tpu.zip.code import ZipTypes

N = 1 << 10
SEED = 1234


def generate() -> bytes:
    rng = random.Random(SEED)
    _, ccs, statement, wit = dummy_ccs_of_size(N, rng, int_bits=62)
    t = KeccakTranscript()
    zt = ZipTypes(1)
    cfg = draw_random_field(statement.public_input, t, zt.n_words, 4)
    proof = ZincProver(zt, backend="host").prove(statement, wit, t, ccs, cfg)
    return serialize_proof(proof, cfg)


if __name__ == "__main__":
    blob = generate()
    out = Path(__file__).parent / "proof_2p10.bin"
    out.write_bytes(blob)
    print(f"wrote {out} ({len(blob)} bytes)")
