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

# second golden shape (VERDICT r3 item 7): pinned by sha256 DIGEST instead
# of a committed blob (the 2^14 proof is ~30 MB; a digest is equally
# binding against wire-format drift).  Regenerate deliberately with
# `python tests/golden/gen.py 14`.
N14 = 1 << 14
SEED14 = 4321


def generate(n: int = N, seed: int = SEED) -> bytes:
    rng = random.Random(seed)
    _, ccs, statement, wit = dummy_ccs_of_size(n, rng, int_bits=62)
    t = KeccakTranscript()
    zt = ZipTypes(1)
    cfg = draw_random_field(statement.public_input, t, zt.n_words, 4)
    proof = ZincProver(zt, backend="host").prove(statement, wit, t, ccs, cfg)
    return serialize_proof(proof, cfg)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "14":
        import hashlib

        blob = generate(N14, SEED14)
        out = Path(__file__).parent / "proof_2p14.sha256"
        digest = hashlib.sha256(blob).hexdigest()
        out.write_text(f"{digest} {len(blob)}\n")
        print(f"wrote {out}: sha256 {digest}, {len(blob)} bytes")
    else:
        blob = generate()
        out = Path(__file__).parent / "proof_2p10.bin"
        out.write_bytes(blob)
        print(f"wrote {out} ({len(blob)} bytes)")
