"""Prime generation benchmark (mirror of
/root/reference/benches/prime_generation_benches.rs:15-23: 196-bit-class
Miller-Rabin rejection sampling from transcript bytes; here the 4-word /
256-bit config the protocol actually draws).

Usage: python benches/bench_prime.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zinc_tpu.prime import get_prime
from zinc_tpu.transcript import KeccakTranscript


def main() -> None:
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        t = KeccakTranscript()
        t.absorb(b"prime-bench" + bytes([i]))
        get_prime(t, 4)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"metric": "prime_gen_256bit", "value": round(dt * 1e3, 2), "unit": "ms"}))


if __name__ == "__main__":
    main()
