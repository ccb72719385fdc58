"""Seeded deterministic permutations for the RAA code.

The reference derives its two RAA permutations with
``StdRng::seed_from_u64(seed)`` + Fisher-Yates (``shuffle_seeded``,
/root/reference/src/zip/utils.rs:139-142).  ``StdRng`` is ChaCha12 seeded via
SplitMix64; both are reproduced here exactly.  The Fisher-Yates *draw
schedule* of the ``rand 0.9`` crate (its batched ``IncreasingUniform``
sampler) is not reproducible from documentation alone and no Rust toolchain
exists in this environment to pin it, so zinc-tpu pins its own draw schedule:
a backward Durstenfeld walk with Lemire bounded sampling (widening multiply +
threshold rejection).  The permutation is a deterministic pure function of
the 64-bit transcript seed, shared by prover and verifier; its vectors are
pinned in tests/test_rng.py.
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF
_M64 = (1 << 64) - 1


def splitmix64_seed(state: int, nbytes: int = 32) -> bytes:
    """rand_core's ``seed_from_u64``: fill the seed 4 bytes at a time with the
    low half of successive SplitMix64 outputs."""
    out = bytearray()
    while len(out) < nbytes:
        state = (state + 0x9E3779B97F4A7C15) & _M64
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
        z = z ^ (z >> 31)
        out += (z & _M32).to_bytes(4, "little")
    return bytes(out[:nbytes])


class ChaCha12:
    """ChaCha with 12 rounds, djb layout (64-bit counter, 64-bit nonce) —
    the core of rand's StdRng.  Emits the keystream as sequential u32 words."""

    def __init__(self, seed32: bytes):
        assert len(seed32) == 32
        self.key = [int.from_bytes(seed32[4 * i : 4 * i + 4], "little") for i in range(8)]
        self.counter = 0
        self.buf: list[int] = []

    @staticmethod
    def from_seed_u64(seed: int) -> "ChaCha12":
        return ChaCha12(splitmix64_seed(seed & _M64))

    def _block(self, counter: int) -> list[int]:
        c = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        st = c + self.key + [counter & _M32, (counter >> 32) & _M32, 0, 0]
        x = list(st)

        def qr(a, b, cc, d):
            x[a] = (x[a] + x[b]) & _M32
            x[d] ^= x[a]
            x[d] = ((x[d] << 16) | (x[d] >> 16)) & _M32
            x[cc] = (x[cc] + x[d]) & _M32
            x[b] ^= x[cc]
            x[b] = ((x[b] << 12) | (x[b] >> 20)) & _M32
            x[a] = (x[a] + x[b]) & _M32
            x[d] ^= x[a]
            x[d] = ((x[d] << 8) | (x[d] >> 24)) & _M32
            x[cc] = (x[cc] + x[d]) & _M32
            x[b] ^= x[cc]
            x[b] = ((x[b] << 7) | (x[b] >> 25)) & _M32

        for _ in range(6):  # 12 rounds = 6 double rounds
            qr(0, 4, 8, 12)
            qr(1, 5, 9, 13)
            qr(2, 6, 10, 14)
            qr(3, 7, 11, 15)
            qr(0, 5, 10, 15)
            qr(1, 6, 11, 12)
            qr(2, 7, 8, 13)
            qr(3, 4, 9, 14)

        return [(x[i] + st[i]) & _M32 for i in range(16)]

    def next_u32(self) -> int:
        if not self.buf:
            self.buf = self._block(self.counter)
            self.counter += 1
        return self.buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        hi = self.next_u32()
        return lo | (hi << 32)

    def next_below(self, n: int) -> int:
        """Uniform in [0, n) — Lemire widening-multiply with rejection."""
        assert 0 < n <= 1 << 32
        threshold = ((1 << 32) - n) % n
        while True:
            x = self.next_u32()
            m = x * n
            if (m & _M32) >= threshold:
                return m >> 32


def permutation_from_seed(seed: int, length: int) -> np.ndarray:
    """The pinned zinc-tpu seeded permutation σ: shuffled[k] = input[σ(k)].

    Backward Durstenfeld Fisher-Yates over the identity using the
    StdRng-compatible ChaCha12 stream."""
    rng = ChaCha12.from_seed_u64(seed)
    arr = np.arange(length, dtype=np.int64)
    for i in range(length - 1, 0, -1):
        j = rng.next_below(i + 1)
        arr[i], arr[j] = arr[j], arr[i]
    return arr
