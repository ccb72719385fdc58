"""External / independent cross-validation of the rand-0.9.2 shuffle stack.

VERDICT r3 item 7: the RAA permutation parity layers were previously pinned
only against vectors this repo generated itself.  This file adds the two
strongest checks available in this image (no cargo, zero egress):

1. **OpenSSL cross-validation of the ChaCha core** — rand's StdRng is
   ChaCha12 in the djb layout (64-bit block counter + 64-bit nonce).  For a
   ZERO nonce and counter < 2^32, the djb state layout coincides word-for-
   word with RFC-7539's (32-bit counter + 96-bit nonce), so the SAME core
   run at 20 rounds must reproduce OpenSSL's ChaCha20 keystream exactly —
   validating the constants, quarter-round, column/diagonal schedule,
   counter handling, and serialization against an implementation this repo
   did not write.  Only the loop count (6 vs 10 double rounds) is outside
   the cross-check.

2. **Independent C++ mirror of layers 1-4** (native/rand09_mirror.cpp,
   written separately from zinc_tpu/rng.py against the documented
   algorithms): cross-run at the production codeword sizes (2048/4096,
   zip/code.py RAA blocks) plus small/edge sizes and many seeds.  A
   transcription error in either implementation of SplitMix64 seeding,
   IncreasingUniform batching, or Canon's early-out would diverge.

Reference: /root/reference/src/zip/utils.rs:139-142 (shuffle_seeded),
Cargo.toml pin rand = "0.9.2".
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from zinc_tpu.rng import ChaCha12, chacha_block_words, permutation_from_seed


def _openssl_chacha20_keystream(key: bytes, counter: int, nblocks: int) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms

    # cryptography's ChaCha20 nonce parameter is 16 bytes: the first 4 are
    # the little-endian initial block counter, the remaining 12 the RFC
    # nonce (zero here, which equals the djb zero nonce).
    full_nonce = counter.to_bytes(4, "little") + b"\x00" * 12
    enc = Cipher(algorithms.ChaCha20(key, full_nonce), mode=None).encryptor()
    return enc.update(b"\x00" * (64 * nblocks))


def _core_keystream(key: bytes, counter: int, nblocks: int, rounds: int) -> bytes:
    key_words = [int.from_bytes(key[4 * i : 4 * i + 4], "little") for i in range(8)]
    out = bytearray()
    for b in range(nblocks):
        for w in chacha_block_words(key_words, counter + b, rounds):
            out += w.to_bytes(4, "little")
    return bytes(out)


@pytest.mark.parametrize(
    "key,counter",
    [
        (b"\x00" * 32, 0),
        (bytes(range(32)), 0),
        (bytes(range(32)), 7),
        (b"\xff" * 32, 1),
        (bytes((i * 37 + 11) % 256 for i in range(32)), 1234567),
    ],
)
def test_chacha_core_matches_openssl_at_20_rounds(key, counter):
    """The SAME block function StdRng uses at 12 rounds reproduces OpenSSL
    ChaCha20 when run at 20 — external validation of everything but the
    round count."""
    want = _openssl_chacha20_keystream(key, counter, 3)
    got = _core_keystream(key, counter, 3, rounds=20)
    assert got == want


def test_chacha12_differs_from_chacha20():
    """Sanity: the 12-round keystream is NOT the 20-round one (the test
    above cannot have passed by accident of a constant stream)."""
    key = bytes(range(32))
    assert _core_keystream(key, 0, 1, 12) != _core_keystream(key, 0, 1, 20)


def test_chacha12_class_uses_12_round_core():
    """ChaCha12.next_u32 consumes the 12-round keystream in word order."""
    key = bytes(range(32))
    rng = ChaCha12(key)
    words = [rng.next_u32() for _ in range(20)]  # crosses a block boundary
    stream = _core_keystream(key, 0, 2, 12)
    want = [int.from_bytes(stream[4 * i : 4 * i + 4], "little") for i in range(20)]
    assert words == want


_GXX = shutil.which("g++")


@pytest.mark.skipif(_GXX is None, reason="no C++ toolchain")
def test_shuffle_matches_independent_cpp_mirror(tmp_path):
    """Layers 1-4 cross-run against native/rand09_mirror.cpp at the
    production codeword sizes and edge shapes."""
    src = os.path.join(os.path.dirname(__file__), "..", "native", "rand09_mirror.cpp")
    exe = tmp_path / "rand09_mirror"
    subprocess.run(
        [_GXX, "-O2", "-std=c++17", "-o", str(exe), src],
        check=True, capture_output=True, timeout=120,
    )
    cases = [
        (0, 16),
        (12345, 16),
        (1, 1),
        (7, 2),
        (987654321, 2048),           # production RAA block
        (2**63 + 11, 2048),
        (0xDEADBEEFCAFEF00D, 4096),  # production RAA block
    ] + [(seed, 101) for seed in range(20)]
    for seed, n in cases:
        out = subprocess.run(
            [str(exe), str(seed), str(n)],
            check=True, capture_output=True, timeout=60, text=True,
        ).stdout.split()
        cpp = np.array([int(x) for x in out], dtype=np.int64)
        py = permutation_from_seed(seed, n)
        assert np.array_equal(cpp, py), f"divergence at seed={seed} n={n}"
