"""Native C++ host runtime (keccak/blake3) must match the pure-Python oracle."""

import random

import pytest

from zinc_tpu.hashing.blake3 import blake3_py
from zinc_tpu.hashing.keccak import Keccak256Py
from zinc_tpu.native import blake3_batch, get_lib, merkle_fold_batch


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_keccak_native_matches_python(lib):
    import ctypes

    rng = random.Random(1)
    for _ in range(50):
        state = (ctypes.c_uint64 * 25)()
        hp = Keccak256Py()
        n_blocks = rng.randrange(0, 5)
        blocks = bytes(rng.randrange(256) for _ in range(136 * n_blocks))
        tail = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 136)))
        lib.zn_keccak_absorb_blocks(state, blocks, n_blocks)
        out = (ctypes.c_uint8 * 32)()
        lib.zn_keccak_finalize(state, tail, len(tail), out)
        hp.update(blocks + tail)
        assert bytes(out) == hp.digest()


def test_blake3_native_matches_python(lib):
    import ctypes

    rng = random.Random(2)
    for ln in [0, 1, 31, 32, 63, 64, 65, 100, 1023, 1024, 1025, 2048, 4097, 66000]:
        data = bytes(rng.randrange(256) for _ in range(ln))
        out = (ctypes.c_uint8 * 32)()
        lib.zn_blake3(data, ln, out)
        assert bytes(out) == blake3_py(data), f"len={ln}"


def test_blake3_batch_and_merkle_fold(lib):
    rng = random.Random(3)
    msgs = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(16)]
    batched = blake3_batch(b"".join(msgs), 16, 32)
    assert batched is not None
    for i, m in enumerate(msgs):
        assert batched[32 * i : 32 * i + 32] == blake3_py(m)

    # fold a real 3-deep tree
    leaves = [blake3_py(m) for m in msgs[:8]]
    level1 = [blake3_py(leaves[2 * i] + leaves[2 * i + 1]) for i in range(4)]
    level2 = [blake3_py(level1[2 * i] + level1[2 * i + 1]) for i in range(2)]
    root = blake3_py(level2[0] + level2[1])
    idx = 5
    path = [leaves[idx ^ 1], level1[(idx >> 1) ^ 1], level2[(idx >> 2) ^ 1]]
    folded = merkle_fold_batch(leaves[idx], b"".join(path), [idx], 3)
    assert folded == root


def test_native_threading_bit_exact(lib):
    """ZINC_TPU_NATIVE_THREADS splits batches across std::thread at 16-aligned
    chunks (production verifiers run many-core hosts; this VM has 1) — the
    outputs must be byte-identical for every thread count, including chunk
    boundaries that don't divide the batch."""
    import os
    from unittest import mock

    rng = random.Random(7)
    n, depth = 1000, 5  # not 16-aligned; > the 256/thread spawn floor
    leaves = b"".join(bytes(rng.randrange(256) for _ in range(32)) for _ in range(n))
    sibs = b"".join(
        bytes(rng.randrange(256) for _ in range(depth * 32)) for _ in range(n)
    )
    idx = [rng.randrange(1 << depth) for _ in range(n)]
    msgs = b"".join(bytes(rng.randrange(256) for _ in range(48)) for _ in range(n))

    results = {}
    for t in ("1", "3", "16"):
        with mock.patch.dict(os.environ, {"ZINC_TPU_NATIVE_THREADS": t}):
            results[t] = (
                merkle_fold_batch(leaves, sibs, idx, depth),
                blake3_batch(msgs, n, 48),
            )
    assert results["1"] == results["3"] == results["16"]
    # and the single-thread result matches the pure-Python oracle spot-wise
    assert results["1"][1][:32] == blake3_py(msgs[:48])


def test_host_merkle_native_matches_fallback():
    """from_leaves via the batched native tier == pure-Python layer build."""
    import random
    from unittest import mock

    from zinc_tpu.zip.merkle import MerkleTree

    rng = random.Random(1)
    for depth, blen in ((4, 16), (6, 32), (5, 48)):
        leaves = [bytes(rng.randrange(256) for _ in range(blen)) for _ in range(1 << depth)]
        t_native = MerkleTree.from_leaves(depth, leaves)
        with mock.patch("zinc_tpu.native.blake3_batch", lambda *a, **k: None):
            t_py = MerkleTree.from_leaves(depth, leaves)
        assert t_native.root == t_py.root
        assert t_native.layers == t_py.layers
        assert all(t_native.path(i) == t_py.path(i) for i in range(1 << depth))
