"""Batched BLAKE3 on device — hot loop #2 (Merkle leaf + level hashing).

Every Merkle node in the Zip commitment is a plain BLAKE3 hash of ≤ a few
64-byte blocks (leaf = hash of a codeword element's serialization, merge =
hash of two 32-byte digests), so the whole tree reduces to batched
applications of the single compression function over (B, 16) uint32 message
blocks — pure 32-bit add/xor/rotate, ideal VPU work, thousands of
independent lanes deep.

The message schedule is applied by static indexing (gathers resolved at
trace time).  The 7 rounds run as a ``lax.scan`` over a (7, B, 16)
pre-permuted message tensor: the scan carry materializes the 16 state
vectors between rounds, which keeps the elementwise DAG shallow.  (A fully
unrolled compress is *catastrophic* on XLA:CPU — its fused elementwise
executor recomputes shared operands, so runtime grows ~160× per extra
round; the scan form is also the right shape for TPU, where 7 iterations
of a 64-op body fuse cleanly.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..hashing.blake3 import CHUNK_END, CHUNK_START, IV, MSG_PERMUTATION, ROOT

_IV = np.array(IV, dtype=np.uint32)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


def _g(state, a, b, c, d, mx, my):
    state[a] = state[a] + state[b] + mx
    state[d] = _rotr(state[d] ^ state[a], 16)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 12)
    state[a] = state[a] + state[b] + my
    state[d] = _rotr(state[d] ^ state[a], 8)
    state[c] = state[c] + state[d]
    state[b] = _rotr(state[b] ^ state[c], 7)


def compress_batch(
    cv: jnp.ndarray,  # (B, 8) uint32 chaining values
    msg: jnp.ndarray,  # (B, 16) uint32 message words
    counter: int,
    block_len,  # scalar or (B,) uint32
    flags: int,
) -> jnp.ndarray:
    """Batched BLAKE3 compression; returns the (B, 8) output chaining value."""
    b = cv.shape[0]
    # derive every state lane from msg so all 16 pick up msg's device-varying
    # type (cv is often a broadcast constant) — required for the scan carry
    # to typecheck inside shard_map
    zero = msg[:, 0] ^ msg[:, 0]
    blv = zero + jnp.asarray(block_len, jnp.uint32)
    state = [cv[:, i] ^ zero for i in range(8)] + [
        zero + _IV[0],
        zero + _IV[1],
        zero + _IV[2],
        zero + _IV[3],
        zero + np.uint32(counter & 0xFFFFFFFF),
        zero + np.uint32((counter >> 32) & 0xFFFFFFFF),
        blv,
        zero + np.uint32(flags),
    ]
    # pre-permute the message for all 7 rounds: (7, B, 16)
    perm = np.arange(16)
    round_perms = []
    for _ in range(7):
        round_perms.append(perm.copy())
        perm = perm[np.array(MSG_PERMUTATION)]
    msgs = msg[:, np.stack(round_perms)]  # (B, 7, 16)
    msgs = jnp.moveaxis(msgs, 1, 0)  # (7, B, 16)

    def round_body(state, m_r):
        state = list(state)
        m = [m_r[:, i] for i in range(16)]
        _g(state, 0, 4, 8, 12, m[0], m[1])
        _g(state, 1, 5, 9, 13, m[2], m[3])
        _g(state, 2, 6, 10, 14, m[4], m[5])
        _g(state, 3, 7, 11, 15, m[6], m[7])
        _g(state, 0, 5, 10, 15, m[8], m[9])
        _g(state, 1, 6, 11, 12, m[10], m[11])
        _g(state, 2, 7, 8, 13, m[12], m[13])
        _g(state, 3, 4, 9, 14, m[14], m[15])
        return tuple(state), None

    state, _ = jax.lax.scan(round_body, tuple(state), msgs)
    return jnp.stack([state[i] ^ state[i + 8] for i in range(8)], axis=1)


def hash_single_chunk_batch(msg_blocks: jnp.ndarray, nbytes: int) -> jnp.ndarray:
    """Batched blake3(data) for equal-length inputs of ≤ 1024 bytes.

    msg_blocks: (B, n_blocks, 16) uint32 LE message words (zero-padded);
    nbytes: the true byte length (static, same for the whole batch).
    Returns (B, 8) digest words.
    """
    n_blocks = max(1, (nbytes + 63) // 64)
    assert msg_blocks.shape[1] == n_blocks and nbytes <= 1024
    cv = jnp.broadcast_to(jnp.asarray(_IV), (msg_blocks.shape[0], 8))
    for i in range(n_blocks):
        flags = (CHUNK_START if i == 0 else 0) | (
            (CHUNK_END | ROOT) if i == n_blocks - 1 else 0
        )
        block_len = min(64, nbytes - 64 * i) if nbytes > 0 else 0
        cv = compress_batch(cv, msg_blocks[:, i], 0, block_len, flags)
    return cv


def merge_pairs_batch(cvs: jnp.ndarray) -> jnp.ndarray:
    """One Merkle level: (B, 2, 8) child digests → (B, 8) parent digests.

    Equals blake3(left_bytes ‖ right_bytes): a single 64-byte root block
    (digest bytes are the LE serialization of the words, so concatenation is
    just word concatenation)."""
    msg = cvs.reshape(cvs.shape[0], 16)
    cv = jnp.broadcast_to(jnp.asarray(_IV), (cvs.shape[0], 8))
    return compress_batch(cv, msg, 0, 64, CHUNK_START | CHUNK_END | ROOT)


@partial(jax.jit, static_argnums=(1,))
def limbs16_to_msg_words(limbs: jnp.ndarray, kwords64: int) -> jnp.ndarray:
    """Serialize two's-complement 16-bit limbs into BLAKE3 message words.

    Wire format (/root/reference/src/field/int.rs:201-210): little-endian
    64-bit word order, big-endian bytes inside each word.  In 16-bit limbs:
    each 64-bit word (limbs 4i..4i+3) contributes bswap16 of limbs in
    reversed order; message words pair consecutive serialized 16-bit units
    little-endian.
    """
    b, l = limbs.shape
    assert l == 4 * kwords64
    # serialized 16-bit units, in byte-stream order
    units = []
    for w in range(kwords64):
        for j in range(3, -1, -1):
            limb = limbs[:, 4 * w + j]
            units.append(((limb & 0xFF) << 8) | (limb >> 8))  # bswap16
    # message words: LE pairs of units
    words = []
    for k in range(0, len(units), 2):
        words.append(units[k] | (units[k + 1] << 16))
    out = jnp.stack(words, axis=1)  # (B, 2*kwords64)
    # pad to a whole number of 16-word blocks
    nbytes = 8 * kwords64
    n_blocks = max(1, (nbytes + 63) // 64)
    pad = n_blocks * 16 - out.shape[1]
    if pad:
        out = jnp.concatenate([out, jnp.zeros((b, pad), jnp.uint32)], axis=1)
    return out.reshape(b, n_blocks, 16)


def merkle_tree_device(leaf_limbs: jnp.ndarray, kwords64: int) -> list[jnp.ndarray]:
    """Build full Merkle layers for a batch of rows at once.

    leaf_limbs: (R, N, 4·kwords64) two's-complement limbs of the codeword
    elements (N a power of two).  Returns [level0 (R, N, 8), level1
    (R, N/2, 8), ..., root (R, 1, 8)] digest arrays.
    """
    r, n, l = leaf_limbs.shape
    msg = limbs16_to_msg_words(leaf_limbs.reshape(r * n, l), kwords64)
    level = hash_single_chunk_batch(msg, 8 * kwords64).reshape(r, n, 8)
    layers = [level]
    while level.shape[1] > 1:
        pairs = level.reshape(r * level.shape[1] // 2, 2, 8)
        level = merge_pairs_batch(pairs).reshape(r, -1, 8)
        layers.append(level)
    return layers
