"""Device-side Keccak-256 sponge (u32 lane pairs) + transcript primitives.

TPUs have no 64-bit integer units, so the 25 Keccak lanes live as a
(25, 2) uint32 array (lo, hi).  The permutation runs as a ``lax.scan`` over
the 24 round constants (materialized carry — safe on XLA:CPU, cheap on TPU);
rho rotations are static per lane and unroll.

This enables a fully device-resident Fiat-Shamir loop: the host exports its
transcript state once, the device absorbs round messages / squeezes
challenges for every sumcheck round in a single compiled program, and the
host re-imports the final sponge state.  Byte layouts (framing, BE field
elements, the 0x00/0x01 ratchet) match transcript.py bit-for-bit — pinned
by tests against the host oracle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_RC = np.array(
    [
        0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
        0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
        0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
        0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
        0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
        0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
    ],
    dtype=np.uint64,
)
_RC_PAIRS = np.stack([(_RC & 0xFFFFFFFF).astype(np.uint32), (_RC >> 32).astype(np.uint32)], axis=1)

_ROT = [
    0, 1, 62, 28, 27,
    36, 44, 6, 55, 20,
    3, 10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2, 61, 56, 14,
]

RATE = 136


def _rotl64(lane: jnp.ndarray, n: int) -> jnp.ndarray:
    """Rotate a (…, 2) u32 (lo, hi) pair left by n (static)."""
    lo, hi = lane[..., 0], lane[..., 1]
    n = n % 64
    if n == 0:
        return lane
    if n == 32:
        return jnp.stack([hi, lo], axis=-1)
    if n < 32:
        new_lo = (lo << n) | (hi >> (32 - n))
        new_hi = (hi << n) | (lo >> (32 - n))
    else:
        m = n - 32
        new_lo = (hi << m) | (lo >> (32 - m)) if m else hi
        new_hi = (lo << m) | (hi >> (32 - m)) if m else lo
    return jnp.stack([new_lo, new_hi], axis=-1)


def keccak_f1600_device(state: jnp.ndarray) -> jnp.ndarray:
    """In: (25, 2) uint32 lanes (lo, hi); out: permuted state."""

    def round_body(s, rc):
        c = [s[0 + x] ^ s[5 + x] ^ s[10 + x] ^ s[15 + x] ^ s[20 + x] for x in range(5)]
        d = [c[(x + 4) % 5] ^ _rotl64(c[(x + 1) % 5], 1) for x in range(5)]
        s = jnp.stack([s[i] ^ d[i % 5] for i in range(25)])
        b = [None] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl64(s[x + 5 * y], _ROT[x + 5 * y])
        out = []
        for y in range(0, 25, 5):
            for x in range(5):
                out.append(b[y + x] ^ ((~b[y + (x + 1) % 5]) & b[y + (x + 2) % 5]))
        s = jnp.stack(out)
        s = s.at[0].set(s[0] ^ rc)
        return s, None

    state, _ = jax.lax.scan(round_body, state, jnp.asarray(_RC_PAIRS))
    return state


def bytes_to_lanes(data: jnp.ndarray) -> jnp.ndarray:
    """(N·8,) u8 → (N, 2) u32 little-endian lanes."""
    b = data.astype(jnp.uint32).reshape(-1, 8)
    lo = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
    hi = b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24)
    return jnp.stack([lo, hi], axis=-1)


def lanes_to_bytes(lanes: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) u32 lanes → (N·8,) u8 little-endian."""
    lo, hi = lanes[:, 0], lanes[:, 1]
    parts = [lo, lo >> 8, lo >> 16, lo >> 24, hi, hi >> 8, hi >> 16, hi >> 24]
    return (jnp.stack(parts, axis=-1) & 0xFF).astype(jnp.uint8).reshape(-1)


class DeviceSponge:
    """Keccak-256 sponge with trace-time (static) buffer positions.

    State is a pair of traced arrays (lanes (25,2) u32, buffered bytes
    (RATE,) u8); the buffer fill level is a Python int known at trace time —
    every absorb in the sumcheck loop has a static size, so block boundaries
    resolve during tracing.  Mirrors hashing/keccak.py bit-for-bit.
    """

    def __init__(self, lanes: jnp.ndarray, buf: jnp.ndarray, pos: int):
        self.lanes = lanes
        self.buf = buf
        self.pos = pos  # static

    @staticmethod
    def from_host(h) -> "DeviceSponge":
        """Import a host Keccak256/Keccak256Py running state."""
        state_words = np.zeros((25, 2), np.uint32)
        words = [int(w) for w in h._state]  # list (py) or ctypes array (native)
        for i, w in enumerate(words):
            state_words[i, 0] = w & 0xFFFFFFFF
            state_words[i, 1] = (w >> 32) & 0xFFFFFFFF
        buf = np.zeros(RATE, np.uint8)
        pending = bytes(h._buf)
        buf[: len(pending)] = np.frombuffer(pending, np.uint8)
        return DeviceSponge(jnp.asarray(state_words), jnp.asarray(buf), len(pending))

    def export_to_host(self, h, lanes_np: np.ndarray, buf_np: np.ndarray) -> None:
        """Write downloaded state back into a host hasher (same class)."""
        words = [int(lanes_np[i, 0]) | (int(lanes_np[i, 1]) << 32) for i in range(25)]
        if isinstance(h._state, list):  # pure-Python backend
            h._state = words
        else:  # native backend: ctypes c_uint64 * 25
            h._state = type(h._state)(*words)
        h._buf = bytearray(buf_np[: self.pos].tobytes())

    def absorb(self, data: jnp.ndarray) -> "DeviceSponge":
        """Absorb a (n,) u8 array with static n."""
        n = data.shape[0]
        lanes, buf, pos = self.lanes, self.buf, self.pos
        off = 0
        while n - off + pos >= RATE:  # all offsets static at trace time
            take = RATE - pos
            block = data[off : off + take]
            if pos:
                block = jnp.concatenate([buf[:pos], block])
            lanes = lanes.at[:17].set(lanes[:17] ^ bytes_to_lanes(block))
            lanes = keccak_f1600_device(lanes)
            off += take
            pos = 0
        rem = n - off
        if rem:
            buf = buf.at[pos : pos + rem].set(data[off:])
            pos += rem
        return DeviceSponge(lanes, buf, pos)

    def digest(self) -> jnp.ndarray:
        """(32,) u8 digest of the current stream (state untouched)."""
        block = jnp.zeros(RATE, jnp.uint8)
        if self.pos:
            block = block.at[: self.pos].set(self.buf[: self.pos])
        block = block.at[self.pos].set(block[self.pos] ^ 0x01)
        block = block.at[RATE - 1].set(block[RATE - 1] ^ 0x80)
        lanes = self.lanes.at[:17].set(self.lanes[:17] ^ bytes_to_lanes(block))
        lanes = keccak_f1600_device(lanes)
        return lanes_to_bytes(lanes[:4])


# ---------------------------------------------------------------------------
# dynamic-position sponge ops (for rolled Fiat-Shamir loops)
# ---------------------------------------------------------------------------
#
# The class above resolves block boundaries at TRACE time (static pos) —
# perfect for unrolled programs, but an unrolled 2^20 sumcheck FS program
# costs tens of minutes of tracing per process.  These functional twins take
# the fill level as a TRACED i32 so one lax.fori_loop round body serves
# every round: absorbs process a static upper bound of blocks and select
# the permuted state only for fully-filled blocks.  Byte semantics are
# identical to DeviceSponge (pinned by the device-FS oracle tests).


def absorb_dyn(lanes: jnp.ndarray, buf: jnp.ndarray, pos: jnp.ndarray, data: jnp.ndarray):
    """Absorb a (n,) u8 array (static n) at traced fill level pos.

    Returns (lanes, buf, pos).  buf holds the residual bytes at [0, pos);
    bytes beyond pos are unspecified (never read)."""
    n = data.shape[0]
    nmax = (n + RATE - 1) // RATE + 1  # the last may straddle via the prefix
    work = jnp.zeros((nmax * RATE + RATE,), jnp.uint8)
    work = jax.lax.dynamic_update_slice(work, buf, (jnp.zeros((), jnp.int32),))
    work = jax.lax.dynamic_update_slice(work, data, (pos.astype(jnp.int32),))
    total = pos.astype(jnp.int32) + n
    for k in range(nmax):
        blk = jax.lax.dynamic_slice(work, (jnp.int32(k * RATE),), (RATE,))
        permuted = keccak_f1600_device(
            lanes.at[:17].set(lanes[:17] ^ bytes_to_lanes(blk))
        )
        full = (k + 1) * RATE <= total
        lanes = jnp.where(full, permuted, lanes)
    rem = total % RATE
    buf = jax.lax.dynamic_slice(work, (total - rem,), (RATE,))
    return lanes, buf, rem


def digest_dyn(lanes: jnp.ndarray, buf: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """(32,) u8 digest at traced fill level pos (state untouched)."""
    idx = jnp.arange(RATE, dtype=jnp.int32)
    block = jnp.where(idx < pos, buf, jnp.uint8(0))
    block = block ^ jnp.where(idx == pos, jnp.uint8(0x01), jnp.uint8(0))
    block = block.at[RATE - 1].set(block[RATE - 1] ^ jnp.uint8(0x80))
    lanes2 = keccak_f1600_device(lanes.at[:17].set(lanes[:17] ^ bytes_to_lanes(block)))
    return lanes_to_bytes(lanes2[:4])
