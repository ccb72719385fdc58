"""Limb-array primitives: big integers as (..., L) uint32 arrays of 16-bit limbs.

This is the data layout of every device-resident number in the framework:
little-endian 16-bit limbs, one per uint32 lane.  16-bit limbs are chosen for
TPU: there are no 64-bit scalar units, and 16×16→32-bit products fit a uint32
lane exactly ((2^16−1)² < 2^32).

Design for XLA/TPU:

* **Multiplication is a matmul.**  The lo/hi halves of the outer product of
  limb vectors are contracted against a precomputed 0/1 anti-diagonal tensor
  (``i+j == k``), i.e. a (La·Lb) × K matmul — MXU work, and a handful of HLO
  ops instead of O(L²) unrolled scalar updates.
* **Carry propagation is a ``lax.scan``** over the (static, tiny) limb axis —
  sequential by nature, but O(1) traced ops, so kernels that chain many
  multiplies stay cheap to trace and compile.

Host↔device packing helpers (numpy) live at the bottom.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MASK16 = jnp.uint32(0xFFFF)


@lru_cache(maxsize=64)
def _antidiag(la: int, lb: int, nc: int, shift: int) -> np.ndarray:
    """(La*Lb, nc) 0/1 matrix with m[i*Lb+j, k] = 1 iff i+j+shift == k."""
    m = np.zeros((la * lb, nc), dtype=np.uint32)
    for i in range(la):
        for j in range(lb):
            k = i + j + shift
            if k < nc:
                m[i * lb + j, k] = 1
    return m


def mul_columns(a: jnp.ndarray, b: jnp.ndarray, out_cols: int | None = None) -> jnp.ndarray:
    """Lazy-column product of two canonical limb arrays.

    a: (..., La), b: (..., Lb) → (..., out_cols) lazy columns (default La+Lb).
    Column values ≤ min(La,Lb)·2^17 — callers keep La+Lb small enough that a
    uint32 lane never overflows (true for every width in this system).
    """
    la, lb = a.shape[-1], b.shape[-1]
    nc = out_cols if out_cols is not None else la + lb
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    outer = (a[..., :, None] * b[..., None, :]).reshape(batch + (la * lb,))
    # Contract the anti-diagonals in f32: lo/hi < 2^16 and column sums < 2^24,
    # so every value is exactly representable; on TPU this is an MXU matmul,
    # and it compiles orders of magnitude faster than an integer GEMM.
    lo = (outer & MASK16).astype(jnp.float32)
    hi = (outer >> 16).astype(jnp.float32)
    m_lo = jnp.asarray(_antidiag(la, lb, nc, 0).astype(np.float32))
    m_hi = jnp.asarray(_antidiag(la, lb, nc, 1).astype(np.float32))
    cols = jnp.matmul(lo, m_lo, preferred_element_type=jnp.float32) + jnp.matmul(
        hi, m_hi, preferred_element_type=jnp.float32
    )
    return cols.astype(jnp.uint32)


def carry_sweep(cols: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Normalize lazy columns (each < 2^32 − 2^16) into canonical 16-bit limbs.

    cols: (..., K) uint32; returns (..., N) canonical limbs, N = out_limbs or
    K+1.  Value is truncated mod 2^(16N) (two's-complement wrap semantics).
    """
    k = cols.shape[-1]
    n = out_limbs if out_limbs is not None else k + 1
    if n > k:
        cols = jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (n - k,), cols.dtype)], axis=-1
        )
    else:
        cols = cols[..., :n]
    x = jnp.moveaxis(cols, -1, 0)

    def body(carry, col):
        v = carry + col
        return v >> 16, v & MASK16

    _, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    return jnp.moveaxis(limbs, 0, -1)


def add_limbs(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Exact sum of canonical limb arrays (wrap at out_limbs if given)."""
    la, lb = a.shape[-1], b.shape[-1]
    n = max(la, lb)
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    av = jnp.zeros(batch + (n,), jnp.uint32).at[..., :la].add(a)
    av = av.at[..., :lb].add(b)
    return carry_sweep(av, out_limbs if out_limbs is not None else n + 1)


def sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a − b with borrow chain; returns (limbs mod 2^(16L), borrow 0/1)."""
    l = a.shape[-1]
    assert b.shape[-1] == l
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    av = jnp.broadcast_to(a, batch + (l,))
    bv = jnp.broadcast_to(b, batch + (l,))
    x = jnp.moveaxis(av, -1, 0)
    y = jnp.moveaxis(bv, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        v = ai - bi - borrow
        return (v >> 31) & 1, v & MASK16

    borrow, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), (x, y))
    return jnp.moveaxis(limbs, 0, -1), borrow


def geq_limbs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b elementwise over the batch (canonical limbs, equal width)."""
    _, borrow = sub_limbs(a, b)
    return borrow == 0


def cond_sub(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """a − m where a ≥ m, else a (canonical limbs; m broadcastable)."""
    diff, borrow = sub_limbs(a, jnp.broadcast_to(m, a.shape))
    return jnp.where((borrow == 0)[..., None], diff, a)


def reduce_mod(wide: jnp.ndarray, q_shifted: jnp.ndarray) -> jnp.ndarray:
    """Reduce canonical limbs mod q by conditional subtraction of shifted q.

    q_shifted: (S, W) canonical limbs of q·2^k from largest shift down to
    k=0, widths equal to wide.  Correct when wide < 2·q·2^(k_max).
    """

    def body(x, qs):
        return cond_sub(x, qs), None

    x, _ = jax.lax.scan(body, wide, q_shifted)
    return x


# ---------------------------------------------------------------------------
# host ↔ device packing (numpy, outside jit)
# ---------------------------------------------------------------------------


def ints_to_limbs(values, nlimbs: int) -> np.ndarray:
    """Python ints (any sign) → (B, nlimbs) uint32 two's-complement limbs."""
    width = 1 << (16 * nlimbs)
    out = np.empty((len(values), nlimbs), dtype=np.uint32)
    for i, v in enumerate(values):
        u = v % width
        for j in range(nlimbs):
            out[i, j] = (u >> (16 * j)) & 0xFFFF
    return out


def int_to_limbs(value: int, nlimbs: int) -> np.ndarray:
    return ints_to_limbs([value], nlimbs)[0]


def limbs_to_int(limbs) -> int:
    """(L,) limbs → non-negative Python int."""
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(arr[j]) << (16 * j) for j in range(arr.shape[-1]))


def limbs_to_ints(limbs) -> list[int]:
    arr = np.asarray(limbs)
    return [limbs_to_int(arr[i]) for i in range(arr.shape[0])]


def i64_to_limbs(values: np.ndarray, nlimbs: int) -> np.ndarray:
    """Vectorized: int64 numpy array → (B, nlimbs) two's-complement limbs."""
    u = values.astype(np.uint64)
    out = np.zeros((values.shape[0], nlimbs), dtype=np.uint32)
    sign_fill = np.where(values < 0, np.uint32(0xFFFF), np.uint32(0))
    for j in range(nlimbs):
        if j < 4:
            out[:, j] = ((u >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(np.uint32)
        else:
            out[:, j] = sign_fill
    return out
