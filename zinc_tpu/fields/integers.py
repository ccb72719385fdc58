"""Device signed big-integer ops for the Zip PCS (two's-complement limbs).

The Zip code path works over the N→L→K→M width ladder of 64-bit words
(/root/reference/src/traits/types.rs:202-217).  On device:

* **RAA accumulate is a per-limb cumulative sum**: prefix sums are linear, so
  summing each 16-bit limb column independently (uint32 headroom) and
  carry-sweeping once afterwards equals the sequential big-int accumulation,
  including two's-complement wraparound.
* **The proximity matvec Σᵣ coeffᵣ·Uᵣ,c is a signed-magnitude f32 matmul**:
  operands split into 8-bit limbs (products ≤ 2^16, row-chunked sums ≤ 2^22 —
  exact in f32 / MXU), anti-diagonal folds and chunk accumulation in int32,
  and one signed carry sweep to two's-complement 16-bit limbs at width M.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# plain int (weak-typed) — a jnp scalar here would initialize the XLA
# backend at IMPORT time and break jax.distributed bringup (mesh.py)
MASK16 = 0xFFFF


def sign_extend(limbs: jnp.ndarray, out_l: int) -> jnp.ndarray:
    """Two's-complement sign extension (..., L) → (..., out_l)."""
    l = limbs.shape[-1]
    assert out_l >= l
    sign = (limbs[..., -1:] >> 15) & 1
    fill = jnp.broadcast_to(sign * MASK16, limbs.shape[:-1] + (out_l - l,))
    return jnp.concatenate([limbs, fill], axis=-1)


def cumsum_wrap(limbs: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Per-limb cumulative sum with carry normalization (wrap at width).

    limbs: (..., C, L) canonical; cumsum along `axis` (the C axis).  Requires
    C ≤ 2^15 so lazy columns stay < 2^31; larger lengths are chunked.
    """
    c = limbs.shape[axis]
    if c <= 1 << 15:
        lazy = jnp.cumsum(limbs, axis=axis, dtype=jnp.uint32)
    else:
        # chunked: cumsum within chunks, then add normalized chunk offsets
        chunk = 1 << 15
        parts = []
        offset = None
        for start in range(0, c, chunk):
            seg = jax.lax.slice_in_dim(limbs, start, min(start + chunk, c), axis=axis)
            seg_cs = jnp.cumsum(seg, axis=axis, dtype=jnp.uint32)
            if offset is not None:
                seg_cs = seg_cs + offset
            # normalize the running offset so the next chunk starts canonical
            last = jax.lax.slice_in_dim(seg_cs, seg_cs.shape[axis] - 1, seg_cs.shape[axis], axis=axis)
            offset = _carry_limbs_lastaxis(last, limbs.shape[-1])
            parts.append(seg_cs)
        lazy = jnp.concatenate(parts, axis=axis)
    return _carry_limbs_lastaxis(lazy, limbs.shape[-1])


def _carry_limbs_lastaxis(lazy: jnp.ndarray, out_l: int) -> jnp.ndarray:
    """Carry-sweep the last axis (lazy uint32 columns → canonical, wrapped)."""
    x = jnp.moveaxis(lazy[..., :out_l], -1, 0)

    def body(carry, col):
        v = carry + col
        return v >> 16, v & MASK16

    _, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    return jnp.moveaxis(limbs, 0, -1)


# ---------------------------------------------------------------------------
# signed-magnitude 8-bit decomposition (host packing)
# ---------------------------------------------------------------------------


def ints_to_mag8(values: list[int], n8: int) -> tuple[np.ndarray, np.ndarray]:
    """Python ints → (|v| in 8-bit limbs (B, n8) uint32, sign (B,) int32 ±1)."""
    mags = np.empty((len(values), n8), dtype=np.uint32)
    signs = np.empty((len(values),), dtype=np.int32)
    for i, v in enumerate(values):
        signs[i] = -1 if v < 0 else 1
        u = abs(v)
        for j in range(n8):
            mags[i, j] = (u >> (8 * j)) & 0xFF
    return mags, signs


def i64_to_mag8(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized int64 → (8×8-bit magnitude limbs, sign ±1)."""
    signs = np.where(values < 0, np.int32(-1), np.int32(1))
    mags_u = np.abs(values.astype(np.int64)).astype(np.uint64)
    out = np.empty(values.shape + (8,), dtype=np.uint32)
    for j in range(8):
        out[..., j] = ((mags_u >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint32)
    return out, signs


@lru_cache(maxsize=32)
def _antidiag8(la: int, lb: int, nc: int) -> np.ndarray:
    m = np.zeros((la * lb, nc), dtype=np.int32)
    for i in range(la):
        for j in range(lb):
            if i + j < nc:
                m[i * lb + j, i + j] = 1
    return m


def combine_rows_signed(
    coeff_mag8: jnp.ndarray,  # (R, Lc8) uint32 (values ≤ 255)
    coeff_sign: jnp.ndarray,  # (R,) int32 ±1
    eval_mag8: jnp.ndarray,  # (R, C, Le8)
    eval_sign: jnp.ndarray,  # (R, C) int32 ±1
    out_limbs16: int,
) -> jnp.ndarray:
    """Σᵣ coeffᵣ·evalᵣ,c → (C, out_limbs16) two's-complement 16-bit limbs."""
    acc = combine_rows_acc(coeff_mag8, coeff_sign, eval_mag8, eval_sign, out_limbs16)
    return combine_acc_to_limbs(acc)


def combine_rows_acc(
    coeff_mag8: jnp.ndarray,
    coeff_sign: jnp.ndarray,
    eval_mag8: jnp.ndarray,
    eval_sign: jnp.ndarray,
    out_limbs16: int,
) -> jnp.ndarray:
    """The signed 8-bit-column accumulator of Σᵣ coeffᵣ·evalᵣ,c — an i32
    (C, 2·out_limbs16) grid that is LINEAR in the row set, so shards may
    compute it locally and psum before ``combine_acc_to_limbs``.

    Exactness: per-chunk f32 contraction bounded by 32·255² < 2^21 per limb
    pair; anti-diagonal fold and cross-chunk accumulation in int32.
    """
    r, c, le8 = eval_mag8.shape
    lc8 = coeff_mag8.shape[-1]
    # accept u8 magnitudes / i8 signs (small host→device transfers)
    coeff_mag8 = coeff_mag8.astype(jnp.uint32)
    coeff_sign = coeff_sign.astype(jnp.int32)
    eval_mag8 = eval_mag8.astype(jnp.uint32)
    eval_sign = eval_sign.astype(jnp.int32)
    n8 = 2 * out_limbs16
    ad = jnp.asarray(_antidiag8(lc8, le8, n8).astype(np.float32))
    chunk = 32
    acc = jnp.zeros((c, n8), jnp.int32)
    for start in range(0, r, chunk):
        cm = (
            coeff_mag8[start : start + chunk].astype(jnp.int32)
            * coeff_sign[start : start + chunk, None]
        ).astype(jnp.float32)  # (r', Lc8) signed
        em = (
            eval_mag8[start : start + chunk].astype(jnp.int32)
            * eval_sign[start : start + chunk, :, None]
        ).astype(jnp.float32)  # (r', C, Le8) signed
        # G[c, i, j] = Σ_r cm[r,i]·em[r,c,j]  — |G| ≤ 32·255² < 2^21, f32-exact
        # precision='highest' forces true-f32 MXU passes: the TPU default is
        # bf16 multiplies, which silently truncate these exact integers
        g = jnp.einsum(
            "ri,rcj->cij", cm, em,
            preferred_element_type=jnp.float32, precision="highest",
        )
        cols = jnp.matmul(
            g.reshape(c, lc8 * le8), ad,
            preferred_element_type=jnp.float32, precision="highest",
        )  # (C, n8), |cols| ≤ 8·2^21 = 2^24 — f32-exact
        acc = acc + cols.astype(jnp.int32)
    return acc


def combine_acc_to_limbs(acc: jnp.ndarray) -> jnp.ndarray:
    """i32 8-bit-column accumulator (C, 2L16) → two's-complement 16-bit limbs."""
    # signed carry sweep over 8-bit positions → two's-complement 8-bit limbs
    x = jnp.moveaxis(acc, -1, 0)

    def body(carry, col):
        v = carry + col
        return v >> 8, v & 0xFF  # arithmetic shift keeps the sign in the carry

    _, limbs8 = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    limbs8 = jnp.moveaxis(limbs8, 0, -1)  # (C, n8)
    lo = limbs8[..., 0::2]
    hi = limbs8[..., 1::2]
    return (lo | (hi << 8)).astype(jnp.uint32)
