"""Device ℤ→Z_q projection (the FieldMap of the TPU tier).

Maps 64-bit signed witness integers to Montgomery residues entirely on
device: for q > 2^64, a value v = u − 2^64·s (two's complement, s the sign
bit) satisfies v ≡ u + s·((−2^64) mod q) (mod q) with the right side < 2q,
so one conditional subtraction and one Montgomery multiply by R² finish the
job.  Wider integers go through the generic limb path (mod_reduce_wide).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import FieldConfig
from ..fields.limbs import cond_sub, i64_to_limbs, int_to_limbs
from ..fields.montgomery import (
    DeviceField,
    add_limbs,
    device_field,
    mod_reduce_wide,
    mont_mul,
)


@lru_cache(maxsize=32)
def _neg_2_64_mod_q(modulus: int, n16: int) -> np.ndarray:
    return int_to_limbs((-(1 << 64)) % modulus, n16)


@partial(jax.jit, static_argnums=0)
def _i64_limbs_to_field(ctx: DeviceField, u4: jnp.ndarray, sign: jnp.ndarray) -> jnp.ndarray:
    """u4: (B, 4) limbs of |two's complement u64 view|; sign: (B,) 0/1."""
    l = ctx.n16
    u = jnp.zeros(u4.shape[:-1] + (l,), jnp.uint32).at[..., :4].set(u4)
    corr = jnp.asarray(_neg_2_64_mod_q(ctx.modulus, l))
    corrected = add_limbs(u, corr * sign[..., None], l + 1)
    corrected = cond_sub(corrected, jnp.asarray(np.concatenate([ctx.q, np.zeros(1, np.uint32)])))
    v = corrected[..., :l]
    return mont_mul(ctx, v, jnp.asarray(ctx.r2))


def i64_to_field_device(cfg: FieldConfig, values: np.ndarray) -> jnp.ndarray:
    """int64 numpy array (B,) → (B, L) Montgomery residues on device."""
    assert cfg.q > (1 << 64), "fast i64 path requires q > 2^64"
    ctx = device_field(cfg)
    u4 = jnp.asarray(i64_to_limbs(values, 4))
    sign = jnp.asarray((values < 0).astype(np.uint32))
    return _i64_limbs_to_field(ctx, u4, sign)


@partial(jax.jit, static_argnums=0)
def _wide_to_field(ctx: DeviceField, limbs: jnp.ndarray, sign: jnp.ndarray) -> jnp.ndarray:
    """General signed-magnitude path: |v| as (B, W) limbs, sign (B,) 0/1.

    Accepts narrower limb dtypes (u16) to keep host→device transfers small;
    the arithmetic runs in uint32.
    """
    from ..fields.montgomery import mont_neg

    limbs = limbs.astype(jnp.uint32)
    v = mod_reduce_wide(ctx, limbs)
    m = mont_mul(ctx, v, jnp.asarray(ctx.r2))
    return jnp.where(sign[..., None].astype(bool), mont_neg(ctx, m), m)


def ints_to_field_device(cfg: FieldConfig, values: list[int]) -> jnp.ndarray:
    """Arbitrary Python ints → Montgomery residues (host packing + device map)."""
    from ..fields.limbs import ints_to_limbs

    ctx = device_field(cfg)
    mags = [abs(v) for v in values]
    width = max(cfg.n16, (max(mags).bit_length() + 15) // 16 if mags else 1)
    limbs = jnp.asarray(ints_to_limbs(mags, width))
    sign = jnp.asarray(np.array([1 if v < 0 else 0 for v in values], np.uint32))
    return _wide_to_field(ctx, limbs, sign)
