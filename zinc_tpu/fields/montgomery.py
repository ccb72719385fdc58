"""Batched Montgomery field arithmetic on 16-bit-limb arrays (device tier).

The scalar semantics are identical to the host `FieldConfig` path (same
Montgomery radix R = 2^(64·n64) — wire-visible); this module vectorizes them
over arbitrary leading batch dimensions for the prover's hot loops.

REDC here is the *big-factor* variant: with N' = −q^{−1} mod R computed once,

    m = (T mod R)·N' mod R,   result = (T + m·q) / R  (< 2q, one cond-sub)

— two lazy-column multiplies and two carry sweeps, with no per-limb
sequential dependency, unlike CIOS.  That trades a few extra lane products
for full vectorization, which is the right trade on a TPU's VPU.

All ops are jit-compatible pure functions of (ctx, arrays).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .config import FieldConfig
from .limbs import (
    add_limbs,
    carry_sweep,
    cond_sub,
    int_to_limbs,
    mul_columns,
    reduce_mod,
    sub_limbs,
)


@dataclass(frozen=True)
class DeviceField:
    """Device-resident constants for one field config."""

    q: "np.ndarray"  # (L,) modulus limbs
    nprime: "np.ndarray"  # (L,) −q^{−1} mod 2^(16L)
    r2: "np.ndarray"  # (L,) R² mod q (Montgomery entry)
    one: "np.ndarray"  # (L,) R mod q (Montgomery one)
    q_wide: "np.ndarray"  # (L+1,) q in L+1 limbs (for the REDC cond-sub)
    n16: int
    modulus: int  # python int (hashable identity)

    def __hash__(self):
        return hash((self.modulus, self.n16))

    def __eq__(self, other):
        return isinstance(other, DeviceField) and self.modulus == other.modulus


@lru_cache(maxsize=32)
def _device_field(modulus: int, n64: int) -> DeviceField:
    l16 = 4 * n64
    radix = 1 << (16 * l16)
    nprime = (-pow(modulus, -1, radix)) % radix
    r2 = pow(radix % modulus, 2, modulus)
    one = radix % modulus
    return DeviceField(
        q=int_to_limbs(modulus, l16),
        nprime=int_to_limbs(nprime, l16),
        r2=int_to_limbs(r2, l16),
        one=int_to_limbs(one, l16),
        q_wide=int_to_limbs(modulus, l16 + 1),
        n16=l16,
        modulus=modulus,
    )


def device_field(cfg: FieldConfig) -> DeviceField:
    return _device_field(cfg.q, cfg.n64)


# ---------------------------------------------------------------------------
# core ops — inputs/outputs are canonical Montgomery residues (..., L)
# ---------------------------------------------------------------------------


def mont_mul(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a·b·R^{−1} mod q for canonical residues (broadcastable batches).

    Four carry chains total: T, m, (T + m·q) fused lazily, and the final
    conditional subtract — compile cost matters as much as run cost here.
    """
    l = ctx.n16
    t = carry_sweep(mul_columns(a, b), 2 * l)  # T = a·b (< q², canonical)
    m = carry_sweep(mul_columns(t[..., :l], jnp.asarray(ctx.nprime), out_cols=l), l)
    # lazy columns of m·q plus canonical T — still far below the uint32 budget
    uc = mul_columns(m, jnp.asarray(ctx.q))  # (..., 2L) lazy
    sc = uc + jnp.broadcast_to(t, uc.shape)  # (..., 2L) lazy
    s = carry_sweep(sc, 2 * l + 2)
    res = s[..., l : 2 * l + 1]  # (..., L+1), value < 2q
    res = cond_sub(res, jnp.asarray(ctx.q_wide))
    return res[..., :l]


def mont_add(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    l = ctx.n16
    s = add_limbs(a, b, l + 1)
    s = cond_sub(s, jnp.asarray(ctx.q_wide))
    return s[..., :l]


def mont_sub(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = sub_limbs(jnp.broadcast_to(a, jnp.broadcast_shapes(a.shape, b.shape)),
                          jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape)))
    dq = add_limbs(d, jnp.asarray(ctx.q), ctx.n16)  # wrap add (mod 2^(16L))
    return jnp.where(borrow[..., None].astype(bool), dq, d)


def mont_neg(ctx: DeviceField, a: jnp.ndarray) -> jnp.ndarray:
    z = jnp.zeros_like(a)
    is_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    qd, _ = sub_limbs(jnp.broadcast_to(jnp.asarray(ctx.q), a.shape), a)
    return jnp.where(is_zero, z, qd)


def to_mont(ctx: DeviceField, v: jnp.ndarray) -> jnp.ndarray:
    """Canonical residue (< q, L limbs) → Montgomery form (×R)."""
    return mont_mul(ctx, v, jnp.asarray(ctx.r2))


def from_mont(ctx: DeviceField, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery form → canonical residue (×R^{−1})."""
    l = ctx.n16
    onev = jnp.zeros((l,), jnp.uint32).at[0].set(1)
    return mont_mul(ctx, a, onev)


def lazy_sum(ctx: DeviceField, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Exact (non-modular) sum of canonical limb arrays along an axis.

    Returns canonical limbs wide enough for the full sum (L + ceil(log2(B)/16)
    + 1 limbs); callers reduce mod q on host or via `reduce_mod`.
    Chunked so column sums stay < 2^31.
    """
    a = jnp.moveaxis(a, axis, 0)
    b = a.shape[0]
    chunk = 1 << 14
    partials = []
    for start in range(0, b, chunk):
        part = jnp.sum(a[start : start + chunk].astype(jnp.uint32), axis=0)
        partials.append(carry_sweep(part, a.shape[-1] + 2))
    total = partials[0]
    for p in partials[1:]:
        total = add_limbs(total, p)
    extra = max((b.bit_length() + 15) // 16, 2)
    return carry_sweep(total, ctx.n16 + extra)


def mod_reduce_wide(ctx: DeviceField, wide: jnp.ndarray) -> jnp.ndarray:
    """Reduce canonical limbs of any width (< 2^(16·W)) to < q, width L.

    The largest shift must keep q·2^k inside the W-limb width — a shifted
    modulus that wraps mod 2^(16W) subtracts garbage (and for sparse moduli
    like 2^255+95 the wrapped value is tiny, so the cond-sub always fires).
    k_max = 16·W − bits(q) gives q·2^k_max ∈ [2^(16W−1), 2^(16W)), which both
    fits and dominates any input, so the chain's x < 2·q·2^k invariant holds.
    """
    l = ctx.n16
    w = wide.shape[-1]
    k_max = 16 * w - ctx.modulus.bit_length()
    assert k_max >= 0, "wide input narrower than the modulus"
    shifts = []
    for k in range(k_max, -1, -1):
        shifts.append(int_to_limbs(ctx.modulus << k, w))
    q_shifted = jnp.asarray(np.stack(shifts))
    return reduce_mod(wide, q_shifted)[..., :l]
