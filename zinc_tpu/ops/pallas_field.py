"""Pallas TPU kernels for batched Montgomery field arithmetic.

The XLA path (fields/montgomery.py) materializes the (B, 256) limb outer
product and every carry intermediate in HBM — ~40 ms per 2^20-element
mont_mul on one chip, memory-bound.  These kernels run the same math
(the identical limb functions, traced into the kernel) tile-by-tile in
VMEM, so HBM traffic drops to the operands + result.

The limb algebra is reused verbatim from fields/limbs.py — Kogge-Stone
carries are shifts + elementwise ops, the lazy-column contraction is an MXU
matmul from an iota-built antidiagonal mask, all Mosaic-supported.  Field
constants (q, N', q_wide) ride in as kernel inputs through a traced
DeviceField stand-in (`_KCtx`) because Pallas kernels may not capture array
constants.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import MASK16
from ..fields.montgomery import DeviceField, mont_mul

DEFAULT_TILE = 2048


@dataclass
class _KCtx:
    """DeviceField stand-in whose constant arrays are traced kernel inputs."""

    q: jnp.ndarray
    nprime: jnp.ndarray
    r2: jnp.ndarray
    one: jnp.ndarray
    q_wide: jnp.ndarray
    n16: int
    modulus: int


def _ctx_consts(ctx: DeviceField):
    """(q, nprime, r2, one, q_wide) as separate arrays — one kernel input
    each, so every constant starts at sublane/lane offset 0 (Mosaic cannot
    broadcast from a sliced, non-zero-offset vector)."""
    return (
        jnp.asarray(ctx.q), jnp.asarray(ctx.nprime), jnp.asarray(ctx.r2),
        jnp.asarray(ctx.one), jnp.asarray(ctx.q_wide),
    )


def _unpack_ctx(refs, ctx: DeviceField) -> _KCtx:
    q_ref, np_ref, r2_ref, one_ref, qw_ref = refs
    return _KCtx(
        q=q_ref[:], nprime=np_ref[:], r2=r2_ref[:], one=one_ref[:],
        q_wide=qw_ref[:], n16=ctx.n16, modulus=ctx.modulus,
    )


def _pick_tile(b: int, tile: int) -> int:
    while tile > 8 and b % tile:
        tile //= 2
    return tile if b % tile == 0 else b


# ---------------------------------------------------------------------------
# Transposed (limb-major) limb algebra: arrays are (L, T) with the limb axis
# on SUBLANES and the batch on LANES.  A (T, 16)-shaped op uses 16 of 128
# lanes (measured: a VMEM-resident mont_mul in batch-major layout is no
# faster than the XLA path); limb-major tiles use every lane, and limb
# shifts become cheap sublane pads.
# ---------------------------------------------------------------------------


def _shift_down_T(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Move limb i (axis 0) to position i+d, zeros in at the bottom."""
    pad = jnp.zeros((d,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - d]], axis=0)


def _resolve_carries_T(t: jnp.ndarray, want_carry_out: bool = False):
    """Kogge-Stone carries over axis 0 (per-position sums ≤ 2^17−1)."""
    n = t.shape[0]
    g = t >> 16
    p = ((t & MASK16) == MASK16).astype(jnp.uint32)
    d = 1
    while d < n:
        g = g | (p & _shift_down_T(g, d))
        p = p & _shift_down_T(p, d)
        d *= 2
    out = (t + _shift_down_T(g, 1)) & MASK16
    if want_carry_out:
        return out, g[n - 1]
    return out


def _carry_sweep_T(cols: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    k = cols.shape[0]
    if out_limbs > k:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_limbs - k,) + cols.shape[1:], cols.dtype)], axis=0
        )
    else:
        cols = cols[:out_limbs]
    return _resolve_carries_T((cols & MASK16) + _shift_down_T(cols >> 16, 1))


def _mul_columns_T(a: jnp.ndarray, b: jnp.ndarray, out_cols: int | None = None) -> jnp.ndarray:
    """Lazy columns of a·b, both (L, T) canonical; returns (nc, T)."""
    la, lb = a.shape[0], b.shape[0]
    nc = out_cols if out_cols is not None else la + lb
    acc = jnp.zeros((nc,) + a.shape[1:], jnp.uint32)

    def place(x, off):
        w = min(x.shape[0], nc - off)
        if w <= 0:
            return None
        parts = []
        if off > 0:
            parts.append(jnp.zeros((off,) + x.shape[1:], jnp.uint32))
        parts.append(x[:w])
        if nc - off - w > 0:
            parts.append(jnp.zeros((nc - off - w,) + x.shape[1:], jnp.uint32))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)

    for j in range(lb):
        p = a * b[j : j + 1]  # sublane broadcast; exact (2^16−1)² < 2^32
        lo = place(p & MASK16, j)
        if lo is not None:
            acc = acc + lo
        hi = place(p >> 16, j + 1)
        if hi is not None:
            acc = acc + hi
    return acc


def _sub_T(a: jnp.ndarray, b: jnp.ndarray):
    """a − b (both (L, T) canonical): (diff mod 2^16L, borrow (T,))."""
    t = a + (b ^ MASK16)
    t = jnp.concatenate([t[:1] + 1, t[1:]], axis=0)
    out, carry = _resolve_carries_T(t, want_carry_out=True)
    return out, carry ^ 1


def _cond_sub_T(a: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    diff, borrow = _sub_T(a, jnp.broadcast_to(m, a.shape))
    return jnp.where((borrow == 0)[None, :], diff, a)


def _mont_mul_T(kctx: "_KCtx", a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product, limb-major (L, T) layout; mirrors mont_mul.

    Constants are broadcast to full (L, T) tiles up front so every sublane
    slice inside _mul_columns_T reads a full-width vector (Mosaic cannot
    broadcast a (1, 1) slice taken at a non-zero sublane offset).
    """
    l = kctx.n16
    width = a.shape[1]
    qb = jnp.broadcast_to(kctx.q[:, None], (l, width))
    npb = jnp.broadcast_to(kctx.nprime[:, None], (l, width))
    t = _carry_sweep_T(_mul_columns_T(a, b), 2 * l)
    m = _carry_sweep_T(_mul_columns_T(npb, t[:l], l), l)
    uc = _mul_columns_T(qb, m)  # (2L, T) lazy
    s = _carry_sweep_T(uc + t, 2 * l + 2)
    res = s[l : 2 * l + 1]
    res = _cond_sub_T(res, kctx.q_wide[:, None])
    return res[:l]


def _mont_add_T(kctx: "_KCtx", a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    l = kctx.n16
    s = _resolve_carries_T(
        jnp.concatenate([a + b, jnp.zeros((1,) + a.shape[1:], jnp.uint32)], axis=0)
    )
    return _cond_sub_T(s, kctx.q_wide[:, None])[:l]


def _mont_sub_T(kctx: "_KCtx", a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d, borrow = _sub_T(a, b)
    dq = _resolve_carries_T(d + jnp.broadcast_to(kctx.q[:, None], d.shape))
    return jnp.where((borrow != 0)[None, :], dq, d)


def _mont_neg_T(kctx: "_KCtx", a: jnp.ndarray) -> jnp.ndarray:
    """q − a (a canonical < q), with −0 = 0."""
    qd, _ = _sub_T(jnp.broadcast_to(kctx.q[:, None], a.shape), a)
    is_zero = jnp.all(a == 0, axis=0)[None, :]
    return jnp.where(is_zero, a, qd)


def _comb_terms_T(kctx, point_vals, c_ref, coeff_kinds, idx_terms, l, width):
    """Σ_k coeff_k·Π_{j∈idx_terms[k]} vals[j] for one point, limb-major.

    coeff_kinds is a static tuple per term: 'u' (coeff == 1 — skip the
    multiply), 'n' (coeff == −1 — negate instead), 'g' (generic — multiply
    by the coefficient row).  Real CCS instances use only ±1 (e.g. R1CS's
    c = [1, −1]), so the coefficient multiplies vanish from the hot loop.
    """
    comb = None
    for k, idxs in enumerate(idx_terms):
        kind = coeff_kinds[k]
        if kind == "g":
            term = jnp.broadcast_to(c_ref[k : k + 1, :].T, (l, width))
            for j in idxs:
                term = _mont_mul_T(kctx, term, point_vals[j])
        else:
            term = point_vals[idxs[0]]
            for j in idxs[1:]:
                term = _mont_mul_T(kctx, term, point_vals[j])
            if kind == "n":
                term = _mont_neg_T(kctx, term)
        comb = term if comb is None else _mont_add_T(kctx, comb, term)
    return comb


def _const_specs(l: int):
    return [
        pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((l + 1,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]


@partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray, tile: int = DEFAULT_TILE):
    """Fused Montgomery product over (B, L) canonical residues."""
    bsz, l = a.shape
    t = _pick_tile(bsz, tile)

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        a_ref, b_ref, o_ref = refs[5], refs[6], refs[7]
        o_ref[:] = mont_mul(kctx, a_ref[:], b_ref[:])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, l), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(bsz // t,),
    )(*_ctx_consts(ctx), a, b)


@partial(jax.jit, static_argnums=(0, 3))
def mont_mul_pallas_t(ctx: DeviceField, a: jnp.ndarray, b: jnp.ndarray, tile: int = DEFAULT_TILE):
    """mont_mul with limb-major in-kernel layout (transpose at tile edges)."""
    bsz, l = a.shape
    t = _pick_tile(bsz, tile)

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        a_t = refs[5][:].T  # (L, T)
        b_t = refs[6][:].T
        refs[7][:] = _mont_mul_T(kctx, a_t, b_t).T

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, l), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(bsz // t,),
    )(*_ctx_consts(ctx), a, b)


@partial(jax.jit, static_argnums=(0, 3))
def mont_fold_pallas(ctx: DeviceField, tables: jnp.ndarray, r: jnp.ndarray, tile: int = DEFAULT_TILE):
    """Sumcheck fold v0 + r·(v1−v0) over (n_mles, B, L) adjacent-paired tables."""
    n_mles, bsz, l = tables.shape
    t = _pick_tile(bsz // 2, tile)
    pairs = tables.reshape(n_mles, bsz // 2, 2, l)  # free reshape outside

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, r_ref, o_ref = refs[5], refs[6], refs[7]
        width = t
        rb = jnp.broadcast_to(r_ref[:][:, None], (l, width))
        for i in range(n_mles):
            v0 = t_ref[i, :, 0, :].T  # (l, t)
            v1 = t_ref[i, :, 1, :].T
            folded = _mont_add_T(kctx, v0, _mont_mul_T(kctx, _mont_sub_T(kctx, v1, v0), rb))
            o_ref[i, :, :] = folded.T

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_mles, bsz // 2, l), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, t, 2, l), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_mles, t, l), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        grid=(bsz // (2 * t),),
    )(*_ctx_consts(ctx), pairs, r)


def _eval_sums_width(l: int) -> int:
    return l + 4  # room for 2^64 pair-count growth


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def round_eval_pallas(
    ctx: DeviceField,
    tables: jnp.ndarray,  # (n_mles, B, L) — B pairs = B/2
    coeffs: jnp.ndarray,  # (n_terms, L)
    degree: int,
    idx_terms: tuple,
    tile: int = DEFAULT_TILE,
    coeff_kinds: tuple | None = None,
):
    """Sumcheck round evaluations: lazy wide sums of comb at points 0..degree.

    Returns (degree+1, Lw) canonical limb integers: Σ_pairs comb(vals(t)).
    The fold for non-first rounds runs separately (mont_fold_pallas); this
    kernel evaluates the CURRENT tables' adjacent pairs.
    """
    n_mles, bsz, l = tables.shape
    half = bsz // 2
    t = _pick_tile(half, tile)
    lw = _eval_sums_width(l)
    n_points = degree + 1
    kinds = coeff_kinds or ("g",) * len(idx_terms)
    pairs = tables.reshape(n_mles, half, 2, l)

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, c_ref, o_ref = refs[5], refs[6], refs[7]
        width = t
        v0s, v1s, steps = [], [], []
        for i in range(n_mles):
            v0 = t_ref[i, :, 0, :].T  # (l, t)
            v1 = t_ref[i, :, 1, :].T
            v0s.append(v0)
            v1s.append(v1)
            steps.append(_mont_sub_T(kctx, v1, v0))

        # vals per point, incrementally stepped
        point_vals = [v0s, v1s]
        cur = v1s
        for _ in range(2, degree + 1):
            cur = [_mont_add_T(kctx, cur[i], steps[i]) for i in range(n_mles)]
            point_vals.append(cur)

        parts = []
        for pv in point_vals[: n_points]:
            comb = _comb_terms_T(kctx, pv, c_ref, kinds, idx_terms, l, width)
            # lane-sum the canonical residues exactly (i32 is wide enough:
            # 2^16 · tile ≤ 2^16·2^12 < 2^31)
            s = jnp.sum(comb.astype(jnp.int32), axis=1, keepdims=True).astype(jnp.uint32)
            parts.append(s.T)  # (1, l)
        part = jnp.concatenate(parts, axis=0)  # (P, l)
        part = jnp.concatenate(
            [part, jnp.zeros((n_points, lw - l), jnp.uint32)], axis=1
        )

        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[:] = jnp.zeros((n_points, lw), jnp.uint32)

        from ..fields.limbs import carry_sweep

        o_ref[:] = carry_sweep(o_ref[:] + part, lw)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_points, lw), jnp.uint32),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, t, 2, l), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((len(idx_terms), l), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_points, lw), lambda i: (0, 0), memory_space=pltpu.VMEM),
        grid=(half // t,),
    )(*_ctx_consts(ctx), pairs, coeffs)
