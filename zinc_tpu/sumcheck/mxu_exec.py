"""MXU-routed sumcheck round kernels: Montgomery multiplies on the matrix unit.

The VPU round kernel (pallas_exec.py) is compute-bound on its ~12 Montgomery
multiply passes; measurement also shows its small (256-pair) grid blocks pay
heavy per-block fixed costs.  This executor reroutes the arithmetic through
the 128×128 systolic array and restructures the blocking:

* **Fold** — the per-round fold multiplies every table entry by ONE shared
  scalar r.  Multiplication by a shared bignum is a matmul against a banded
  Toeplitz matrix of its 8-bit limbs: the full REDC chain (t = r·d,
  m = t·N′ mod R, u = t + m·q — mirrored from fields/montgomery.py) becomes
  three bf16 matmuls (operands ≤ 255 are bf16-exact; per-column partial
  sums ≤ 96·255² < 2^24 are f32-exact) plus two carry sweeps.  All n_mles
  tables are flattened into one wide batch axis so each block runs ONE
  matmul chain over 8·TILE lanes.  The values produced are identical to
  ops/pallas_field.py:_mont_mul_T — same REDC algorithm, different
  multiplier engine — so proofs stay byte-identical.

* **Evaluate** — the per-point Σ_pairs Π M_j(x) combination is restructured
  into coefficient form.  Each term (c, (e, A, B)) of the comb
  (/root/reference/src/sumcheck/prover.rs:126-160) needs, per point t,
  Σ_p e_p(t)·P_p(t) with P = A·B quadratic in t.  In the basis
  {P(0), P(1), Δ_A·Δ_B} — P(t) = (1−t)·P(0) + t·P(1) + (t²−t)·Δ_A Δ_B —
  the batch sum factors into six MXU inner products
  G_{a,j} = Σ_p e_a[p]·P_j[p] contracted over the batch (256-lane chunks
  keep partial sums ≤ 256·255² < 2^24, f32-exact; chunks accumulate in
  i32), leaving only three *lazy* (unreduced) elementwise products per
  block on the VPU.  The lazy products feed the matmul directly as byte
  planes (no carry sweep); the tiny G matrices accumulate across blocks as
  three i32 byte planes, and one exact decode per round reconstructs the
  d+1 evaluations.

Byte planes are PLANE-MAJOR (sublane concatenation — a cheap copy, unlike
an interleave) with the row→position permutation baked into the static
matrices and the decode maps.

Scope: terms with 2 or 3 factors and l16 ≤ 16 (≤ 256-bit fields); anything
else falls back to the VPU executor.  Both executors are bit-identical to
the host oracle (pinned by tests).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.config import FieldConfig, Fp
from ..fields.montgomery import DeviceField, device_field
from ..ops.pallas_field import (
    _carry_sweep_T,
    _cond_sub_T,
    _const_specs,
    _ctx_consts,
    _mont_add_T,
    _mont_sub_T,
    _mul_columns_T,
    _unpack_ctx,
)
from ..poly.device import fps_to_limbs

TILE = 256  # eval pairs per grid step (fold: 2·TILE pairs/mle; 16 MB scoped-VMEM cap)
GCHUNK = 256  # G contraction chunk: 256·255² < 2^24 keeps f32 sums exact


def mxu_supported(idx_terms, l16: int) -> bool:
    """MXU path preconditions (fall back to the VPU executor otherwise)."""
    return l16 <= 16 and all(2 <= len(t) <= 3 for t in idx_terms)


def term_meta(idx_terms) -> tuple:
    """Static per-term metadata: (e_idx, rest, npj, prow)."""
    out = []
    for idxs in idx_terms:
        e, rest = idxs[0], tuple(idxs[1:])
        npj = 3 if len(rest) == 2 else 2
        prow = 96 if len(rest) == 2 else 32
        out.append((e, rest, npj, prow))
    return tuple(out)


# ---------------------------------------------------------------------------
# byte-plane helpers (limb-major (rows, W) layout, plane-major rows)
# ---------------------------------------------------------------------------


def _split8_B(x: jnp.ndarray) -> jnp.ndarray:
    """Canonical 16-bit cols (K, W) → byte planes (2K, W), plane-major
    (cheap sublane concat, no interleave): row r has 8-bit position
    2·(r mod K) + (r div K)."""
    return jnp.concatenate([x & 0xFF, x >> 8], axis=0)


def _bytes3_B(x: jnp.ndarray) -> jnp.ndarray:
    """u32 cols < 2^24 at 16-bit positions → 3 byte planes (3K, W),
    plane-major: row r has position 2·(r mod K) + (r div K)."""
    return jnp.concatenate([x & 0xFF, (x >> 8) & 0xFF, x >> 16], axis=0)


def _bytes3_pos_B(x: jnp.ndarray) -> jnp.ndarray:
    """u32 cols < 2^24 at 8-BIT positions → 3 byte planes (3K, W),
    plane-major: row r has position (r mod K) + (r div K)."""
    return jnp.concatenate([x & 0xFF, (x >> 8) & 0xFF, x >> 16], axis=0)


def _combine8_T(x: jnp.ndarray) -> jnp.ndarray:
    """Adjacent 8-bit position cols (2K, W) u32 → 16-bit cols (K, W) lazy."""
    k2, w = x.shape
    pairs = x.reshape(k2 // 2, 2, w)
    return pairs[:, 0, :] + (pairs[:, 1, :] << 8)


def _bf16(x: jnp.ndarray) -> jnp.ndarray:
    """u32 bytes (≤ 255) → bf16 exactly (route via i32: no u32↔f32 on TPU)."""
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _u32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.int32).astype(jnp.uint32)


# row→8-bit-position maps matching the helpers above (decode + matrices)


def _pos_split8(k: int) -> np.ndarray:
    r = np.arange(2 * k)
    return 2 * (r % k) + (r // k)


def _pos_bytes3(k: int) -> np.ndarray:
    r = np.arange(3 * k)
    return 2 * (r % k) + (r // k)


def _pos_bytes3_pos(k: int) -> np.ndarray:
    r = np.arange(3 * k)
    return (r % k) + (r // k)


# ---------------------------------------------------------------------------
# banded matrices for the scalar-multiplier REDC chain
# ---------------------------------------------------------------------------


def _limbs8(limbs16: np.ndarray) -> np.ndarray:
    out = np.empty(2 * limbs16.shape[0], np.int64)
    out[0::2] = limbs16 & 0xFF
    out[1::2] = limbs16 >> 8
    return out


def _banded_np(v8: np.ndarray, pos_in: np.ndarray, kout: int) -> np.ndarray:
    """M[k, r] = v8[k − pos_in[r]] where in-band, else 0 — the matmul
    computes output position k = Σ_r input_r·v8[k − pos(r)]."""
    n8 = v8.shape[0]
    m = np.zeros((kout, pos_in.shape[0]), np.float32)
    for r, p in enumerate(pos_in):
        for k in range(kout):
            if 0 <= k - p < n8:
                m[k, r] = float(v8[k - p])
    return m


@lru_cache(maxsize=8)
def _static_toeplitz(ctx: DeviceField):
    """(tmt, tqt) bf16 numpy — N′ (mod-R-truncated) and q banded matrices.

    tmt (2l, 6l): input = _bytes3_pos_B of t's low 2l 8-bit positions,
    output positions k < 2l (mod R), coefficients N′8.
    tqt (4l, 2l): input = _split8_B of canonical m, coefficients q8.
    Cached as NUMPY — jnp arrays created inside a trace would leak tracers.
    """
    import ml_dtypes

    l = ctx.n16
    np8 = _limbs8(np.asarray(ctx.nprime, np.int64))
    q8 = _limbs8(np.asarray(ctx.q, np.int64))
    tmt = _banded_np(np8, _pos_bytes3_pos(2 * l), 2 * l)
    tqt = _banded_np(q8, _pos_split8(l), 4 * l)
    return tmt.astype(ml_dtypes.bfloat16), tqt.astype(ml_dtypes.bfloat16)


def _r_toeplitz(r: jnp.ndarray, l: int) -> jnp.ndarray:
    """trt (4l, 2l) bf16 from the (traced) challenge limbs; input rows are
    _split8_B of d: trt[k, r] = r8[k − pos_split8(r)]."""
    # position-indexed 8-bit limbs of r: position 2j/2j+1 = lo/hi byte of limb j
    r8_pos = jnp.stack([r & 0xFF, r >> 8], axis=1).reshape(2 * l)
    pos = jnp.asarray(_pos_split8(l))  # positions of the INPUT rows (d planes)
    k = jax.lax.broadcasted_iota(jnp.int32, (4 * l, 2 * l), 0)
    d = k - pos[None, :].astype(jnp.int32)
    valid = (d >= 0) & (d < 2 * l)
    vals = jnp.take(r8_pos, jnp.clip(d, 0, 2 * l - 1))
    return jnp.where(valid, vals, 0).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _scalar_mont_mul_mxu(kctx, d, trt, tmt, tqt):
    """mont_mul(r, d) for a shared scalar r encoded in `trt`, limb-major
    (l, W).  Value-identical to _mont_mul_T (same REDC chain)."""
    l = kctx.n16
    d8 = _bf16(_split8_B(d))  # (2l, W)
    # t = r·d — full product as 8-bit position columns (≤ 2l·255² < 2^22)
    t8 = _u32(jnp.dot(trt, d8, preferred_element_type=jnp.float32))  # (4l, W)
    # m = (t mod R)·N′ mod R — fed by byte planes of t's low half (no sweep)
    t_bytes = _bf16(_bytes3_pos_B(t8[: 2 * l]))  # (6l, W)
    m8 = jnp.dot(tmt, t_bytes, preferred_element_type=jnp.float32)  # (2l, W) ≤ 96·255²
    m16 = _combine8_T(_u32(m8))  # (l, W) lazy ≤ 2^30.6
    m = _carry_sweep_T(m16, l)  # canonical, wrapped mod R
    # u = t + m·q (merge the two lazy 8-bit position grids, one combine)
    u8 = jnp.dot(tqt, _bf16(_split8_B(m)), preferred_element_type=jnp.float32)
    u16 = _combine8_T(_u32(u8) + t8)  # (2l, W) lazy ≤ 2^30
    s = _carry_sweep_T(u16, 2 * l + 2)
    res = _cond_sub_T(s[l : 2 * l + 1], kctx.q_wide[:, None])
    return res[:l]


def _nt_dot_chunked(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Σ_w a[:, w]·b[:, w] with 256-lane chunks (f32-exact), i32 summed."""
    w = a.shape[1]
    acc = None
    for s in range(0, w, GCHUNK):
        g = jax.lax.dot_general(
            a[:, s : s + GCHUNK], b[:, s : s + GCHUNK],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        acc = g if acc is None else acc + g
    return acc  # ≤ (W/256)·2^24


def _eval_terms_mxu(kctx, pairs, terms, l):
    """Per-term G byte planes for one block of TILE pairs.

    pairs: (n_mles, T, 2, l).  Returns per term a (2·npj, 3, 2l, prow) i32
    stack: e-side byte rows × P-side byte rows, G split into three 8-bit
    planes (plane 2 may exceed 255 after chunk summing — the decode only
    needs exact i32 planes, not bytes) for overflow-free accumulation
    across blocks.
    """
    v0c, v1c, dc, s8c = {}, {}, {}, {}

    def vv(i):
        if i not in v0c:
            v0c[i] = pairs[i, :, 0, :].T  # (l, T)
            v1c[i] = pairs[i, :, 1, :].T
        return v0c[i], v1c[i]

    def dd(i):
        if i not in dc:
            a, b = vv(i)
            dc[i] = _mont_sub_T(kctx, b, a)
        return dc[i]

    def s8(key, arr):
        if key not in s8c:
            s8c[key] = _bf16(_split8_B(arr))
        return s8c[key]

    outs = []
    for e_idx, rest, npj, prow in terms:
        e0, e1 = vv(e_idx)
        e_sides = [s8(("v0", e_idx), e0), s8(("d", e_idx), dd(e_idx))]
        if len(rest) == 1:
            y0, y1 = vv(rest[0])
            p_sides = [s8(("v0", rest[0]), y0), s8(("v1", rest[0]), y1)]
        else:
            x0, x1 = vv(rest[0])
            y0, y1 = vv(rest[1])
            p_sides = [
                _bf16(_bytes3_B(_mul_columns_T(x0, y0))),
                _bf16(_bytes3_B(_mul_columns_T(x1, y1))),
                _bf16(_bytes3_B(_mul_columns_T(dd(rest[0]), dd(rest[1])))),
            ]
        g_list = []
        for ea in e_sides:
            for pb in p_sides:
                gi = _nt_dot_chunked(ea, pb)  # (2l, prow) ≤ 4·2^24
                g_list.append(jnp.stack([gi & 0xFF, (gi >> 8) & 0xFF, gi >> 16]))
        outs.append(jnp.stack(g_list))  # (2·npj, 3, 2l, prow)
    return outs


def _g_out_shapes(terms, l: int):
    return tuple(
        jax.ShapeDtypeStruct((2 * npj, 3, 2 * l, prow), jnp.int32)
        for _, _, npj, prow in terms
    )


def _g_out_specs(terms, l: int):
    return tuple(
        pl.BlockSpec((2 * npj, 3, 2 * l, prow), lambda i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _, _, npj, prow in terms
    )


@partial(jax.jit, static_argnums=(0, 2))
def _eval_mxu(ctx: DeviceField, buf: jnp.ndarray, terms, nb):
    """Round-0 evaluation over the active prefix (nb blocks of 2·TILE)."""
    n_mles, b_max, l = buf.shape

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref = refs[5]
        g_refs = refs[6:]
        pairs = t_ref[:].reshape(n_mles, TILE, 2, l)
        gs = _eval_terms_mxu(kctx, pairs, terms, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for gr in g_refs:
                gr[:] = jnp.zeros(gr.shape, jnp.int32)

        for gr, g in zip(g_refs, gs):
            gr[:] = gr[:] + g

    return pl.pallas_call(
        kernel,
        out_shape=_g_out_shapes(terms, l),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, 2 * TILE, l), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_g_out_specs(terms, l),
        grid=(nb,),
    )(*_ctx_consts(ctx), buf)


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def _fold_eval_mxu(ctx: DeviceField, buf: jnp.ndarray, r: jnp.ndarray, terms, nb):
    """Fused round: MXU fold of the active prefix (in place, all mles
    flattened into one wide batch) + G-form eval of the folded pairs — one
    launch per round (nb blocks of 4·TILE entries per mle)."""
    n_mles, b_max, l = buf.shape
    tmt_np, tqt_np = _static_toeplitz(ctx)
    tmt, tqt = jnp.asarray(tmt_np), jnp.asarray(tqt_np)
    trt = _r_toeplitz(r, l)

    def kernel(*refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        t_ref, trt_ref, tmt_ref, tqt_ref = refs[5], refs[6], refs[7], refs[8]
        o_ref = refs[9]
        g_refs = refs[10:]
        blk = t_ref[:]  # (n_mles, 4T, l)
        # flatten all mles into one wide batch: pairs stay within each mle
        fp = blk.reshape(n_mles * 2 * TILE, 2, l)
        v0 = fp[:, 0, :].T  # (l, n·2T)
        v1 = fp[:, 1, :].T
        d = _mont_sub_T(kctx, v1, v0)
        f = _mont_add_T(
            kctx, v0,
            _scalar_mont_mul_mxu(kctx, d, trt_ref[:], tmt_ref[:], tqt_ref[:]),
        )  # (l, n·2T)
        f_rows = f.T  # (n·2T, l)
        o_ref[:] = f_rows.reshape(n_mles, 2 * TILE, l)

        pairs = f_rows.reshape(n_mles, TILE, 2, l)
        gs = _eval_terms_mxu(kctx, pairs, terms, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for gr in g_refs:
                gr[:] = jnp.zeros(gr.shape, jnp.int32)

        for gr, g in zip(g_refs, gs):
            gr[:] = gr[:] + g

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_mles, b_max, l), jnp.uint32),)
        + _g_out_shapes(terms, l),
        in_specs=_const_specs(l) + [
            pl.BlockSpec((n_mles, 4 * TILE, l), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(trt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tmt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tqt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_mles, 2 * TILE, l), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        )
        + _g_out_specs(terms, l),
        grid=(nb,),
        input_output_aliases={5: 0},
    )(*_ctx_consts(ctx), buf, trt, tmt, tqt)


# ---------------------------------------------------------------------------
# exact G decode → round evaluations
# ---------------------------------------------------------------------------


def _p_positions(npj: int, prow: int, l: int) -> np.ndarray:
    """8-bit position of each P-side row (plane-major layouts)."""
    if prow == 2 * l:  # _split8_B of canonical (l) cols
        return _pos_split8(l)
    return _pos_bytes3(2 * l)  # _bytes3_B of lazy (2l) cols


def _point_weights(npj: int, degree: int) -> np.ndarray:
    """w[t, a, j] = tᵃ·c_j(t) for the P-basis {P(0), P(1), [lead]}."""
    w = np.zeros((degree + 1, 2, npj), np.int64)
    for t in range(degree + 1):
        cj = [1 - t, t] + ([t * t - t] if npj == 3 else [])
        for a in range(2):
            for j in range(npj):
                w[t, a, j] = (t ** a) * cj[j]
    return w


def g_to_evals_host(
    cfg: FieldConfig, g_arrays, comb, terms, degree: int
) -> list[Fp]:
    """Exact host decode: G byte planes → Σ-claims at points 0..degree."""
    l = cfg.n16
    e_pos = _pos_split8(l)
    evals = [cfg.zero() for _ in range(degree + 1)]
    for (coeff, _idxs), (e_idx, rest, npj, prow), g in zip(comb, terms, g_arrays):
        g = np.asarray(g, np.int64)  # (2·npj, 3, 2l, prow)
        vals = g[:, 0] + (g[:, 1] << 8) + (g[:, 2] << 16)  # (2·npj, 2l, prow)
        p_pos = _p_positions(npj, prow, l)
        flat_pos = (e_pos[:, None] + p_pos[None, :]).ravel()
        gi = []
        for k in range(2 * npj):
            # per-position sums ≤ 96·2^42 < 2^53: exact in f64 bincount
            sums = np.bincount(flat_pos, weights=vals[k].ravel().astype(np.float64))
            total = 0
            for p, s in enumerate(sums):
                total += int(s) << (8 * p)
            gi.append(total)
        w = _point_weights(npj, degree)
        k_scale = len(rest) + 1
        for t in range(degree + 1):
            acc = 0
            for a in range(2):
                for j in range(npj):
                    acc += int(w[t, a, j]) * gi[a * npj + j]
            m = acc % cfg.q  # ≡ S_term(t)·R^k_scale
            for _ in range(k_scale - 1):
                m = cfg.mont_mul(m, 1)  # ÷R per step → S_term(t)·R
            evals[t] = evals[t] + coeff * Fp(m, cfg)
    return evals


class MxuSumcheckExecutor:
    """Drop-in for PallasSumcheckExecutor with MXU round kernels.

    Rounds with active ≥ 4·TILE run the MXU kernels; the mid tail
    (4·256 ≤ active < 4·TILE) reuses the VPU fused kernel (its fixed
    256-pair blocks keep the host tail small); below 2·256 the host oracle
    finishes — all three tiers produce identical transcripts."""

    def __init__(self, cfg: FieldConfig, tables: jnp.ndarray, degree: int, comb):
        from .pallas_exec import TILE as VTILE

        self.cfg = cfg
        self.ctx = device_field(cfg)
        self.degree = degree
        self.comb = comb
        self.idx_terms = tuple(tuple(idxs) for _, idxs in comb)
        self.terms = term_meta(self.idx_terms)
        self.coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
        one = cfg.one()
        self.kinds = tuple(
            "u" if c == one else ("n" if c == -one else "g") for c, _ in comb
        )
        self.vtile = VTILE
        self.buf = jnp.asarray(tables)
        self.active = tables.shape[1]
        self._host_mles = None

    def _demote_to_host(self) -> None:
        from ..poly.device import limbs_to_fp

        arr = np.asarray(self.buf[:, : self.active, :])
        self._host_mles = [
            [limbs_to_fp(arr[i, b], self.cfg) for b in range(self.active)]
            for i in range(arr.shape[0])
        ]
        self.buf = None

    def _host_round(self, r_prev, fold_done: bool):
        from .prover import _fold, _round_evals

        if r_prev is not None and not fold_done:
            self._host_mles = _fold(self._host_mles, r_prev)
        return _round_evals(self._host_mles, self.degree, self.comb, self.cfg)

    def round(self, r_prev):
        from .pallas_exec import _eval_fixed, _fold_eval_fixed, _fold_fixed

        if self._host_mles is not None:
            return self._host_round(r_prev, fold_done=False)
        if r_prev is None:
            if self.active >= 2 * TILE:
                gs = _eval_mxu(self.ctx, self.buf, self.terms,
                               self.active // (2 * TILE))
                return g_to_evals_host(self.cfg, gs, self.comb, self.terms,
                                       self.degree)
            if self.active >= 2 * self.vtile:
                wide = _eval_fixed(
                    self.ctx, self.buf, self.coeffs, self.degree,
                    self.idx_terms, self.kinds, self.active // (2 * self.vtile),
                )
                return self._decode_wide(wide)
            self._demote_to_host()
            return self._host_round(None, fold_done=True)
        r = jnp.asarray(fps_to_limbs([r_prev], self.cfg)[0])
        if self.active >= 4 * TILE:
            out = _fold_eval_mxu(self.ctx, self.buf, r, self.terms,
                                 self.active // (4 * TILE))
            self.buf = out[0]
            self.active //= 2
            return g_to_evals_host(self.cfg, out[1:], self.comb, self.terms,
                                   self.degree)
        if self.active >= 4 * self.vtile:
            self.buf, wide = _fold_eval_fixed(
                self.ctx, self.buf, r, self.coeffs, self.degree,
                self.idx_terms, self.kinds, self.active // (4 * self.vtile),
            )
            self.active //= 2
            return self._decode_wide(wide)
        self.buf = _fold_fixed(self.ctx, self.buf, r, self.active // (2 * self.vtile))
        self.active //= 2
        self._demote_to_host()
        return self._host_round(r_prev, fold_done=True)

    def _decode_wide(self, wide) -> list[Fp]:
        from ..fields.limbs import limbs_to_int

        wide = np.asarray(wide)
        return [
            self.cfg.fp_from_mont(limbs_to_int(wide[t]) % self.cfg.q)
            for t in range(wide.shape[0])
        ]

    def final_fold(self, r):
        if self._host_mles is not None:
            from .prover import _fold

            self._host_mles = _fold(self._host_mles, r)
            return self._host_mles
        from .pallas_exec import _fold_fixed

        rl = jnp.asarray(fps_to_limbs([r], self.cfg)[0])
        self.buf = _fold_fixed(self.ctx, self.buf, rl, self.active // (2 * self.vtile))
        self.active //= 2
        return self.buf

    def final_values(self):
        from ..poly.device import limbs_to_fp

        if self._host_mles is not None:
            assert all(len(m) == 1 for m in self._host_mles)
            return [m[0] for m in self._host_mles]
        arr = np.asarray(self.buf[:, :1, :])
        return [limbs_to_fp(arr[i, 0], self.cfg) for i in range(arr.shape[0])]
