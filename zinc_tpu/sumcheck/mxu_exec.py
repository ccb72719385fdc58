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

Scope: terms with 2-4 factors and l16 ≤ 32 (≤ 512-bit fields, incl. the
384-bit class); anything else falls back to the VPU executor.  A 4-factor
term pairs its e-MLE with one P factor as a lazy-product side (ne 4), so
the same bilinear G contraction covers cubic P sides.  Both executors are
bit-identical to the host oracle (pinned by tests).
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
    _const_specs,
    _ctx_consts,
    _mont_sub_T,
    _mul_columns_T,
    _unpack_ctx,
)
from ..poly.device import fps_to_limbs

import os as _os

# eval pairs per grid step (fold: 2·TILE pairs/mle).  256 fits the default
# 16 MB scoped-VMEM cap; larger tiles cut grid-step overhead and raise their
# own per-kernel VMEM budget via _mxu_params() (no libtpu flag needed) —
# override via ZINC_TPU_MXU_TILE (values are proof-identical; only the
# blocking changes).  Measured r4 @2^20: 256→5.68 ms, 512→(fold 4.62),
# 1024→4.83 ms full round.
TILE = int(_os.environ.get("ZINC_TPU_MXU_TILE", "256"))
GCHUNK = 256  # G contraction chunk: 256·255² < 2^24 keeps f32 sums exact


def _mxu_params():
    """Per-kernel scoped-VMEM budget for the MXU kernels.  Tiles above the
    default need more than Mosaic's 16 MB scoped-VMEM cap; the per-kernel
    ``vmem_limit_bytes`` compiler param replaces the process-wide
    ``--xla_tpu_scoped_vmem_limit_kib`` libtpu flag (measured r4: TILE=1024
    cuts the 2^20 round 5.68 → 4.83 ms, ~128 KiB VMEM per tile step)."""
    if TILE <= 256:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(TILE * 131072, 128 * 1024 * 1024)
    )


def mxu_supported(idx_terms, l16: int) -> bool:
    """MXU path preconditions (fall back to the VPU executor otherwise).

    Field widths: any l16 ≤ 32 (≤ 512-bit).  Exactness bounds scale with
    l — the REDC byte-plane dot sums ≤ 6l·255² < 2^24 hold to l = 43, the
    fused-fold dot ≤ (4l+2)·255² to l = 64, and the G contraction is
    l-independent (256-lane chunks) — so 32 is conservative.
    Terms: 2-4 factors (1-3 P-side factors; a 4-factor term pairs the
    e-MLE with one P factor as a lazy product side — see term_meta)."""
    return l16 <= 32 and all(2 <= len(t) <= 4 for t in idx_terms)


def term_meta(idx_terms, l: int = 16) -> tuple:
    """Static per-term metadata: (e_idx, rest, npj, prow, ne, erow).

    npj/prow: P-side basis size and byte-plane rows; ne/erow: e-side basis
    size and rows.  1 P factor: P basis {P(0), P(1)} canonical (prow 2l);
    2 P factors: {P(0), P(1), ΔΔ} lazy products (prow 6l).  3 P factors:
    the LAST P factor C joins the e side as lazy products
    {e₀C₀, e₀ΔC, Δe·C₀, Δe·ΔC} (ne 4, erow 6l) against the first two
    factors' quadratic basis — the G contraction machinery is unchanged."""
    out = []
    for idxs in idx_terms:
        e, rest = idxs[0], tuple(idxs[1:])
        if len(rest) == 1:
            npj, prow = 2, 2 * l
        else:
            npj, prow = 3, 6 * l
        if len(rest) == 3:
            ne, erow = 4, 6 * l
        else:
            ne, erow = 2, 2 * l
        out.append((e, rest, npj, prow, ne, erow))
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


def _one_minus_limbs(ctx: DeviceField, r: jnp.ndarray) -> jnp.ndarray:
    """â = (1̂ − r̂) mod q on (l,) canonical Montgomery limbs (traced)."""
    from ..fields.limbs import add_limbs, cond_sub, sub_limbs

    qr, _ = sub_limbs(jnp.asarray(ctx.q), r)  # q − r̂, no borrow (r̂ < q)
    a = add_limbs(jnp.asarray(ctx.one), qr, out_limbs=ctx.n16 + 1)
    return cond_sub(a, jnp.asarray(ctx.q_wide))[: ctx.n16]


def _rr_toeplitz(a: jnp.ndarray, r: jnp.ndarray, l: int) -> jnp.ndarray:
    """Stacked fold matrix trt2 (4l, 4l) = [T(â) | T(r̂)]: columns 0..2l−1
    multiply v0's byte planes by â, columns 2l..4l−1 multiply v1's by r̂."""
    return jnp.concatenate([_r_toeplitz(a, l), _r_toeplitz(r, l)], axis=1)


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


def _redc_tail_T(u16: jnp.ndarray, q_wide: jnp.ndarray, l: int, kmax: int) -> jnp.ndarray:
    """REDC tail in ONE Kogge-Stone sweep: lazy u (value < (kmax+1)·q·R,
    u ≡ 0 mod R) → canonical (u/R) mod q on l limbs.

    The candidates u − k·qR for k = 0..kmax ride lane-stacked through a
    single carry resolution (two's complement of k·q aligned at limb l,
    i.e. adding k·2^{N'} − k·qR with N' = 16·(2l+2)); one extra spill limb
    carries the exact overflow count, so candidate k's spill is
    (u − k·qR + k·2^{N'}) ≫ N' = k when u ≥ k·qR and k−1 otherwise.  The
    LARGEST k whose spill equals k yields the reduced quotient.  Replaces
    resolve-u + kmax sequential conditional subtractions (3 sweeps → 1 in
    the fused fold; kmax=1 suffices when the caller guarantees u < 2qR)."""
    from ..ops.pallas_field import MASK16, _resolve_carries_T, _shift_down_T

    rows = 2 * l + 2
    w = u16.shape[1]
    u = u16[:rows]
    if u16.shape[0] < rows:
        u = jnp.concatenate(
            [u16, jnp.zeros((rows - u16.shape[0], w), jnp.uint32)], axis=0
        )
    qw = q_wide.reshape(-1)  # (l+1,)
    # ñ = two's complement of q over l+2 limbs (so k·2^{16(l+2)} overflows
    # into the spill limb when subtracting k·q at offset l)
    nq = jnp.concatenate([qw ^ MASK16, jnp.full((1,), MASK16, jnp.uint32)])
    cands = []
    for k in range(kmax + 1):
        if k == 0:
            cands.append(u)
            continue
        addend = k * nq  # lazy, ≤ kmax·(2^16−1) < 2^18
        addend = jnp.concatenate([addend[:1] + k, addend[1:]])  # +k: ~q·k + k = −k·q
        shifted = jnp.concatenate(
            [jnp.zeros((l, w), jnp.uint32), jnp.broadcast_to(addend[:, None], (l + 2, w))],
            axis=0,
        )
        cands.append(u + shifted)
    x = jnp.concatenate(cands, axis=1)  # (2l+2, (kmax+1)·W)
    x = jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], jnp.uint32)], axis=0)
    x = (x & MASK16) + _shift_down_T(x >> 16, 1)  # ≤ 2^16+2^15: resolver-safe
    out = _resolve_carries_T(x)
    res = out[l : 2 * l + 1, :w]  # k = 0 quotient (u/R, < (kmax+1)·q)
    for k in range(1, kmax + 1):
        dk = out[l : 2 * l + 1, k * w : (k + 1) * w]
        sk = out[2 * l + 2, k * w : (k + 1) * w]  # exact spill count
        res = jnp.where((sk == k)[None, :], dk, res)  # u ≥ k·qR → take u−k·qR
    return res[:l]


def _scalar_fold_mxu(kctx, v0, v1, trt2, tmt, tqt):
    """Fused fold v0 + mont_mul(r, v1 − v0) as ONE shared REDC chain.

    Identity: with r̂ the challenge's Montgomery representation and
    â = (1̂ − r̂) mod q, the fold value equals REDC(â·v0 + r̂·v1): both are
    the canonical residue of v0 + r̂·R⁻¹·(v1 − v0).  The combined product
    t = â·v0 + r̂·v1 rides in as one banded matmul against the stacked
    Toeplitz `trt2` = [T(â) | T(r̂)] (per-column sums ≤ (4l+2)·255², under
    the f32 integer-exactness bound 2^24 for every supported l ≤ 64), and
    the v2 chain's separate mont_sub (2 sweeps) and mont_add (2 sweeps)
    vanish — 7 Kogge-Stone sweeps per block → 4 → 2 (resolve-u and both
    conditional subtractions fuse into one lane-stacked sweep,
    _redc_tail_T).

    Bound: u = (t + m·q)/R ≤ q + 2(q−1)²/R < 3q for ANY q < R (when
    q ≤ R/2 even u < 2q), so two conditional subtractions canonicalize.
    """
    l = kctx.n16
    d8 = jnp.concatenate([_split8_B(v0), _split8_B(v1)], axis=0)  # (4l, W)
    t8 = _u32(jnp.dot(trt2, _bf16(d8), preferred_element_type=jnp.float32))  # (4l, W)
    t_bytes = _bf16(_bytes3_pos_B(t8[: 2 * l]))  # (6l, W)
    m8 = jnp.dot(tmt, t_bytes, preferred_element_type=jnp.float32)
    m16 = _combine8_T(_u32(m8))
    m = _carry_sweep_T(m16, l)  # sweep 1
    u8 = jnp.dot(tqt, _bf16(_split8_B(m)), preferred_element_type=jnp.float32)
    u16 = _combine8_T(_u32(u8) + t8)
    # sweep 2: ÷R + mod q.  u ≤ q + 2(q−1)²/R: < 2q when q ≤ R/2 (one
    # lane-stacked candidate suffices — a third of the tail-sweep width
    # saved), < 3q otherwise — chosen per field at trace time (r4).
    kmax = 1 if 2 * kctx.modulus <= (1 << (16 * l)) else 2
    return _redc_tail_T(u16, kctx.q_wide, l, kmax=kmax)


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


def _g_out_shapes(terms, l: int):
    return tuple(
        jax.ShapeDtypeStruct((ne * npj, 3, erow, prow), jnp.int32)
        for _, _, npj, prow, ne, erow in terms
    )


# ---------------------------------------------------------------------------
# exact G decode → round evaluations
# ---------------------------------------------------------------------------


def _p_positions(npj: int, prow: int, l: int) -> np.ndarray:
    """8-bit position of each P-side row (plane-major layouts)."""
    if prow == 2 * l:  # _split8_B of canonical (l) cols
        return _pos_split8(l)
    return _pos_bytes3(2 * l)  # _bytes3_B of lazy (2l) cols


_E_EXPS = {1: (0,), 2: (0, 1), 4: (0, 1, 1, 2)}  # t-exponent per e-basis row:
# ne=2 is {e₀, Δe}; ne=4 the lazy pairs {e₀C₀, e₀ΔC, Δe·C₀, Δe·ΔC}.


def _point_weights(ne: int, npj: int, degree: int) -> np.ndarray:
    """w[t, k, j] = t^exp[k]·c_j(t) for e-basis row k and P-basis row j."""
    exps = _E_EXPS[ne]
    w = np.zeros((degree + 1, ne, npj), np.int64)
    for t in range(degree + 1):
        cj = [1 - t, t] + ([t * t - t] if npj == 3 else [])
        for k in range(ne):
            for j in range(npj):
                w[t, k, j] = (t ** exps[k]) * cj[j]
    return w


def _e_positions(erow: int, l: int) -> np.ndarray:
    """8-bit position of each e-side row (canonical or lazy-product rows)."""
    if erow == 2 * l:  # _split8_B of canonical (l) cols
        return _pos_split8(l)
    return _pos_bytes3(2 * l)  # _bytes3_B of lazy (2l) cols


def _g_term_evals_host(cfg: FieldConfig, g, meta, coeff: Fp, degree: int) -> list[Fp]:
    """Exact host decode of ONE term: G byte planes → [coeff·S_term(t)]
    for t = 0..degree.  ``meta`` = (rest, npj, prow, ne, erow) — the shared
    body of the classic and Gruen decoders."""
    rest, npj, prow, ne, erow = meta
    l = cfg.n16
    g = np.asarray(g, np.int64)  # (ne·npj, 3, erow, prow)
    vals = g[:, 0] + (g[:, 1] << 8) + (g[:, 2] << 16)  # (ne·npj, erow, prow)
    e_pos = _e_positions(erow, l)
    p_pos = _p_positions(npj, prow, l)
    flat_pos = (e_pos[:, None] + p_pos[None, :]).ravel()
    gi = []
    for k in range(ne * npj):
        # per-position sums ≤ 288·2^42 < 2^53: exact in f64 bincount
        sums = np.bincount(flat_pos, weights=vals[k].ravel().astype(np.float64))
        total = 0
        for p, s in enumerate(sums):
            total += int(s) << (8 * p)
        gi.append(total)
    w = _point_weights(ne, npj, degree)
    k_scale = len(rest) + 1
    out = []
    for t in range(degree + 1):
        acc = 0
        for a in range(ne):
            for j in range(npj):
                acc += int(w[t, a, j]) * gi[a * npj + j]
        m = acc % cfg.q  # ≡ S_term(t)·R^k_scale
        for _ in range(k_scale - 1):
            m = cfg.mont_mul(m, 1)  # ÷R per step → S_term(t)·R
        out.append(coeff * Fp(m, cfg))
    return out


def g_to_evals_host(
    cfg: FieldConfig, g_arrays, comb, terms, degree: int
) -> list[Fp]:
    """Exact host decode: G byte planes → Σ-claims at points 0..degree."""
    evals = [cfg.zero() for _ in range(degree + 1)]
    for (coeff, _idxs), meta, g in zip(comb, terms, g_arrays):
        for t, v in enumerate(_g_term_evals_host(cfg, g, meta[1:], coeff, degree)):
            evals[t] = evals[t] + v
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
        self.terms = term_meta(self.idx_terms, cfg.n16)
        self.coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
        one = cfg.one()
        self.kinds = tuple(
            "u" if c == one else ("n" if c == -one else "g") for c, _ in comb
        )
        self.vtile = VTILE
        b = tables.shape[1]
        if b >= 2 * TILE:
            self.buf_lm = _to_lm(jnp.asarray(tables), b)
            self.buf = None
        else:
            self.buf_lm = None
            self.buf = jnp.asarray(tables)
        self.active = b
        self._host_mles = None

    def _leave_lm(self) -> None:
        """Bit-un-reverse + transpose the small remainder for the VPU tier."""
        if self.buf_lm is not None:
            self.buf = _from_lm(self.buf_lm, self.active)
            self.buf_lm = None

    def _demote_to_host(self) -> None:
        from ..poly.device import limbs_to_fp

        self._leave_lm()
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
            if self.buf_lm is not None:
                gs = _eval_lm(self.ctx, self.buf_lm, self.terms,
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
        if self.buf_lm is not None and self.active >= 4 * TILE:
            self.buf_lm = _fold_lm(self.ctx, self.buf_lm, r,
                                   self.active // (4 * TILE))
            self.active //= 2
            gs = _eval_lm(self.ctx, self.buf_lm, self.terms,
                          self.active // (2 * TILE))
            return g_to_evals_host(self.cfg, gs, self.comb, self.terms,
                                   self.degree)
        self._leave_lm()
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

        self._leave_lm()
        rl = jnp.asarray(fps_to_limbs([r], self.cfg)[0])
        self.buf = _fold_fixed(self.ctx, self.buf, rl, self.active // (2 * self.vtile))
        self.active //= 2
        return self.buf

    def final_values(self):
        from ..poly.device import limbs_to_fp

        if self._host_mles is not None:
            assert all(len(m) == 1 for m in self._host_mles)
            return [m[0] for m in self._host_mles]
        self._leave_lm()
        arr = np.asarray(self.buf[:, :1, :])
        return [limbs_to_fp(arr[i, 0], self.cfg) for i in range(arr.shape[0])]


# ---------------------------------------------------------------------------
# v2: bit-reversed limb-major buffer — transpose-free round kernels
# ---------------------------------------------------------------------------
#
# Measurement: the fused v1 kernel spends ~half its time on per-block
# (W, l) ↔ (l, W) relayouts.  v2 stores the tables LIMB-MAJOR (n_mles, l, B)
# in BIT-REVERSED lane order: binding the storage-MSB of a bit-reversed
# table is identical to binding the logical LSB (the host oracle's pairing
# of adjacent entries 2i/2i+1), and the invariant re-establishes itself
# after every fold — the classic DIT/DIF identity.  Fold pairs are then
# (first half, second half): two contiguous lane views of the same buffer
# (the dynamic half offset rides in as a scalar-prefetch argument), so the
# kernels never transpose.  Claims are sums over all pairs — lane order
# cannot affect them — and fold VALUES are identical, so transcripts stay
# byte-identical; only the executor's demote/final paths un-reverse.


def _const_specs_s(l: int):
    """Field-constant specs whose index maps accept the scalar-prefetch arg."""
    return [
        pl.BlockSpec((l,), lambda i, s: (0,)),
        pl.BlockSpec((l,), lambda i, s: (0,)),
        pl.BlockSpec((l,), lambda i, s: (0,)),
        pl.BlockSpec((l,), lambda i, s: (0,)),
        pl.BlockSpec((l + 1,), lambda i, s: (0,)),
    ]


@lru_cache(maxsize=16)
def _bitrev(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@partial(jax.jit, static_argnums=(1,))
def _to_lm(tables: jnp.ndarray, b: int) -> jnp.ndarray:
    """(n_mles, B, l) batch-major → (n_mles, l, B) limb-major bit-reversed."""
    t = jnp.transpose(tables, (0, 2, 1))
    return jnp.take(t, jnp.asarray(_bitrev(b)), axis=2)


@partial(jax.jit, static_argnums=(1,))
def _from_lm(buf: jnp.ndarray, active: int) -> jnp.ndarray:
    """Active prefix of the limb-major bit-reversed buffer → batch-major."""
    t = jnp.take(buf[:, :, :active], jnp.asarray(_bitrev(active)), axis=2)
    return jnp.transpose(t, (0, 2, 1))


@partial(jax.jit, static_argnums=(0,), donate_argnums=(1,))
def _fold_lm(ctx: DeviceField, buf: jnp.ndarray, r: jnp.ndarray, nbh):
    """In-place MXU fold: lanes [0, act/2) ← v0 + r·(v1 − v0) where v0/v1
    are the two halves of the active prefix.  nbh = (act/2)//(2·TILE) is
    both the grid size and the (scalar-prefetched) block offset of the
    second half.  v3 chain: one fused REDC per block (_scalar_fold_mxu)."""
    n_mles, l, b_max = buf.shape
    w = 2 * TILE
    tmt_np, tqt_np = _static_toeplitz(ctx)
    tmt, tqt = jnp.asarray(tmt_np), jnp.asarray(tqt_np)
    trt2 = _rr_toeplitz(_one_minus_limbs(ctx, r), r, l)

    def kernel(s_ref, *refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        a_ref, b_ref = refs[5], refs[6]
        trt_r, tmt_r, tqt_r = refs[7], refs[8], refs[9]
        o_ref = refs[10]
        for i in range(n_mles):
            o_ref[i] = _scalar_fold_mxu(
                kctx, a_ref[i], b_ref[i], trt_r[:], tmt_r[:], tqt_r[:]
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbh,),
        in_specs=_const_specs_s(l) + [
            pl.BlockSpec((n_mles, l, w), lambda i, s: (0, 0, i)),
            pl.BlockSpec((n_mles, l, w), lambda i, s: (0, 0, i + s[0])),
            pl.BlockSpec(trt2.shape, lambda i, s: (0, 0)),
            pl.BlockSpec(tmt.shape, lambda i, s: (0, 0)),
            pl.BlockSpec(tqt.shape, lambda i, s: (0, 0)),
        ],
        out_specs=pl.BlockSpec((n_mles, l, w), lambda i, s: (0, 0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_mles, l, b_max), jnp.uint32),
        input_output_aliases={6: 0},
        compiler_params=_mxu_params(),
    )(jnp.asarray([nbh], jnp.int32), *_ctx_consts(ctx), buf, buf, trt2, tmt, tqt)


def _g_out_specs_s(terms, l: int):
    return tuple(
        pl.BlockSpec((ne * npj, 3, erow, prow), lambda i, s: (0, 0, 0, 0))
        for _, _, npj, prow, ne, erow in terms
    )


def _eval_terms_lm(kctx, a_ref, b_ref, terms, l):
    """G byte planes for one block: v0/v1 are direct (l, T) limb-major views."""
    v0c, v1c, dc, s8c = {}, {}, {}, {}

    def vv(i):
        if i not in v0c:
            v0c[i] = a_ref[i]
            v1c[i] = b_ref[i]
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
    for e_idx, rest, npj, prow, ne, erow in terms:
        e0, _ = vv(e_idx)
        if ne == 4:  # 4-factor term: the last P factor joins the e side
            c0, _ = vv(rest[2])
            de, dcm = dd(e_idx), dd(rest[2])
            e_sides = [
                _bf16(_bytes3_B(_mul_columns_T(e0, c0))),
                _bf16(_bytes3_B(_mul_columns_T(e0, dcm))),
                _bf16(_bytes3_B(_mul_columns_T(de, c0))),
                _bf16(_bytes3_B(_mul_columns_T(de, dcm))),
            ]
        else:
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
                gi = _nt_dot_chunked(ea, pb)
                g_list.append(jnp.stack([gi & 0xFF, (gi >> 8) & 0xFF, gi >> 16]))
        outs.append(jnp.stack(g_list))
    return outs


@partial(jax.jit, static_argnums=(0, 2))
def _eval_lm(ctx: DeviceField, buf: jnp.ndarray, terms, nbh):
    """Evaluation over the active prefix: pairs = (first half, second half)
    of the active lanes; nbh = half_lanes//TILE is grid size AND offset."""
    n_mles, l, b_max = buf.shape

    def kernel(s_ref, *refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        a_ref, b_ref = refs[5], refs[6]
        g_refs = refs[7:]
        gs = _eval_terms_lm(kctx, a_ref[:], b_ref[:], terms, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for gr in g_refs:
                gr[:] = jnp.zeros(gr.shape, jnp.int32)

        for gr, g in zip(g_refs, gs):
            gr[:] = gr[:] + g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbh,),
        in_specs=_const_specs_s(l) + [
            pl.BlockSpec((n_mles, l, TILE), lambda i, s: (0, 0, i)),
            pl.BlockSpec((n_mles, l, TILE), lambda i, s: (0, 0, i + s[0])),
        ],
        out_specs=_g_out_specs_s(terms, l),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_g_out_shapes(terms, l),
        compiler_params=_mxu_params(),
    )(jnp.asarray([nbh], jnp.int32), *_ctx_consts(ctx), buf, buf)


# ---------------------------------------------------------------------------
# Gruen eq-factorization (single-chip tier)
#
# Every Spartan sumcheck-1 term carries the SAME eq(β, ·) factor
# (spartan.py comb1; reference prover combines it the same way,
# /root/reference/src/spartan/prover.rs).  eq factors per round j as
#
#   s_j(t) = pref_j · c_j(t) · Σ_i coeff_i · h_{i,j}(t),
#   h_{i,j}(t) = Σ_pairs E_j[pair] · Π_{m∈S_i} M_m(t, pair)
#
# with pref_j = Π_{k<j} eq(β_k, r_k) (a scalar ratcheted per round),
# c_j(t) = (1−β_j)(1−t) + β_j·t (linear), and E_j the eq table over the
# UNBOUND suffix variables — challenge-independent, so every level is
# precomputed at setup.  Consequences for the kernels: the eq MLE leaves
# the fold entirely (4 tables → 3: −25% fold traffic) and the eval's
# bilinear split loses its Δe side (6 G dots per 3-factor term → 3).
#
# Suffix tables live in ONE flat limb-major buffer in bit-reversed lane
# order.  Building bit-reversed is a pure CONCATENATION recurrence:
# appending logical-LSB variable x_j = prepending a storage MSB, so
# E_{j} = [(1−β_{j+1})·E_{j+1} ‖ β_{j+1}·E_{j+1}] — no interleaves, and
# lane p of level j aligns exactly with eval pair p of round j.
# ---------------------------------------------------------------------------


def gruen_supported(idx_terms, eq_idx: int, l16: int) -> bool:
    """Every term must carry eq as its last index; P side ≤ 3 factors
    (same width/bound arguments as :func:`mxu_supported`)."""
    return l16 <= 32 and all(
        len(t) >= 2 and t[-1] == eq_idx and 1 <= len(t) - 1 <= 3 for t in idx_terms
    )


def gruen_term_meta(idx_terms, eq_idx: int, l: int = 16) -> tuple:
    """Static per-term metadata with eq stripped: (rest, npj, prow, ne, erow).

    The suffix-eq level E replaces the classic e side (ne 1, canonical rows).
    With 3 P factors the last one joins E as lazy products {E·C₀, E·ΔC}
    (ne 2, erow 6l) against the first two factors' quadratic basis."""
    out = []
    for idxs in idx_terms:
        assert idxs[-1] == eq_idx
        rest = tuple(idxs[:-1])
        npj = 2 if len(rest) == 1 else 3
        prow = 2 * l if len(rest) == 1 else 6 * l
        if len(rest) == 3:
            ne, erow = 2, 6 * l
        else:
            ne, erow = 1, 2 * l
        out.append((rest, npj, prow, ne, erow))
    return tuple(out)


def suffix_offsets(nvars: int) -> np.ndarray:
    """Lane offset of level j (1-indexed round; entry [j−1]) in the flat
    suffix buffer: E_1 at 0 (2^{n−1} lanes), then E_2, ..., E_n."""
    offs = np.zeros(nvars, np.int64)
    acc = 0
    for j in range(1, nvars + 1):
        offs[j - 1] = acc
        acc += 1 << (nvars - j)
    return offs


@partial(jax.jit, static_argnums=(0, 2))
def build_eq_suffix_flat(ctx: DeviceField, beta: jnp.ndarray, nvars: int) -> jnp.ndarray:
    """(l, 2^nvars) flat limb-major suffix-eq buffer, bit-reversed lanes.

    beta: (nvars, l) Montgomery limbs, beta[j−1] = β_j.  Levels are built
    back-to-front: E_n = [1̂]; E_j = [(1̂−β̂_{j+1})·E_{j+1} ‖ β̂_{j+1}·E_{j+1}].
    """
    from ..fields.montgomery import mont_mul

    l = ctx.n16
    one = jnp.asarray(ctx.one)
    levels = [None] * (nvars + 1)
    levels[nvars] = one[:, None]  # E_n: one lane
    for j in range(nvars - 1, 0, -1):
        b = beta[j]  # β_{j+1} (0-indexed row j)
        nb = _one_minus_limbs(ctx, b)  # (1̂ − β̂) mod q — exact mont subtraction
        prev = levels[j + 1]  # (l, 2^{n−j−1})
        lo = jax.vmap(lambda col: mont_mul(ctx, nb, col), in_axes=1, out_axes=1)(prev)
        hi = jax.vmap(lambda col: mont_mul(ctx, b, col), in_axes=1, out_axes=1)(prev)
        levels[j] = jnp.concatenate([lo, hi], axis=1)
    flat = jnp.concatenate([levels[j] for j in range(1, nvars + 1)], axis=1)
    pad = (1 << nvars) - flat.shape[1]
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((l, pad), jnp.uint32)], axis=1)
    return flat


def _eval_terms_gruen(kctx, e_blk, a_ref, b_ref, terms, l):
    """Gruen G byte planes for one block: canonical-E e-side (ne 1), or
    lazy {E·C₀, E·ΔC} products when the term has a third P factor."""
    v0c, v1c, dc = {}, {}, {}

    def vv(i):
        if i not in v0c:
            v0c[i] = a_ref[i]
            v1c[i] = b_ref[i]
        return v0c[i], v1c[i]

    def dd(i):
        if i not in dc:
            a, b = vv(i)
            dc[i] = _mont_sub_T(kctx, b, a)
        return dc[i]

    e8 = _bf16(_split8_B(e_blk))
    outs = []
    for rest, npj, prow, ne, erow in terms:
        if ne == 2:  # 4-factor term: third P factor joins the E side
            c0, _ = vv(rest[2])
            e_sides = [
                _bf16(_bytes3_B(_mul_columns_T(e_blk, c0))),
                _bf16(_bytes3_B(_mul_columns_T(e_blk, dd(rest[2])))),
            ]
        else:
            e_sides = [e8]
        if len(rest) == 1:
            y0, y1 = vv(rest[0])
            p_sides = [_bf16(_split8_B(y0)), _bf16(_split8_B(y1))]
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
                gi = _nt_dot_chunked(ea, pb)
                g_list.append(jnp.stack([gi & 0xFF, (gi >> 8) & 0xFF, gi >> 16]))
        outs.append(jnp.stack(g_list))  # (ne·npj, 3, erow, prow)
    return outs


def _gruen_g_shapes(terms, l: int):
    return tuple(
        jax.ShapeDtypeStruct((ne * npj, 3, erow, prow), jnp.int32)
        for _, npj, prow, ne, erow in terms
    )


def _gruen_g_specs_s(terms, l: int):
    return tuple(
        pl.BlockSpec((ne * npj, 3, erow, prow), lambda i, s: (0, 0, 0, 0))
        for _, npj, prow, ne, erow in terms
    )


@partial(jax.jit, static_argnums=(0, 3))
def _eval_lm_gruen(ctx: DeviceField, buf: jnp.ndarray, e_flat: jnp.ndarray,
                   terms, nbh, e_off_blocks):
    """Gruen evaluation: pairs = (first half, second half) of buf's active
    prefix, weighted by the suffix level at block offset ``e_off_blocks``
    (in TILE units) of the flat suffix buffer."""
    n_mles, l, b_max = buf.shape

    def kernel(s_ref, *refs):
        kctx = _unpack_ctx(refs[:5], ctx)
        a_ref, b_ref, e_ref = refs[5], refs[6], refs[7]
        g_refs = refs[8:]
        gs = _eval_terms_gruen(kctx, e_ref[:], a_ref[:], b_ref[:], terms, l)

        @pl.when(pl.program_id(0) == 0)
        def _():
            for gr in g_refs:
                gr[:] = jnp.zeros(gr.shape, jnp.int32)

        for gr, g in zip(g_refs, gs):
            gr[:] = gr[:] + g

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbh,),
        in_specs=_const_specs_s(l) + [
            pl.BlockSpec((n_mles, l, TILE), lambda i, s: (0, 0, i)),
            pl.BlockSpec((n_mles, l, TILE), lambda i, s: (0, 0, i + s[0])),
            pl.BlockSpec((l, TILE), lambda i, s: (0, i + s[1])),
        ],
        out_specs=_gruen_g_specs_s(terms, l),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=_gruen_g_shapes(terms, l),
        compiler_params=_mxu_params(),
    )(
        jnp.stack([jnp.asarray(nbh, jnp.int32), jnp.asarray(e_off_blocks, jnp.int32)]),
        *_ctx_consts(ctx), buf, buf, e_flat,
    )


@partial(jax.jit, static_argnums=(0, 3, 4))
def eval_lm_gruen_ref(ctx: DeviceField, buf: jnp.ndarray, e_flat: jnp.ndarray,
                      terms, nbh: int, e_off_blocks: int | jnp.ndarray = 0):
    """XLA twin of :func:`_eval_lm_gruen` (bit-identical G byte planes)."""
    n_mles, l, _ = buf.shape
    kctx = _kctx_plain(ctx)
    half = nbh * TILE
    a = jnp.moveaxis(buf[:, :, :half].reshape(n_mles, l, nbh, TILE), 2, 0)
    b = jnp.moveaxis(buf[:, :, half : 2 * half].reshape(n_mles, l, nbh, TILE), 2, 0)
    e = jax.lax.dynamic_slice_in_dim(e_flat, e_off_blocks * TILE, half, axis=1)
    e = jnp.moveaxis(e.reshape(l, nbh, TILE), 1, 0)

    def block(abe):
        return _eval_terms_gruen(kctx, abe[2], abe[0], abe[1], terms, l)

    gs = jax.vmap(block)((a, b, e))
    return tuple(g.sum(axis=0, dtype=jnp.int32) for g in gs)


def gruen_g_to_evals_host(
    cfg: FieldConfig, g_arrays, comb, terms, degree: int,
    beta_j: Fp, pref: Fp,
) -> list[Fp]:
    """Exact host decode of Gruen G planes → s_j(0..degree).

    s_j(t) = pref · ((1−β_j)(1−t) + β_j·t) · Σ_i coeff_i·h_i(t)."""
    h_evals = [cfg.zero() for _ in range(degree + 1)]
    for (coeff, _idxs), meta, g in zip(comb, terms, g_arrays):
        for t, v in enumerate(_g_term_evals_host(cfg, g, meta, coeff, degree)):
            h_evals[t] = h_evals[t] + v
    one = cfg.one()
    out = []
    for t in range(degree + 1):
        t_f = cfg.fp(t)
        c_t = (one - beta_j) * (one - t_f) + beta_j * t_f
        out.append(pref * c_t * h_evals[t])
    return out


@lru_cache(maxsize=64)
def _tconst_mont_np(q: int, n16: int, degree: int) -> np.ndarray:
    """Montgomery limb constants of (1−t) mod q and t, t = 0..degree."""
    from ..fields.limbs import int_to_limbs

    radix = 1 << (16 * n16)
    out = np.zeros((degree + 1, 2, n16), np.uint32)
    for t in range(degree + 1):
        out[t, 0] = int_to_limbs(((1 - t) * radix) % q, n16)
        out[t, 1] = int_to_limbs((t * radix) % q, n16)
    return out


def gruen_g_to_evals_device(
    ctx: DeviceField, g_arrays, comb_coeff_limbs, terms, degree: int,
    beta_j: jnp.ndarray, pref: jnp.ndarray,
):
    """On-device Gruen decode: per-term G byte planes → (degree+1, L) round
    evaluations in Montgomery form — device-FS twin of
    :func:`gruen_g_to_evals_host`.  ``beta_j``/``pref`` are (L,) Montgomery
    limbs of the round's β and the ratcheted prefix Π_{k<j} eq(β_k, r_k)."""
    from ..fields.montgomery import mont_add, mont_mul

    l = ctx.n16
    # Σ_i coeff_i·h_i(t): (degree+1, l) Montgomery (gruen metas are already
    # (rest, npj, prow, ne, erow) — no e_idx to strip)
    ssum = _g_sum_terms_device(ctx, g_arrays, comb_coeff_limbs, terms, degree)
    # s_j(t) = pref · c_t · ssum[t],  c_t = (1−β_j)·(1−t) + β_j·t
    tc = jnp.asarray(_tconst_mont_np(ctx.modulus, l, degree))
    omb = _one_minus_limbs(ctx, beta_j)
    out = []
    for t in range(degree + 1):
        c_t = mont_add(
            ctx,
            mont_mul(ctx, omb, tc[t, 0]),
            mont_mul(ctx, beta_j, tc[t, 1]),
        )
        out.append(mont_mul(ctx, pref, mont_mul(ctx, c_t, ssum[t])))
    return jnp.stack(out)  # (degree+1, l)


def eq_factor(ctx: DeviceField, beta_j: jnp.ndarray, r_j: jnp.ndarray) -> jnp.ndarray:
    """eq(β_j, r_j) = (1−β_j)(1−r_j) + β_j·r_j on (L,) Montgomery limbs."""
    from ..fields.montgomery import mont_add, mont_mul

    return mont_add(
        ctx,
        mont_mul(ctx, _one_minus_limbs(ctx, beta_j), _one_minus_limbs(ctx, r_j)),
        mont_mul(ctx, beta_j, r_j),
    )


# ---------------------------------------------------------------------------
# XLA twins of the limb-major kernels — same math, no Mosaic.
#
# These run the identical limb/REDC/byte-plane algebra as plain jitted XLA,
# so they (a) execute on CPU, pinning the MXU tier's values against the host
# oracle in the default suite, and (b) serve as the portable round body for
# the SHARDED limb-major executor (parallel/sumcheck.py), whose shard_map
# code path must run on the virtual CPU mesh.  Byte-plane accumulation
# mirrors the pallas blocking exactly (per-TILE dots, i32 plane sums), so G
# arrays — not just decoded evals — are bit-identical.
# ---------------------------------------------------------------------------


def _kctx_plain(ctx: DeviceField):
    from ..ops.pallas_field import _KCtx
    return _KCtx(
        q=jnp.asarray(ctx.q), nprime=jnp.asarray(ctx.nprime),
        r2=jnp.asarray(ctx.r2), one=jnp.asarray(ctx.one),
        q_wide=jnp.asarray(ctx.q_wide), n16=ctx.n16, modulus=ctx.modulus,
    )


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def fold_lm_ref(ctx: DeviceField, buf: jnp.ndarray, r: jnp.ndarray, nbh: int):
    """XLA twin of :func:`_fold_lm` (identical fold values)."""
    n_mles, l, _ = buf.shape
    w = nbh * 2 * TILE
    kctx = _kctx_plain(ctx)
    tmt_np, tqt_np = _static_toeplitz(ctx)
    tmt, tqt = jnp.asarray(tmt_np), jnp.asarray(tqt_np)
    trt2 = _rr_toeplitz(_one_minus_limbs(ctx, r), r, l)
    out = jnp.stack(
        [
            _scalar_fold_mxu(
                kctx, buf[i, :, :w], buf[i, :, w : 2 * w], trt2, tmt, tqt
            )
            for i in range(n_mles)
        ]
    )
    return buf.at[:, :, :w].set(out)


@partial(jax.jit, static_argnums=(0, 2, 3))
def eval_lm_ref(ctx: DeviceField, buf: jnp.ndarray, terms, nbh: int):
    """XLA twin of :func:`_eval_lm` (bit-identical G byte planes)."""
    n_mles, l, _ = buf.shape
    kctx = _kctx_plain(ctx)
    half = nbh * TILE
    a = buf[:, :, :half].reshape(n_mles, l, nbh, TILE)
    b = buf[:, :, half : 2 * half].reshape(n_mles, l, nbh, TILE)
    a = jnp.moveaxis(a, 2, 0)  # (nbh, n_mles, l, TILE)
    b = jnp.moveaxis(b, 2, 0)

    def block(ab):
        return _eval_terms_lm(kctx, ab[0], ab[1], terms, l)

    gs = jax.vmap(block)((a, b))  # list of (nbh, 2npj, 3, 2l, prow)
    return tuple(g.sum(axis=0, dtype=jnp.int32) for g in gs)


# ---------------------------------------------------------------------------
# device-side G decode (for the device-resident Fiat-Shamir loop)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _onehot_positions_np(erow: int, npj: int, prow: int, l: int) -> tuple:
    """(M, npos): one-hot f32 matrix folding the flattened (erow·prow) G grid
    onto 8-bit positions s = e_pos[i] + p_pos[r]."""
    e_pos = _e_positions(erow, l)
    p_pos = _p_positions(npj, prow, l)
    flat = (e_pos[:, None] + p_pos[None, :]).ravel()
    npos = int(flat.max()) + 1
    m = np.zeros((flat.shape[0], npos), np.float32)
    m[np.arange(flat.shape[0]), flat] = 1.0
    return m, npos


@lru_cache(maxsize=64)
def _w_mont_np(q: int, n16: int, ne: int, npj: int, degree: int) -> np.ndarray:
    """Montgomery-form limb constants of the point weights w[t,k,j] mod q."""
    from ..fields.limbs import int_to_limbs

    radix = 1 << (16 * n16)
    w = _point_weights(ne, npj, degree)
    out = np.zeros((degree + 1, ne, npj, n16), np.uint32)
    for t in range(degree + 1):
        for a in range(ne):
            for j in range(npj):
                out[t, a, j] = int_to_limbs((int(w[t, a, j]) * radix) % q, n16)
    return out


def _bytes_scan(vals: jnp.ndarray) -> jnp.ndarray:
    """(..., P) u32 position values → canonical bytes (..., P+4)."""
    x = jnp.concatenate([vals, jnp.zeros(vals.shape[:-1] + (4,), jnp.uint32)], axis=-1)
    x = jnp.moveaxis(x, -1, 0)

    def body(carry, col):
        v = carry + col
        return v >> 8, v & 0xFF

    _, out = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    return jnp.moveaxis(out, 0, -1)


def _g_term_evals_device(ctx: DeviceField, g, meta, coeff, degree: int):
    """Exact on-device decode of ONE term: G byte planes → (degree+1, L)
    coeff·S_term(t) in Montgomery form.  ``meta`` = (rest, npj, prow, ne,
    erow) — the shared body of the classic and Gruen device decoders."""
    from ..fields.montgomery import mod_reduce_wide, mont_add, mont_mul

    rest, npj, prow, ne, erow = meta
    l = ctx.n16
    onev = jnp.zeros((l,), jnp.uint32).at[0].set(1)
    r2 = jnp.asarray(ctx.r2)
    nk = ne * npj
    m_np, npos = _onehot_positions_np(erow, npj, prow, l)
    m = jnp.asarray(m_np)
    flat = g.reshape(nk, 3, erow * prow).astype(jnp.int32)
    # 12-bit split keeps every f32 contraction exact (≤ 2^11·2^12 < 2^24)
    lo = (flat & 0xFFF).astype(jnp.float32)
    hi = (flat >> 12).astype(jnp.float32)
    s_pl = (
        jnp.einsum("kpm,mn->kpn", lo, m, precision="highest").astype(jnp.uint32)
        + (jnp.einsum("kpm,mn->kpn", hi, m, precision="highest").astype(jnp.uint32) << 12)
    )  # (nk, 3, npos) ≤ 2^25
    by = _bytes_scan(s_pl)  # canonical bytes per plane, (nk, 3, npos+4)
    padded = jnp.concatenate([by, jnp.zeros((nk, 3, 2), jnp.uint32)], axis=-1)
    lazy = (
        padded[:, 0, :]
        + jnp.roll(padded[:, 1, :], 1, axis=-1)
        + jnp.roll(padded[:, 2, :], 2, axis=-1)
    )  # byte plane pl sits one position higher per plane; rolls are safe
    #   because the 2 appended zero positions absorb the wrap
    by2 = _bytes_scan(lazy)  # (nk, npos+10) canonical bytes
    wpos = by2.shape[-1]
    if wpos & 1:
        by2 = jnp.concatenate([by2, jnp.zeros((nk, 1), jnp.uint32)], axis=-1)
        wpos += 1
    limbs = by2[:, 0::2] + (by2[:, 1::2] << 8)  # (nk, W16) canonical
    # chunk-Horner mod q: G = Σ chunk_j·R^j, h ← h·R + chunk (×R via r2)
    w16 = limbs.shape[-1]
    nch = (w16 + l - 1) // l
    if nch * l != w16:
        limbs = jnp.concatenate(
            [limbs, jnp.zeros((nk, nch * l - w16), jnp.uint32)], axis=-1
        )
    chunks = [
        mod_reduce_wide(ctx, limbs[:, j * l : (j + 1) * l]) for j in range(nch)
    ]
    h = chunks[-1]
    for j in range(nch - 2, -1, -1):
        h = mont_add(ctx, mont_mul(ctx, h, r2), chunks[j])  # (nk, l), G mod q
    # point weights + scale + coefficient
    w_limbs = jnp.asarray(_w_mont_np(ctx.modulus, l, ne, npj, degree))
    k_scale = len(rest) + 1
    term_evals = []
    for t in range(degree + 1):
        acc = None
        for a in range(ne):
            for j in range(npj):
                part = mont_mul(ctx, w_limbs[t, a, j], h[a * npj + j])
                acc = part if acc is None else mont_add(ctx, acc, part)
        for _ in range(k_scale - 1):
            acc = mont_mul(ctx, acc, onev)  # ÷R → S_term(t)·R
        term_evals.append(mont_mul(ctx, coeff, acc))
    return jnp.stack(term_evals)  # (degree+1, l)


def _g_sum_terms_device(ctx: DeviceField, g_arrays, comb_coeff_limbs, metas, degree: int):
    """Σ over terms of :func:`_g_term_evals_device` — (degree+1, L)."""
    from ..fields.montgomery import mont_add

    evals = None
    for term_i, (meta, g) in enumerate(zip(metas, g_arrays)):
        stacked = _g_term_evals_device(ctx, g, meta, comb_coeff_limbs[term_i], degree)
        evals = stacked if evals is None else jax.vmap(
            lambda a, b: mont_add(ctx, a, b)
        )(evals, stacked)
    return evals


def g_to_evals_device(ctx: DeviceField, g_arrays, comb_coeff_limbs, terms, degree: int):
    """Exact on-device decode: per-term G byte planes → (degree+1, L) evals
    in Montgomery form — the device-FS twin of ``g_to_evals_host``."""
    return _g_sum_terms_device(
        ctx, g_arrays, comb_coeff_limbs, [m[1:] for m in terms], degree
    )
