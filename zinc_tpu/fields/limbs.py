"""Limb-array primitives: big integers as (..., L) uint32 arrays of 16-bit limbs.

This is the data layout of every device-resident number in the framework:
little-endian 16-bit limbs, one per uint32 lane.  16-bit limbs are chosen for
TPU: there are no 64-bit scalar units, and 16×16→32-bit products fit a uint32
lane exactly ((2^16−1)² < 2^32).

Two implementations per primitive, dispatched on the active backend:

* **TPU**: Kogge-Stone carry resolution (log-depth shifts + elementwise) and
  shifted multiply-accumulate columns — wide, fusion-friendly, and exactly
  what the Pallas kernels (ops/pallas_field.py) trace in-kernel.
* **CPU** (the test oracle backend): ``lax.scan`` ripple carries and the
  antidiagonal-matmul column product.  XLA:CPU's fused elementwise executor
  *recomputes* shared operands, so the fan-out-heavy Kogge-Stone/unrolled
  forms explode there (measured: the CPU test suite went 350 s → >1500 s),
  while scans — which materialize their carry — stay linear.

Both compute identical values; tests/test_device_field.py pins them to the
Python oracle.  Host↔device packing helpers (numpy) live at the bottom.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# Python-int mask: inlined as an immediate everywhere (a jnp scalar would be
# a captured constant, which Pallas kernels reject).
MASK16 = 0xFFFF


def _prefer_parallel_forms() -> bool:
    """Kogge-Stone/unrolled forms on TPU; scan/matmul forms on CPU."""
    return jax.default_backend() != "cpu"


def _placed(x: jnp.ndarray, off: int, nc: int) -> jnp.ndarray | None:
    """x's limbs shifted to columns [off, off+w) of an nc-wide array."""
    if off >= nc:
        return None
    x = x[..., : nc - off]
    pads = [(0, 0)] * (x.ndim - 1) + [(off, nc - off - x.shape[-1])]
    return jnp.pad(x, pads)


def _mul_columns_shift(a: jnp.ndarray, b: jnp.ndarray, out_cols: int | None = None) -> jnp.ndarray:
    """Lazy columns as Lb shifted multiply-accumulates in pure uint32 — a
    static elementwise chain that fuses on XLA:TPU and lowers cleanly in
    Pallas kernels (no reshapes, gathers, or float detours)."""
    la, lb = a.shape[-1], b.shape[-1]
    nc = out_cols if out_cols is not None else la + lb
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    av = jnp.broadcast_to(a, batch + (la,))
    bv = jnp.broadcast_to(b, batch + (lb,))
    acc = jnp.zeros(batch + (nc,), jnp.uint32)
    for j in range(lb):
        p = av * bv[..., j : j + 1]  # exact: (2^16−1)² < 2^32
        lo = _placed(p & MASK16, j, nc)
        if lo is not None:
            acc = acc + lo
        hi = _placed(p >> 16, j + 1, nc)
        if hi is not None:
            acc = acc + hi
    return acc


@lru_cache(maxsize=64)
def _antidiag(la: int, lb: int, nc: int, shift: int) -> np.ndarray:
    """(La·Lb, nc) 0/1 matrix with m[i·Lb+j, k] = 1 iff i+j+shift == k."""
    m = np.zeros((la * lb, nc), dtype=np.float32)
    for i in range(la):
        for j in range(lb):
            k = i + j + shift
            if k < nc:
                m[i * lb + j, k] = 1.0
    return m


def _mul_columns_matmul(a: jnp.ndarray, b: jnp.ndarray, out_cols: int | None = None) -> jnp.ndarray:
    """Lazy columns via the antidiagonal f32 contraction (CPU oracle form:
    lo/hi < 2^16 and column sums < 2^24 are exact in f32, and the matmul
    materializes once instead of re-running a 16-deep elementwise chain)."""
    la, lb = a.shape[-1], b.shape[-1]
    nc = out_cols if out_cols is not None else la + lb
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    outer = (a[..., :, None] * b[..., None, :]).reshape(batch + (la * lb,))
    lo = (outer & MASK16).astype(jnp.float32)
    hi = (outer >> 16).astype(jnp.float32)
    m_lo = jnp.asarray(_antidiag(la, lb, nc, 0))
    m_hi = jnp.asarray(_antidiag(la, lb, nc, 1))
    cols = jnp.matmul(
        lo, m_lo, preferred_element_type=jnp.float32, precision="highest"
    ) + jnp.matmul(hi, m_hi, preferred_element_type=jnp.float32, precision="highest")
    return cols.astype(jnp.uint32)


def mul_columns(a: jnp.ndarray, b: jnp.ndarray, out_cols: int | None = None) -> jnp.ndarray:
    """Lazy-column product of two canonical limb arrays.

    a: (..., La), b: (..., Lb) → (..., out_cols) lazy columns (default La+Lb),
    cols[k] = Σ_{i+j=k} lo(a_i·b_j) + Σ_{i+j=k-1} hi(a_i·b_j) ≤ 2·Lb·2^16.
    """
    if _prefer_parallel_forms():
        return _mul_columns_shift(a, b, out_cols)
    return _mul_columns_matmul(a, b, out_cols)


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Move limb i to position i+d (zeros shifted in at the bottom)."""
    pad = jnp.zeros(x.shape[:-1] + (d,), x.dtype)
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _resolve_carries(t: jnp.ndarray, want_carry_out: bool = False):
    """Kogge-Stone carry resolution for base-2^16 addition.

    t: (..., N) uint32 per-position sums ≤ 2^17−1 (so each immediate carry is
    0/1).  Returns canonical limbs of the represented value mod 2^(16N) —
    and, optionally, the carry out of the top limb.  log2(N) rounds of
    elementwise generate/propagate combines replace the 33-step sequential
    ripple scan (the scan was the dominant cost of every device field op:
    ~37 ms per sweep at 2^20 batch on one chip; this form is ~memory-bound).
    """
    n = t.shape[-1]
    g = t >> 16  # generate: 0/1 by precondition
    p = ((t & MASK16) == MASK16).astype(jnp.uint32)  # propagate
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    c = _shift_up(g, 1)  # carry INTO limb i = combined generate of [0..i-1]
    out = (t + c) & MASK16
    if want_carry_out:
        # static index (a -1 index lowers to dynamic_slice, which Mosaic lacks)
        return out, g[..., n - 1]
    return out


def _pad_or_trim(cols: jnp.ndarray, n: int) -> jnp.ndarray:
    k = cols.shape[-1]
    if n > k:
        return jnp.concatenate(
            [cols, jnp.zeros(cols.shape[:-1] + (n - k,), cols.dtype)], axis=-1
        )
    return cols[..., :n]


def _carry_sweep_scan(cols: jnp.ndarray) -> jnp.ndarray:
    """Ripple-carry via lax.scan (CPU oracle form — materialized carry)."""
    x = jnp.moveaxis(cols, -1, 0)

    def body(carry, col):
        v = carry + col
        return v >> 16, v & MASK16

    _, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), x)
    return jnp.moveaxis(limbs, 0, -1)


def carry_sweep(cols: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Normalize lazy columns (each < 2^32 − 2^16) into canonical 16-bit limbs.

    cols: (..., K) uint32; returns (..., N) canonical limbs, N = out_limbs or
    K+1.  Value is truncated mod 2^(16N) (two's-complement wrap semantics).

    TPU: split each 32-bit column into its low/high 16-bit halves (an exact
    rewrite of the value) and run one Kogge-Stone base-2^16 addition;
    CPU: ripple scan.
    """
    cols = _pad_or_trim(cols, out_limbs if out_limbs is not None else cols.shape[-1] + 1)
    if not _prefer_parallel_forms():
        return _carry_sweep_scan(cols)
    return _resolve_carries((cols & MASK16) + _shift_up(cols >> 16, 1))


def add_limbs(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int | None = None) -> jnp.ndarray:
    """Exact sum of canonical limb arrays (wrap at out_limbs if given)."""
    la, lb = a.shape[-1], b.shape[-1]
    n_out = out_limbs if out_limbs is not None else max(la, lb) + 1
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])

    def fit(x, width):
        x = jnp.broadcast_to(x, batch + (x.shape[-1],))[..., :width]
        if x.shape[-1] < width:
            pad = jnp.zeros(batch + (width - x.shape[-1],), jnp.uint32)
            x = jnp.concatenate([x, pad], axis=-1)
        return x

    t = fit(a, n_out) + fit(b, n_out)
    if not _prefer_parallel_forms():
        return _carry_sweep_scan(t)
    return _resolve_carries(t)


def _sub_limbs_scan(av: jnp.ndarray, bv: jnp.ndarray):
    x = jnp.moveaxis(av, -1, 0)
    y = jnp.moveaxis(bv, -1, 0)

    def body(borrow, ab):
        ai, bi = ab
        v = ai - bi - borrow
        return (v >> 31) & 1, v & MASK16

    borrow, limbs = jax.lax.scan(body, jnp.zeros_like(x[0]), (x, y))
    return jnp.moveaxis(limbs, 0, -1), borrow


def sub_limbs(a: jnp.ndarray, b: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """a − b with borrow chain; returns (limbs mod 2^(16L), borrow 0/1).

    TPU: a + ~b + 1 on the Kogge-Stone adder, borrow = 1 − carry-out;
    CPU: ripple borrow scan.
    """
    l = a.shape[-1]
    assert b.shape[-1] == l
    batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    av = jnp.broadcast_to(a, batch + (l,))
    bv = jnp.broadcast_to(b, batch + (l,))
    if not _prefer_parallel_forms():
        return _sub_limbs_scan(av, bv)
    t = av + (bv ^ MASK16)
    t = jnp.concatenate([t[..., :1] + 1, t[..., 1:]], axis=-1)  # inject the +1
    out, carry = _resolve_carries(t, want_carry_out=True)
    return out, (carry ^ 1).astype(jnp.uint32)


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


def bigint_serialize(value: int, n64: int) -> bytes:
    """Canonical BigInt wire form: n64 u64 words, little-endian per word,
    word 0 first — the mirror of the reference's CanonicalSerialize for
    BigInt<N> (/root/reference/src/field/biginteger.rs:67-79, which defers
    to `[u64; N]`: consecutive LE u64s).  `value` must be a non-negative
    canonical representative < 2^(64·n64)."""
    if value < 0 or value >> (64 * n64):
        raise ValueError(f"value does not fit in {n64} u64 limbs")
    return value.to_bytes(8 * n64, "little")


def bigint_deserialize(data: bytes, n64: int) -> int:
    """Inverse of :func:`bigint_serialize`
    (/root/reference/src/field/biginteger.rs:86-97)."""
    if len(data) != 8 * n64:
        raise ValueError(f"expected {8 * n64} bytes, got {len(data)}")
    return int.from_bytes(data, "little")


# ---------------------------------------------------------------------------
# NAF scalar recoding (host utility)
# ---------------------------------------------------------------------------


def find_naf(num: int) -> list[int]:
    """Non-adjacent form of a nonnegative integer, little-endian digits in
    {-1, 0, 1} (mirror of /root/reference/src/field/biginteger/arithmetic.rs:
    146-199)."""
    if num < 0:
        raise ValueError("NAF input must be nonnegative")
    res: list[int] = []
    while num != 0:
        if num & 1:
            z = 2 - (num % 4)
            num -= z
        else:
            z = 0
        res.append(z)
        num >>= 1
    return res


def find_relaxed_naf(num: int) -> list[int]:
    """NAF with the top-of-sequence `0 -1 0 1` → `0 1 1` rewrite that saves
    one doubling (/root/reference/src/field/biginteger/arithmetic.rs:201-229)."""
    res = find_naf(num)
    if len(res) >= 3 and res[-2] == 0 and res[-3] == -1:
        res[-3] = 1
        res[-2] = 1
        res.pop()
    return res
