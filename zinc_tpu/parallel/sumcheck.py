"""Sharded sumcheck executor: the hypercube axis block-sharded over a mesh.

Per round, every device runs the same fused fold-and-evaluate body as the
single-chip executor (sumcheck/device.py:_round_body) on its contiguous block
of the 2^s eval tables, then the (degree+1) lazy wide claim sums are closed
with one ``psum`` over the mesh axis — the TPU-native replacement for the
reference's Rayon fold/reduce (/root/reference/src/sumcheck/prover.rs:126-176).

Because the tables are block-sharded and the fold pairs adjacent entries
(2b, 2b+1), the first s − log2(D) − 1 rounds need no data movement at all;
once the per-device block is too small to pair locally the executor gathers
the (tiny — ≤ 2·D·n_mles elements) remainder and finishes on replicated
state.  The transcript is bit-identical to the unsharded run: the psum'd
lazy sums decode to the same integers because limb lanes are summed exactly
(uint32 lanes hold ≤ 2^16·D < 2^32 for any real mesh).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.config import FieldConfig, Fp
from ..fields.limbs import limbs_to_int
from ..fields.montgomery import DeviceField, device_field
from ..poly.device import fps_to_limbs, limbs_to_fp
from ..sumcheck.device import DeviceSumcheckExecutor, _final_fold, _round_body


# demotion remainders are tiny (≤ O(D·TILE) lanes) so the multi-process
# allgather inside fetch_global is negligible
from .mesh import fetch_global as _fetch_global


@lru_cache(maxsize=64)
def _sharded_round_fn(mesh: Mesh, ctx: DeviceField, first: bool, degree: int, idx_terms: tuple):
    # the hypercube axis is sharded over ALL mesh axes (works for 1-D and
    # 2-D production meshes alike; psum closes over every axis)
    axes = tuple(mesh.axis_names)

    def local_round(tables, r, coeffs):
        new_tables, wide = _round_body(ctx, tables, (r, coeffs), first, degree, idx_terms)
        return new_tables, jax.lax.psum(wide, axes)

    fn = jax.shard_map(
        local_round,
        mesh=mesh,
        in_specs=(P(None, axes, None), P(None), P(None, None)),
        out_specs=(P(None, axes, None), P(None, None)),
    )
    return jax.jit(fn)


@lru_cache(maxsize=32)
def _sharded_fold_fn(mesh: Mesh, ctx: DeviceField):
    axes = tuple(mesh.axis_names)

    def local_fold(tables, r):
        return _final_fold(ctx, tables, r)

    fn = jax.shard_map(
        local_fold,
        mesh=mesh,
        in_specs=(P(None, axes, None), P(None)),
        out_specs=P(None, axes, None),
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Sharded limb-major (MXU-tier) executor
# ---------------------------------------------------------------------------
#
# The hypercube axis is block-sharded by its HIGH bits (device d owns indices
# [d·B/D, (d+1)·B/D)); the fold binds the LOW bit, so fold pairs are local to
# a device for every round until the local block is exhausted.  Each device
# stores its block in the LOCAL bit-reversed limb-major layout of
# sumcheck/mxu_exec.py, runs the same fused fold/eval kernels as the
# single-chip MXU tier (Pallas on TPU; the XLA twins elsewhere, so the
# virtual CPU mesh executes this exact code path), and the per-term G byte
# planes close with one psum — decoded G integers are identical to the
# unsharded run, so transcripts stay byte-identical.
# ---------------------------------------------------------------------------


def _lm_use_pallas(b_local: int) -> bool:
    """Single source of truth with the single-chip tier's gating."""
    from ..sumcheck.device import _use_pallas

    return _use_pallas(b_local)


@lru_cache(maxsize=32)
def _sharded_lm_prep(mesh: Mesh, b_local: int):
    from ..sumcheck.mxu_exec import _to_lm

    axes = tuple(mesh.axis_names)
    fn = jax.shard_map(
        lambda t: _to_lm(t, b_local),
        mesh=mesh,
        in_specs=P(None, axes, None),
        out_specs=P(None, None, axes),
    )
    return jax.jit(fn)


@lru_cache(maxsize=64)
def _sharded_lm_fold(mesh: Mesh, ctx: DeviceField, nbh_local: int, use_pallas: bool):
    from ..sumcheck.mxu_exec import _fold_lm, fold_lm_ref

    axes = tuple(mesh.axis_names)

    def local(buf, r):
        if use_pallas:
            return _fold_lm(ctx, buf, r, nbh_local)
        return fold_lm_ref(ctx, buf, r, nbh_local)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None)),
        out_specs=P(None, None, axes),
        # the vma checker cannot annotate pallas_call out_shapes (jax 0.9
        # raises at trace time on the TPU path — caught by the r4 on-chip
        # sharded measurement; the CPU suite runs the XLA twins and never
        # hit it)
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


@lru_cache(maxsize=64)
def _sharded_lm_eval(mesh: Mesh, ctx: DeviceField, terms: tuple, nbh_local: int, use_pallas: bool):
    from ..sumcheck.mxu_exec import _eval_lm, eval_lm_ref

    axes = tuple(mesh.axis_names)

    def local(buf):
        if use_pallas:
            gs = _eval_lm(ctx, buf, terms, nbh_local)
        else:
            gs = eval_lm_ref(ctx, buf, terms, nbh_local)
        return tuple(jax.lax.psum(g, axes) for g in gs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, None, axes),
        out_specs=tuple(P(None, None, None, None) for _ in terms),
        check_vma=False,  # pallas out_shapes carry no vma (see _sharded_lm_fold)
    )
    return jax.jit(fn)


# Dynamic-size wrappers (Pallas path only): the MXU kernels already take
# their grid/offset sizes as traced scalar-prefetch values, so ONE trace
# serves every round — per-shape retraces are the e2e killer over the
# tunnel (CLAUDE.md).  The XLA twins need static sizes (shapes derive from
# them), so the CPU-mesh path keeps the per-round-keyed wrappers above.


@lru_cache(maxsize=32)
def _sharded_lm_fold_dyn(mesh: Mesh, ctx: DeviceField):
    from ..sumcheck.mxu_exec import _fold_lm

    axes = tuple(mesh.axis_names)
    fn = jax.shard_map(
        lambda buf, r, nbh: _fold_lm(ctx, buf, r, nbh[0]),
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None), P(None)),
        out_specs=P(None, None, axes),
        check_vma=False,  # pallas out_shapes carry no vma (see _sharded_lm_fold)
    )
    return jax.jit(fn, donate_argnums=(0,))


@lru_cache(maxsize=32)
def _sharded_lm_eval_dyn(mesh: Mesh, ctx: DeviceField, terms: tuple):
    from ..sumcheck.mxu_exec import _eval_lm

    axes = tuple(mesh.axis_names)

    def local(buf, nbh):
        gs = _eval_lm(ctx, buf, terms, nbh[0])
        return tuple(jax.lax.psum(g, axes) for g in gs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None)),
        out_specs=tuple(P(None, None, None, None) for _ in terms),
        check_vma=False,  # pallas out_shapes carry no vma (see _sharded_lm_fold)
    )
    return jax.jit(fn)


class ShardedLmSumcheckExecutor:
    """MXU-tier sharded executor: limb-major blocks + psum'd G planes.

    Drop-in for ShardedSumcheckExecutor when ``mxu_supported`` holds; the
    tail (local block too small to pair) demotes to a replicated
    DeviceSumcheckExecutor exactly like the 1-chip executor's tiers."""

    def __init__(self, cfg: FieldConfig, tables, degree: int, comb, mesh: Mesh):
        from ..sumcheck.mxu_exec import TILE, term_meta

        self.cfg = cfg
        self.ctx = device_field(cfg)
        self.mesh = mesh
        self.degree = degree
        self._comb = comb
        self.idx_terms = tuple(tuple(idxs) for _, idxs in comb)
        self.terms = term_meta(self.idx_terms, cfg.n16)
        self.tile = TILE
        self.d = mesh.size
        b = tables.shape[1]
        self.b_local = b // self.d
        self.use_pallas = _lm_use_pallas(self.b_local)
        axes = tuple(mesh.axis_names)
        sharded = jax.device_put(
            jnp.asarray(tables), NamedSharding(mesh, P(None, axes, None))
        )
        self.buf = _sharded_lm_prep(mesh, self.b_local)(sharded)
        self.active_local = self.b_local
        self._inner: DeviceSumcheckExecutor | None = None

    # -- demotion ----------------------------------------------------------

    def _gather_remainder(self) -> np.ndarray:
        """(n_mles, D·active_local, L) batch-major global remainder."""
        from ..sumcheck.mxu_exec import _bitrev

        arr = _fetch_global(self.buf)  # (n_mles, l, B) — device blocks concatenated
        n_mles, l, _ = arr.shape
        act = self.active_local
        rev = _bitrev(act) if act > 1 else np.zeros(1, np.int64)
        blocks = []
        for dev in range(self.d):
            blk = arr[:, :, dev * self.b_local : dev * self.b_local + act]
            blocks.append(np.transpose(blk[:, :, rev], (0, 2, 1)))
        return np.concatenate(blocks, axis=1)

    def _maybe_demote(self, need_fold: bool) -> None:
        if self._inner is not None:
            return
        need = 4 * self.tile if need_fold else 2 * self.tile
        if self.active_local < need:
            gathered = jax.device_put(
                jnp.asarray(self._gather_remainder()),
                NamedSharding(self.mesh, P(None, None, None)),
            )
            self._inner = DeviceSumcheckExecutor(
                self.cfg, gathered, self.degree, self._comb
            )
            self.buf = None

    # -- rounds ------------------------------------------------------------

    def _decode(self, gs) -> list[Fp]:
        from ..sumcheck.mxu_exec import g_to_evals_host

        return g_to_evals_host(
            self.cfg, [np.asarray(g) for g in gs], self._comb, self.terms, self.degree
        )

    def _do_fold(self, r: jnp.ndarray) -> None:
        nbh = self.active_local // (4 * self.tile)
        if self.use_pallas:
            self.buf = _sharded_lm_fold_dyn(self.mesh, self.ctx)(
                self.buf, r, jnp.asarray([nbh], jnp.int32)
            )
        else:
            self.buf = _sharded_lm_fold(self.mesh, self.ctx, nbh, False)(self.buf, r)
        self.active_local //= 2

    def _do_eval(self):
        nbh = self.active_local // (2 * self.tile)
        if self.use_pallas:
            return _sharded_lm_eval_dyn(self.mesh, self.ctx, self.terms)(
                self.buf, jnp.asarray([nbh], jnp.int32)
            )
        return _sharded_lm_eval(self.mesh, self.ctx, self.terms, nbh, False)(self.buf)

    def round(self, r_prev: Fp | None) -> list[Fp]:
        self._maybe_demote(need_fold=r_prev is not None)
        if self._inner is not None:
            return self._inner.round(r_prev)
        if r_prev is not None:
            self._do_fold(jnp.asarray(fps_to_limbs([r_prev], self.cfg)[0]))
        return self._decode(self._do_eval())

    def final_fold(self, r: Fp):
        self._maybe_demote(need_fold=True)
        if self._inner is not None:
            return self._inner.final_fold(r)
        self._do_fold(jnp.asarray(fps_to_limbs([r], self.cfg)[0]))
        return self.buf

    def final_values(self) -> list[Fp]:
        if self._inner is not None:
            return self._inner.final_values()
        rem = self._gather_remainder()
        assert rem.shape[1] == 1
        return [limbs_to_fp(rem[i, 0], self.cfg) for i in range(rem.shape[0])]


@lru_cache(maxsize=8)
def _scale_suffix_fn(ctx: DeviceField):
    from ..fields.montgomery import mont_mul

    @jax.jit
    def f(flat, w):
        return jax.vmap(
            lambda col: mont_mul(ctx, w, col), in_axes=1, out_axes=1
        )(flat)

    return f


def build_sharded_suffix(
    cfg: FieldConfig, ctx: DeviceField, mesh: Mesh, eq_beta, b_local: int, d: int
):
    """Per-device pre-scaled flat suffix-eq buffer, lane-sharded over the
    mesh: a local suffix buffer over the nv_local non-device variables
    (identical on every device) times the per-device scalar
    w_d = Π_k eq(β_{nv_local+k+1}, bit_k(d)) — the suffix-eq factorizes
    exactly across the high-bit block sharding (see
    ShardedGruenSumcheckExecutor).

    Fully device-resident (r4): the original implementation fetched the
    scaled 2^nv_local×L buffer to the HOST per device and re-uploaded the
    concatenation — a 2·64 MB round trip over the tunnel that cost 3.7 s
    of every sharded 2^20 sumcheck (measured, chip_measure sharded trace).
    Now each addressable device scales its own copy in place and the
    global array is assembled with make_array_from_single_device_arrays —
    zero host bytes, multi-process correct (each process touches only its
    own shards)."""
    from ..sumcheck.mxu_exec import build_eq_suffix_flat

    beta = list(eq_beta)
    nv_local = b_local.bit_length() - 1
    flat_local = build_eq_suffix_flat(
        ctx, jnp.asarray(fps_to_limbs(beta[:nv_local], cfg)), nv_local
    )
    one = cfg.one()
    n_dev_bits = d.bit_length() - 1
    sharding = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    l = ctx.n16
    global_shape = (l, d * (1 << nv_local))
    dev_list = mesh.devices.reshape(-1)  # row-major == lane block order
    proc = jax.process_index()
    scale = _scale_suffix_fn(ctx)
    local_slices = []
    for pos, dev in enumerate(dev_list):
        if dev.process_index != proc:
            continue
        w = one
        for k in range(n_dev_bits):
            bk = beta[nv_local + k]
            w = w * (bk if (pos >> k) & 1 else (one - bk))
        flat_dev = jax.device_put(flat_local, dev)
        if d == 1:
            local_slices.append(flat_dev)  # w = 1̂: mont_mul by one is identity
        else:
            w_l = jax.device_put(jnp.asarray(fps_to_limbs([w], cfg)[0]), dev)
            local_slices.append(scale(flat_dev, w_l))
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, local_slices
    )


@lru_cache(maxsize=64)
def _sharded_gruen_eval(
    mesh: Mesh, ctx: DeviceField, terms: tuple, nbh_local: int,
    e_off_local: int,
):
    """Static-size XLA-twin variant (CPU mesh; shapes derive from nbh)."""
    from ..sumcheck.mxu_exec import eval_lm_gruen_ref

    axes = tuple(mesh.axis_names)

    def local(buf, e_flat):
        gs = eval_lm_gruen_ref(ctx, buf, e_flat, terms, nbh_local, e_off_local)
        return tuple(jax.lax.psum(g, axes) for g in gs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None, axes)),
        out_specs=tuple(P(None, None, None, None) for _ in terms),
    )
    return jax.jit(fn)


@lru_cache(maxsize=32)
def _sharded_gruen_eval_dyn(mesh: Mesh, ctx: DeviceField, terms: tuple):
    """Dynamic-size Pallas variant: one trace serves every round."""
    from ..sumcheck.mxu_exec import _eval_lm_gruen

    axes = tuple(mesh.axis_names)

    def local(buf, e_flat, sizes):
        gs = _eval_lm_gruen(ctx, buf, e_flat, terms, sizes[0], sizes[1])
        return tuple(jax.lax.psum(g, axes) for g in gs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None, axes), P(None, axes), P(None)),
        out_specs=tuple(P(None, None, None, None) for _ in terms),
        check_vma=False,  # pallas out_shapes carry no vma (see _sharded_lm_fold)
    )
    return jax.jit(fn)


class ShardedGruenSumcheckExecutor(ShardedLmSumcheckExecutor):
    """Gruen eq-factorized sharded executor: the eq MLE never rides the
    fold on ANY chip (−25% fold traffic on the 4-table Spartan sumcheck-1).

    The suffix-eq factorizes exactly across the block sharding: the
    hypercube is block-sharded by its logical HIGH bits (= the device id),
    which are the LAST-bound variables, so level E_j of device d's pairs is
    eq(β_dev, d) · E_j^{local} — ONE per-device Montgomery scalar times the
    purely local flat suffix buffer over the nv − log₂(D) non-device
    variables.  Each device therefore holds its own pre-scaled suffix
    buffer (same (l, b_local) footprint as one sharded MLE) and runs the
    identical single-chip Gruen eval kernel; G byte planes close with one
    psum and decode on host with the pref ratchet
    (sumcheck/mxu_exec.py gruen_g_to_evals_host).  The demote path
    reconstructs the classic folded eq table (pref · eq(β_unbound, x)) on
    host and appends it, so the replicated tail sees the classic comb.

    ``tables`` EXCLUDES the eq MLE; ``comb`` references it as index
    n_tabs (last factor of every term)."""

    def __init__(self, cfg: FieldConfig, tables, degree: int, comb, mesh: Mesh,
                 eq_beta):
        from ..sumcheck.mxu_exec import gruen_term_meta

        super().__init__(cfg, tables, degree, comb, mesh)
        self.eq_idx = tables.shape[0]
        self.terms = gruen_term_meta(self.idx_terms, self.eq_idx, cfg.n16)
        self.beta = list(eq_beta)
        self.nv_local = self.b_local.bit_length() - 1
        self.pref = cfg.one()
        self.rounds_done = 0
        self.e_flat = build_sharded_suffix(
            cfg, self.ctx, mesh, self.beta, self.b_local, self.d
        )

    # -- demotion ------------------------------------------------------------

    def _maybe_demote(self, need_fold: bool) -> None:
        if self._inner is not None:
            return
        need = 4 * self.tile if need_fold else 2 * self.tile
        if self.active_local >= need:
            return
        from ..poly.mle import build_eq_x_r

        rem = self._gather_remainder()  # (n_tabs, D·act, L) batch-major global
        k = self.rounds_done  # folds done = max(k−1, 0); unbound vars β_k..
        eq_tab = build_eq_x_r(self.beta[max(k - 1, 0):], self.cfg).evaluations
        eq_scaled = [self.pref * e for e in eq_tab]
        assert len(eq_scaled) == rem.shape[1]
        full = np.concatenate(
            [rem, np.asarray(fps_to_limbs(eq_scaled, self.cfg))[None]], axis=0
        )
        gathered = jax.device_put(
            jnp.asarray(full), NamedSharding(self.mesh, P(None, None, None))
        )
        self._inner = DeviceSumcheckExecutor(self.cfg, gathered, self.degree, self._comb)
        self.buf = None

    # -- rounds ----------------------------------------------------------------

    def round(self, r_prev: Fp | None) -> list[Fp]:
        from ..sumcheck.mxu_exec import gruen_g_to_evals_host

        self._maybe_demote(need_fold=r_prev is not None)
        if self._inner is not None:
            self.rounds_done += 1
            return self._inner.round(r_prev)
        j = self.rounds_done
        one = self.cfg.one()
        if r_prev is not None:
            bk = self.beta[j - 1]
            self.pref = self.pref * ((one - bk) * (one - r_prev) + bk * r_prev)
            self._do_fold(jnp.asarray(fps_to_limbs([r_prev], self.cfg)[0]))
        nbh = self.active_local // (2 * self.tile)
        e_off = (self.b_local - self.active_local) // self.tile
        if self.use_pallas:
            gs = _sharded_gruen_eval_dyn(self.mesh, self.ctx, self.terms)(
                self.buf, self.e_flat, jnp.asarray([nbh, e_off], jnp.int32)
            )
        else:
            gs = _sharded_gruen_eval(self.mesh, self.ctx, self.terms, nbh, e_off)(
                self.buf, self.e_flat
            )
        evals = gruen_g_to_evals_host(
            self.cfg, [np.asarray(g) for g in gs], self._comb, self.terms,
            self.degree, self.beta[j], self.pref,
        )
        self.rounds_done += 1
        return evals

    def final_fold(self, r: Fp):
        self._maybe_demote(need_fold=True)
        return self._inner.final_fold(r)

    def final_values(self) -> list[Fp]:
        assert self._inner is not None, "gruen executor demotes before the end"
        return self._inner.final_values()


def wants_gruen_sharded(cfg: FieldConfig, comb, eq_idx: int, b: int, mesh: Mesh) -> bool:
    """True when the sharded Gruen executor will drive this shape."""
    from ..sumcheck.mxu_exec import TILE, gruen_supported

    idx_terms = tuple(tuple(idxs) for _, idxs in comb)
    d = mesh.size
    bl = b // d if b % d == 0 else 0
    return (
        gruen_supported(idx_terms, eq_idx, cfg.n16)
        and d & (d - 1) == 0
        and bl >= 4 * TILE
        and bl & (bl - 1) == 0
    )


def make_sharded_executor(cfg: FieldConfig, tables, degree: int, comb, mesh: Mesh,
                          eq_beta=None):
    """Best sharded tier for the shape: the Gruen eq-factorized limb-major
    executor when the caller factored eq out (``eq_beta`` given — caller
    gates on :func:`wants_gruen_sharded`), else the limb-major MXU executor
    when the term structure and field width support it AND the per-device
    block is large enough to pay for the layout, else the XLA-body
    executor."""
    from ..sumcheck.mxu_exec import TILE, mxu_supported

    idx_terms = tuple(tuple(idxs) for _, idxs in comb)
    b = tables.shape[1]
    d = mesh.size
    if eq_beta is not None:
        assert wants_gruen_sharded(cfg, comb, tables.shape[0], b, mesh)
        return ShardedGruenSumcheckExecutor(cfg, tables, degree, comb, mesh, eq_beta)
    if (
        mxu_supported(idx_terms, cfg.n16)
        and b % d == 0
        and (b // d) >= 4 * TILE
        and (b // d) & ((b // d) - 1) == 0
    ):
        return ShardedLmSumcheckExecutor(cfg, tables, degree, comb, mesh)
    return ShardedSumcheckExecutor(cfg, tables, degree, comb, mesh)


class ShardedSumcheckExecutor:
    """Drop-in for DeviceSumcheckExecutor with the 2^nv axis mesh-sharded.

    Delegates to a replicated single-device executor once the per-device
    block is too small to fold locally (the last ~log2(D) rounds, O(D·n_mles)
    work — negligible).
    """

    def __init__(self, cfg: FieldConfig, tables: jnp.ndarray, degree: int, comb, mesh: Mesh):
        self.cfg = cfg
        self.ctx = device_field(cfg)
        self.mesh = mesh
        self.degree = degree
        self.coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
        self.idx_terms = tuple(tuple(idxs) for _, idxs in comb)
        self._comb = comb
        d = mesh.size
        axes = tuple(mesh.axis_names)
        if tables.shape[1] % d == 0 and tables.shape[1] >= 2 * d:
            self.tables = jax.device_put(
                tables, NamedSharding(mesh, P(None, axes, None))
            )
            self._inner: DeviceSumcheckExecutor | None = None
        else:
            self.tables = None
            self._inner = DeviceSumcheckExecutor(cfg, jnp.asarray(tables), degree, comb)
        self._first = True

    def _maybe_demote(self) -> None:
        """Gather to a replicated executor when local blocks can't pair."""
        if self._inner is not None:
            return
        b = self.tables.shape[1]
        d = self.mesh.size
        # a sharded round folds (except the first) then pairs: needs b_local
        # after folding to still be even.
        need = 2 * d if self._first else 4 * d
        if b < need or (b // d) % 2 != 0:
            gathered = jax.device_put(
                jnp.asarray(_fetch_global(self.tables)),
                NamedSharding(self.mesh, P(None, None, None)),
            )
            self._inner = DeviceSumcheckExecutor(
                self.cfg, gathered, self.degree, self._comb
            )
            self.tables = None

    def round(self, r_prev: Fp | None) -> list[Fp]:
        self._maybe_demote()
        if self._inner is not None:
            return self._inner.round(r_prev)
        first = r_prev is None
        r = jnp.asarray(
            fps_to_limbs([r_prev if r_prev is not None else self.cfg.zero()], self.cfg)[0]
        )
        fn = _sharded_round_fn(self.mesh, self.ctx, first, self.degree, self.idx_terms)
        self.tables, wide = fn(self.tables, r, self.coeffs)
        self._first = False
        wide_np = np.asarray(wide)
        return [
            self.cfg.fp_from_mont(limbs_to_int(wide_np[t]) % self.cfg.q)
            for t in range(wide_np.shape[0])
        ]

    def final_fold(self, r: Fp):
        if self._inner is None:
            b, d = self.tables.shape[1], self.mesh.size
            if b < 2 * d or (b // d) % 2 != 0:
                gathered = jax.device_put(
                    jnp.asarray(_fetch_global(self.tables)),
                    NamedSharding(self.mesh, P(None, None, None)),
                )
                self._inner = DeviceSumcheckExecutor(
                    self.cfg, gathered, self.degree, self._comb
                )
                self.tables = None
        if self._inner is not None:
            return self._inner.final_fold(r)
        rl = jnp.asarray(fps_to_limbs([r], self.cfg)[0])
        self.tables = _sharded_fold_fn(self.mesh, self.ctx)(self.tables, rl)
        return self.tables

    def final_values(self) -> list[Fp]:
        if self._inner is not None:
            return self._inner.final_values()
        tables = _fetch_global(self.tables)
        assert tables.shape[1] == 1
        return [limbs_to_fp(tables[i, 0], self.cfg) for i in range(tables.shape[0])]
