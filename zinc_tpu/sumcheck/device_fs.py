"""Fully device-resident sumcheck: rounds + Fiat-Shamir in ONE program.

The classical executor syncs with the host every round (absorb the d+1
evaluations, squeeze the challenge — ~35-65 ms of tunnel latency per round).
Here the host exports its Keccak transcript state once, the device runs all
large rounds — fused fold+evaluate kernels interleaved with the device
sponge (ops/keccak_kernel.py) — and the host re-imports the sponge and
finishes the tiny tail rounds.  One host↔device round trip per sumcheck.

Byte/framing semantics are bit-identical to transcript.py (pinned by
tests): per round, absorb each evaluation as
0x03 ‖ q_be ‖ 0x05 0x01 ‖ mont_be ‖ 0x03, squeeze (digest + 0x00‖d‖0x01
ratchet + per-regime bit masking), absorb the challenge the same way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.config import FieldConfig, Fp
from ..fields.montgomery import DeviceField, device_field, mod_reduce_wide, mont_mul
from ..ops.keccak_kernel import DeviceSponge
from ..poly.device import limbs_to_fp
from ..transcript import KeccakTranscript
from .pallas_exec import TILE, _eval_fixed, _fold_eval_fixed


def _limbs_to_be_bytes(limbs: jnp.ndarray) -> jnp.ndarray:
    """(L,) u32 canonical 16-bit limbs → (2L,) u8 big-endian bytes."""
    hi8 = (limbs >> 8).astype(jnp.uint8)
    lo8 = (limbs & 0xFF).astype(jnp.uint8)
    return jnp.stack([hi8[::-1], lo8[::-1]], axis=1).reshape(-1)


def _field_frame(cfg: FieldConfig, mont_limbs: jnp.ndarray) -> jnp.ndarray:
    """absorb_field byte stream for one element (transcript.py:47-55)."""
    prefix = np.frombuffer(b"\x03" + cfg.modulus_bytes_be() + b"\x05\x01", np.uint8)
    suffix = np.frombuffer(b"\x03", np.uint8)
    return jnp.concatenate(
        [jnp.asarray(prefix), _limbs_to_be_bytes(mont_limbs), jnp.asarray(suffix)]
    )


def _digest_to_value_limbs(d: jnp.ndarray, qbits: int, l16: int) -> jnp.ndarray:
    """Masked challenge value limbs from a 32-byte digest
    (transcript.py:_get_challenge_limbs + get_challenge regimes)."""
    bits = qbits - 1

    def limb(msb_region: int, j: int) -> jnp.ndarray:
        base = 15 - 2 * j + msb_region
        return d[base].astype(jnp.uint32) | (d[base - 1].astype(jnp.uint32) << 8)

    lo = [limb(0, j) for j in range(8)]
    hi = [limb(16, j) for j in range(8)]

    def mask_at(limbs, start_bit):
        out = []
        for j, x in enumerate(limbs):
            avail = start_bit - 16 * j
            if avail <= 0:
                out.append(jnp.zeros((), jnp.uint32))
            elif avail >= 16:
                out.append(x)
            else:
                out.append(x & ((1 << avail) - 1))
        return out

    if bits < 128:
        lo = mask_at(lo, bits)
        hi = [jnp.zeros((), jnp.uint32)] * 8
    elif bits < 256:
        hi = mask_at(hi, bits - 128)
    value = jnp.stack(lo + hi)
    if l16 < 16:
        value = value[:l16]
    elif l16 > 16:
        value = jnp.concatenate([value, jnp.zeros(l16 - 16, jnp.uint32)])
    return value


def _make_fs_step(ctx: DeviceField, cfg_key, degree: int, l: int):
    """Shared Fiat-Shamir round step: absorb evals → squeeze+ratchet →
    challenge r (absorbed) — dynamic-position sponge (one trace serves
    every round).  Used by both the classic and the Gruen FS kernels."""
    from ..fields.montgomery import mont_mul
    from ..ops.keccak_kernel import absorb_dyn, digest_dyn

    qbits, cfg = cfg_key.qbits, cfg_key.cfg
    r2 = jnp.asarray(ctx.r2)
    n_points = degree + 1

    def fs_step(lanes, sbuf, pos, evals):
        frames = [_field_frame(cfg, evals[p]) for p in range(n_points)]
        lanes, sbuf, pos = absorb_dyn(lanes, sbuf, pos, jnp.concatenate(frames))
        d = digest_dyn(lanes, sbuf, pos)
        ratchet = jnp.concatenate(
            [jnp.zeros(1, jnp.uint8), d, jnp.full(1, 1, jnp.uint8)]
        )
        lanes, sbuf, pos = absorb_dyn(lanes, sbuf, pos, ratchet)
        value = _digest_to_value_limbs(d, qbits, l)
        r = mont_mul(ctx, value, r2)  # cfg.fp(value): to Montgomery form
        lanes, sbuf, pos = absorb_dyn(lanes, sbuf, pos, _field_frame(cfg, r))
        return lanes, sbuf, pos, r

    return fs_step


@partial(jax.jit, static_argnums=(0, 3, 6, 7, 8, 9, 10, 11))
def _sumcheck_fs_kernel_gruen(
    ctx: DeviceField,
    buf: jnp.ndarray,  # (n_tabs, B, L) — WITHOUT the eq MLE
    beta: jnp.ndarray,  # (nvars, L) Montgomery limbs of β
    cfg_key,  # _StaticCfg
    coeffs: jnp.ndarray,
    sponge_state,
    pos0: int,
    degree: int,
    idx_terms: tuple,  # full comb indices; eq_idx == n_tabs as last of each
    kinds: tuple,
    n_dev_rounds: int,
    use_pallas: bool,
):
    """Gruen eq-factorized device-FS sumcheck (sumcheck/mxu_exec.py §Gruen).

    The eq MLE never rides the fold: round j evaluates
    s_j(t) = pref_j · c_j(t) · Σ_i coeff_i · h_{i,j}(t) against the
    precomputed suffix-eq level E_j, with pref ratcheted per round by
    eq(β_j, r_j).  Transcript bytes are identical to the classic kernel
    (same s_j values, same framing).  Returns the folded buffer WITH the
    eq row reconstructed (pref · E_level) so callers — the host tail and
    final-values paths — are oblivious to the factorization."""
    from .mxu_exec import (
        TILE as MTILE,
        _eval_lm_gruen,
        _fold_lm,
        _from_lm,
        _to_lm,
        build_eq_suffix_flat,
        eq_factor,
        eval_lm_gruen_ref,
        fold_lm_ref,
        gruen_g_to_evals_device,
        gruen_term_meta,
        suffix_offsets,
    )

    n_tabs, b_total, l = buf.shape
    nvars = beta.shape[0]
    eq_idx = n_tabs
    gterms = gruen_term_meta(idx_terms, eq_idx, l)
    n_points = degree + 1
    lanes, sbuf = sponge_state
    pos = jnp.asarray(pos0, jnp.int32)
    fs_step = _make_fs_step(ctx, cfg_key, degree, l)

    # Every device round is an MXU-tier round: n_dev stops at eval size
    # < 2·TILE ⇔ act < 4·TILE, the same bound as the fold kernel's grid.
    n_mxu = 1
    a = b_total
    while n_mxu < n_dev_rounds and a >= 4 * MTILE:
        n_mxu += 1
        a //= 2
    assert n_mxu == n_dev_rounds and n_mxu >= 2, (n_mxu, n_dev_rounds)

    e_flat = build_eq_suffix_flat(ctx, beta, nvars)  # (l, 2^nvars)
    buf_lm = _to_lm(buf, b_total)
    offs = suffix_offsets(nvars)

    evals_arr = jnp.zeros((n_dev_rounds, n_points, l), jnp.uint32)
    rs_arr = jnp.zeros((n_dev_rounds, l), jnp.uint32)
    pref = jnp.asarray(ctx.one)

    # round 0 (j = 1): evaluation only; E_1 sits at lane offset 0
    if use_pallas:
        gs = _eval_lm_gruen(
            ctx, buf_lm, e_flat, gterms,
            jnp.asarray(b_total // (2 * MTILE), jnp.int32),
            jnp.asarray(0, jnp.int32),
        )
    else:
        gs = eval_lm_gruen_ref(ctx, buf_lm, e_flat, gterms, b_total // (2 * MTILE), 0)
    evals = gruen_g_to_evals_device(ctx, gs, coeffs, gterms, degree, beta[0], pref)
    lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
    evals_arr = evals_arr.at[0].set(evals)
    rs_arr = rs_arr.at[0].set(r)

    # rounds 1..n_mxu−1: identical structure → ONE fori_loop trace (pallas)
    if use_pallas:
        def loop_body(i, state):
            buf_lm, act, lanes, sbuf, pos, r, pref, evals_arr, rs_arr = state
            b_prev = jax.lax.dynamic_slice(beta, (i - 1, jnp.int32(0)), (1, l))[0]
            pref = mont_mul(ctx, pref, eq_factor(ctx, b_prev, r))
            buf_lm = _fold_lm(ctx, buf_lm, r, act // (4 * MTILE))
            act = act // 2
            gs = _eval_lm_gruen(
                ctx, buf_lm, e_flat, gterms,
                act // (2 * MTILE), (b_total - act) // MTILE,
            )
            b_j = jax.lax.dynamic_slice(beta, (i, jnp.int32(0)), (1, l))[0]
            evals = gruen_g_to_evals_device(ctx, gs, coeffs, gterms, degree, b_j, pref)
            lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
            evals_arr = jax.lax.dynamic_update_slice(
                evals_arr, evals[None], (i, jnp.int32(0), jnp.int32(0))
            )
            rs_arr = jax.lax.dynamic_update_slice(rs_arr, r[None], (i, jnp.int32(0)))
            return buf_lm, act, lanes, sbuf, pos, r, pref, evals_arr, rs_arr

        state = (buf_lm, jnp.asarray(b_total, jnp.int32), lanes, sbuf, pos, r,
                 pref, evals_arr, rs_arr)
        state = jax.lax.fori_loop(1, n_mxu, loop_body, state)
        buf_lm, _, lanes, sbuf, pos, r, pref, evals_arr, rs_arr = state
    else:
        act = b_total
        for i in range(1, n_mxu):
            pref = mont_mul(ctx, pref, eq_factor(ctx, beta[i - 1], r))
            buf_lm = fold_lm_ref(ctx, buf_lm, r, act // (4 * MTILE))
            act //= 2
            gs = eval_lm_gruen_ref(
                ctx, buf_lm, e_flat, gterms,
                act // (2 * MTILE), (b_total - act) // MTILE,
            )
            evals = gruen_g_to_evals_device(
                ctx, gs, coeffs, gterms, degree, beta[i], pref
            )
            lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
            evals_arr = evals_arr.at[i].set(evals)
            rs_arr = rs_arr.at[i].set(r)

    # Reconstruct the folded eq row for the caller: after n_mxu−1 folds the
    # classic eq table equals pref_{n_mxu} · E_{n_mxu−1} (lanes align — both
    # bit-reversed over the same suffix variables).
    active = b_total >> (n_mxu - 1)
    lvl = jax.lax.slice_in_dim(e_flat, int(offs[n_mxu - 2]),
                               int(offs[n_mxu - 2]) + active, axis=1)
    eq_lm = jax.vmap(lambda col: mont_mul(ctx, pref, col), in_axes=1, out_axes=1)(lvl)
    out = jnp.concatenate(
        [_from_lm(buf_lm, active), _from_lm(eq_lm[None], active)], axis=0
    )
    return out, evals_arr, rs_arr, lanes, sbuf


@partial(jax.jit, static_argnums=(0, 2, 5, 6, 7, 8, 9, 10))
def _sumcheck_fs_kernel(
    ctx: DeviceField,
    buf: jnp.ndarray,  # (n_mles, B, L)
    cfg_key,  # _StaticCfg (hashable: modulus identity)
    coeffs: jnp.ndarray,
    sponge_state,  # (lanes (25,2) u32, buf (136,) u8)
    pos0: int,
    degree: int,
    idx_terms: tuple,
    kinds: tuple,
    n_dev_rounds: int,
    use_pallas: bool,
):
    """Run n_dev_rounds sumcheck rounds with device Fiat-Shamir.

    use_pallas=False runs the XLA round body instead (shapes shrink per
    unrolled round) — the CPU-testable oracle of this whole program.
    """
    from .device import _round_body
    from .mxu_exec import (
        TILE as MTILE,
        _eval_lm,
        _fold_lm,
        _from_lm,
        _to_lm,
        g_to_evals_device,
        mxu_supported,
        term_meta,
    )

    l = buf.shape[2]
    lanes, sbuf = sponge_state
    pos = jnp.asarray(pos0, jnp.int32)
    n_points = degree + 1
    fs_step = _make_fs_step(ctx, cfg_key, degree, l)

    active = buf.shape[1]
    use_mxu = use_pallas and mxu_supported(idx_terms, l)
    terms = term_meta(idx_terms, l) if use_mxu else None
    buf_lm = _to_lm(buf, active) if use_mxu and active >= 2 * MTILE else None
    evals_arr = jnp.zeros((n_dev_rounds, n_points, l), jnp.uint32)
    rs_arr = jnp.zeros((n_dev_rounds, l), jnp.uint32)
    r = jnp.zeros(l, jnp.uint32)
    rnd = 0

    if buf_lm is not None:
        # round 0: evaluation only
        gs = _eval_lm(ctx, buf_lm, terms, jnp.asarray(active // (2 * MTILE), jnp.int32))
        evals = g_to_evals_device(ctx, gs, coeffs, terms, degree)
        lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
        evals_arr = evals_arr.at[0].set(evals)
        rs_arr = rs_arr.at[0].set(r)
        rnd = 1
        # fold rounds with identical structure roll into ONE fori_loop body —
        # the unrolled form costs tens of minutes of tracing per process
        n_mxu = 1
        a = active
        while n_mxu < n_dev_rounds and a >= 4 * MTILE:
            n_mxu += 1
            a //= 2

        def loop_body(i, state):
            buf_lm, act, lanes, sbuf, pos, r, evals_arr, rs_arr = state
            buf_lm = _fold_lm(ctx, buf_lm, r, act // (4 * MTILE))
            act = act // 2
            gs = _eval_lm(ctx, buf_lm, terms, act // (2 * MTILE))
            evals = g_to_evals_device(ctx, gs, coeffs, terms, degree)
            lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
            evals_arr = jax.lax.dynamic_update_slice(
                evals_arr, evals[None], (i, jnp.int32(0), jnp.int32(0))
            )
            rs_arr = jax.lax.dynamic_update_slice(rs_arr, r[None], (i, jnp.int32(0)))
            return buf_lm, act, lanes, sbuf, pos, r, evals_arr, rs_arr

        if n_mxu > 1:
            state = (buf_lm, jnp.asarray(active, jnp.int32), lanes, sbuf, pos, r,
                     evals_arr, rs_arr)
            state = jax.lax.fori_loop(1, n_mxu, loop_body, state)
            buf_lm, _, lanes, sbuf, pos, r, evals_arr, rs_arr = state
            active >>= n_mxu - 1
        rnd = n_mxu
        if rnd < n_dev_rounds:
            buf = _from_lm(buf_lm, active)
            buf_lm = None

    for rnd in range(rnd, n_dev_rounds):
        if use_pallas:
            if rnd == 0:
                wide = _eval_fixed(
                    ctx, buf, coeffs, degree, idx_terms, kinds, active // (2 * TILE)
                )
            else:
                buf, wide = _fold_eval_fixed(
                    ctx, buf, r, coeffs, degree, idx_terms, kinds,
                    active // (4 * TILE),
                )
                active //= 2
        else:
            buf, wide = _round_body(
                ctx, buf, (r, coeffs), rnd == 0, degree, idx_terms
            )
        evals = mod_reduce_wide(ctx, wide)  # (P, L) Montgomery residues
        lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
        evals_arr = evals_arr.at[rnd].set(evals)
        rs_arr = rs_arr.at[rnd].set(r)

    if buf_lm is not None:
        buf = _from_lm(buf_lm, active)

    return (
        buf,
        evals_arr,  # (rounds, P, L)
        rs_arr,  # (rounds, L)
        lanes,
        sbuf,
    )


class _StaticCfg:
    """Hashable static wrapper so cfg data rides as a jit static arg."""

    def __init__(self, cfg: FieldConfig):
        self.cfg = cfg
        self.qbits = cfg.q.bit_length()

    def __hash__(self):
        return hash((self.cfg.q, self.cfg.n64))

    def __eq__(self, other):
        return isinstance(other, _StaticCfg) and self.cfg.q == other.cfg.q


def wants_gruen(cfg: FieldConfig, comb, eq_idx: int, b: int) -> bool:
    """True when the Gruen eq-factorized FS kernel will drive this shape:
    every term carries eq last with 1-3 other factors, ≤ 512-bit field,
    and the table is large enough that every device round is MXU-sized."""
    from .mxu_exec import TILE as MTILE, gruen_supported

    idx_terms = tuple(tuple(idxs) for _, idxs in comb)
    # b must grant >= 2 device rounds under BOTH tile bounds: the FS driver
    # sizes n_dev with the VPU tile (256) while the Gruen kernel needs MXU
    # tiles - with ZINC_TPU_MXU_TILE below 256 the VPU bound dominates
    return gruen_supported(idx_terms, eq_idx, cfg.n16) and b >= max(4 * MTILE, 1024)


def prove_as_subprotocol_device_fs(
    transcript: KeccakTranscript,
    cfg: FieldConfig,
    tables: jnp.ndarray,  # (n_mles, 2^nvars, L) Montgomery limbs
    nvars: int,
    degree: int,
    comb,
    eq_beta=None,  # list[Fp] | None — when given, `tables` EXCLUDES the eq
    #              MLE (comb references it as index n_mles) and the Gruen
    #              kernel factors it out of the fold entirely
):
    """Transcript-identical sumcheck with device-resident Fiat-Shamir.

    Returns (proof, randomness, folded_tables_or_host_mles) like the
    classical executor path; the host transcript object is advanced to the
    exact state a host-side prover would have left it in.
    """
    from ..poly.device import fps_to_limbs
    from .device import _use_pallas
    from .prover import _absorb_nvars_degree, _fold, _round_evals

    _absorb_nvars_degree(transcript, nvars, degree, cfg)

    b = tables.shape[1]
    use_pallas = _use_pallas(b)
    # rounds runnable on device: eval at round r covers b/2^r entries ≥ 2·TILE
    # (pallas); the XLA variant can run every round but gains nothing below
    # a few thousand entries — same threshold keeps the tail on host.
    n_dev = 0
    size = b
    while n_dev < nvars and size >= 2 * TILE:
        n_dev += 1
        size //= 2

    ctx = device_field(cfg)
    coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
    idx_terms = tuple(tuple(idxs) for _, idxs in comb)
    one = cfg.one()
    neg_one = -one
    kinds = tuple("u" if c == one else ("n" if c == neg_one else "g") for c, _ in comb)

    proof: list[list[Fp]] = []
    randomness: list[Fp] = []
    mles_host = None
    buf = jnp.asarray(tables)
    active = b

    gruen = eq_beta is not None
    if gruen:
        assert wants_gruen(cfg, comb, tables.shape[0], b) and n_dev >= 2, (
            "caller must gate the Gruen path on wants_gruen()"
        )
        # the Gruen kernel runs EVERY device round on the MXU tier (its
        # fori_loop body has no VPU tail), so cap n_dev at the MXU bound —
        # equal to the VPU bound at the default TILE, smaller when
        # ZINC_TPU_MXU_TILE raises the tile size
        from .mxu_exec import TILE as MTILE

        n_mxu = 1
        size = b
        while n_mxu < nvars and size >= 4 * MTILE:
            n_mxu += 1
            size //= 2
        n_dev = min(n_dev, n_mxu)

    if n_dev:
        from ..utils.export_cache import cached_call

        sp = DeviceSponge.from_host(transcript.h)
        # the whole-sumcheck FS program is the largest trace in the system;
        # route it through the jax.export disk cache so cold processes skip
        # re-tracing (utils/export_cache.py; VERDICT r2 item 6)
        static_key = (cfg.q, int(sp.pos), degree, idx_terms, kinds, n_dev,
                      use_pallas)
        if gruen:
            beta_l = jnp.asarray(fps_to_limbs(eq_beta, cfg))
            out = cached_call(
                "fs-gruen", static_key,
                lambda bu, be, co, sponge: _sumcheck_fs_kernel_gruen(
                    ctx, bu, be, _StaticCfg(cfg), co, sponge, sp.pos,
                    degree, idx_terms, kinds, n_dev, use_pallas,
                ),
                buf, beta_l, coeffs, (sp.lanes, sp.buf),
            )
        else:
            out = cached_call(
                "fs-classic", static_key,
                lambda bu, co, sponge: _sumcheck_fs_kernel(
                    ctx, bu, _StaticCfg(cfg), co, sponge, sp.pos,
                    degree, idx_terms, kinds, n_dev, use_pallas,
                ),
                buf, coeffs, (sp.lanes, sp.buf),
            )
        buf, evals_dev, rs_dev, lanes, sbuf = out
        # the buffer position is fully static: absorb totals mod the rate
        frame = 2 * cfg.nbytes + 4
        pos = (sp.pos + n_dev * ((degree + 1) * frame + 34 + frame)) % 136
        evals_np = np.asarray(evals_dev)
        rs_np = np.asarray(rs_dev)
        lanes_np, sbuf_np = np.asarray(lanes), np.asarray(sbuf)
        DeviceSponge(None, None, pos).export_to_host(transcript.h, lanes_np, sbuf_np)
        for rnd in range(n_dev):
            proof.append(
                [limbs_to_fp(evals_np[rnd, p], cfg) for p in range(evals_np.shape[1])]
            )
            randomness.append(limbs_to_fp(rs_np[rnd], cfg))
        active = b >> (n_dev - 1)

    arr = np.asarray(buf[:, : active, :])
    return _host_tail(
        transcript, cfg, arr, proof, randomness, n_dev, nvars, degree, comb
    )


def _host_tail(
    transcript: KeccakTranscript,
    cfg: FieldConfig,
    arr: np.ndarray,  # (n_mles, active, L) downloaded remainder, batch-major
    proof: list,
    randomness: list,
    n_done: int,
    nvars: int,
    degree: int,
    comb,
):
    """Finish a device-FS sumcheck on host, bit-identically: fold the last
    device challenge, then run the remaining rounds (if any) through the
    host oracle.  Shared by the single-chip and sharded FS drivers."""
    from .prover import _fold, _round_evals

    mles_host = [
        [limbs_to_fp(arr[i, x], cfg) for x in range(arr.shape[1])]
        for i in range(arr.shape[0])
    ]
    if n_done == nvars:
        # fold the final challenge on host over the downloaded remainder
        return proof, randomness, _fold(mles_host, randomness[-1])
    for rnd in range(n_done, nvars):
        if rnd > 0:
            mles_host = _fold(mles_host, randomness[-1])
        evals = _round_evals(mles_host, degree, comb, cfg)
        transcript.absorb_field_slice(evals)
        proof.append(evals)
        r = transcript.get_challenge(cfg)
        transcript.absorb_field(r)
        randomness.append(r)
    return proof, randomness, _fold(mles_host, randomness[-1])