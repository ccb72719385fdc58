"""Sharded device-resident Fiat-Shamir sumcheck: ONE sync per sumcheck on a mesh.

The per-round sharded executors (parallel/sumcheck.py) close every round
with a host round trip — psum'd G planes download, host decode, host
Keccak, challenge upload.  Over the tunnel that is ~35-65 ms × rounds; on
a pod it is still a host-device ping-pong per round.  This module runs all
MXU-sized rounds of a sharded sumcheck — folds, evaluations, transcript —
inside ONE jitted ``shard_map`` program:

* the limb-major bit-reversed table blocks stay device-local and fold
  locally (high-bit block sharding keeps every pair on one device);
* each round's G byte planes close with a ``psum`` (the only collective);
* the decode (``g_to_evals_device``) and the Keccak sponge then run
  REPLICATED — every device computes the identical challenge from the
  identical psum'd planes, so no broadcast is ever needed.

Transcript bytes are identical to the host prover's (same framing as the
single-chip FS kernel, sumcheck/device_fs.py, which tests pin against the
host oracle).  The Gruen eq-factorized variant keeps the eq MLE out of
the fold on every device and ratchets the prefix replicated; the folded
eq row is reconstructed on-device from the per-device pre-scaled suffix
buffer before the remainder is handed back (callers stay oblivious).

The reference's analog is the per-round Rayon fold/reduce plus a
sequential transcript (/root/reference/src/sumcheck/prover.rs:62-179);
here the whole protocol phase is one XLA program per sumcheck.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.config import FieldConfig, Fp
from ..fields.montgomery import DeviceField, device_field, mont_mul
from ..poly.device import fps_to_limbs, limbs_to_fp
from ..transcript import KeccakTranscript
from .mesh import fetch_global
from .sumcheck import _lm_use_pallas, _sharded_lm_prep, build_sharded_suffix


def wants_fs_sharded(
    cfg: FieldConfig, comb, b: int, mesh: Mesh, eq_idx: int | None = None
) -> bool:
    """True when the one-sync sharded FS kernel can drive this shape:
    power-of-two local blocks big enough for ≥ 2 MXU-tier device rounds,
    and the term structure supported by the (Gruen when ``eq_idx`` given,
    else classic) MXU tier."""
    from ..sumcheck.mxu_exec import TILE as MTILE, gruen_supported, mxu_supported

    idx_terms = tuple(tuple(idxs) for _, idxs in comb)
    d = mesh.size
    if d & (d - 1) or b % d:
        return False
    bl = b // d
    if bl & (bl - 1) or bl < 4 * MTILE:
        return False
    if eq_idx is not None:
        return gruen_supported(idx_terms, eq_idx, cfg.n16)
    return mxu_supported(idx_terms, cfg.n16)


@lru_cache(maxsize=32)
def _fs_sharded_fn(
    mesh: Mesh,
    ctx: DeviceField,
    cfg_key,  # sumcheck.device_fs._StaticCfg
    pos0: int,
    degree: int,
    idx_terms: tuple,
    n_dev: int,
    use_pallas: bool,
    gruen: bool,
    n_tabs: int,
):
    from ..sumcheck.device_fs import _make_fs_step
    from ..sumcheck.mxu_exec import (
        TILE as MTILE,
        _eval_lm,
        _eval_lm_gruen,
        _fold_lm,
        _from_lm,
        eq_factor,
        eval_lm_gruen_ref,
        eval_lm_ref,
        fold_lm_ref,
        g_to_evals_device,
        gruen_g_to_evals_device,
        gruen_term_meta,
        suffix_offsets,
        term_meta,
    )

    axes = tuple(mesh.axis_names)
    l = ctx.n16
    n_points = degree + 1
    terms = (
        gruen_term_meta(idx_terms, n_tabs, l) if gruen else term_meta(idx_terms, l)
    )

    def psum_gs(gs):
        return tuple(jax.lax.psum(g, axes) for g in gs)

    def local_prog(buf_lm, coeffs, lanes, sbuf, e_flat=None, beta=None):
        b_local = buf_lm.shape[2]
        pos = jnp.asarray(pos0, jnp.int32)
        fs_step = _make_fs_step(ctx, cfg_key, degree, l)
        evals_arr = jnp.zeros((n_dev, n_points, l), jnp.uint32)
        rs_arr = jnp.zeros((n_dev, l), jnp.uint32)
        pref = jnp.asarray(ctx.one)

        def decode(gs, i, pref):
            if gruen:
                b_i = jax.lax.dynamic_slice(beta, (i, jnp.int32(0)), (1, l))[0]
                return gruen_g_to_evals_device(
                    ctx, gs, coeffs, terms, degree, b_i, pref
                )
            return g_to_evals_device(ctx, gs, coeffs, terms, degree)

        # round 0: evaluation only
        if use_pallas:
            if gruen:
                gs = _eval_lm_gruen(
                    ctx, buf_lm, e_flat, terms,
                    jnp.asarray(b_local // (2 * MTILE), jnp.int32),
                    jnp.asarray(0, jnp.int32),
                )
            else:
                gs = _eval_lm(
                    ctx, buf_lm, terms, jnp.asarray(b_local // (2 * MTILE), jnp.int32)
                )
        else:
            if gruen:
                gs = eval_lm_gruen_ref(
                    ctx, buf_lm, e_flat, terms, b_local // (2 * MTILE), 0
                )
            else:
                gs = eval_lm_ref(ctx, buf_lm, terms, b_local // (2 * MTILE))
        evals = decode(psum_gs(gs), jnp.int32(0), pref)
        lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
        evals_arr = evals_arr.at[0].set(evals)
        rs_arr = rs_arr.at[0].set(r)

        # rounds 1..n_dev−1: fold + eval + psum + replicated FS
        if use_pallas:
            def loop_body(i, state):
                buf_lm, act, lanes, sbuf, pos, r, pref, evals_arr, rs_arr = state
                if gruen:
                    b_prev = jax.lax.dynamic_slice(
                        beta, (i - 1, jnp.int32(0)), (1, l)
                    )[0]
                    pref = mont_mul(ctx, pref, eq_factor(ctx, b_prev, r))
                buf_lm = _fold_lm(ctx, buf_lm, r, act // (4 * MTILE))
                act = act // 2
                if gruen:
                    gs = _eval_lm_gruen(
                        ctx, buf_lm, e_flat, terms,
                        act // (2 * MTILE), (b_local - act) // MTILE,
                    )
                else:
                    gs = _eval_lm(ctx, buf_lm, terms, act // (2 * MTILE))
                evals = decode(psum_gs(gs), i, pref)
                lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
                evals_arr = jax.lax.dynamic_update_slice(
                    evals_arr, evals[None], (i, jnp.int32(0), jnp.int32(0))
                )
                rs_arr = jax.lax.dynamic_update_slice(
                    rs_arr, r[None], (i, jnp.int32(0))
                )
                return buf_lm, act, lanes, sbuf, pos, r, pref, evals_arr, rs_arr

            state = (buf_lm, jnp.asarray(b_local, jnp.int32), lanes, sbuf, pos,
                     r, pref, evals_arr, rs_arr)
            state = jax.lax.fori_loop(1, n_dev, loop_body, state)
            buf_lm, _, lanes, sbuf, pos, r, pref, evals_arr, rs_arr = state
        else:
            act = b_local
            for i in range(1, n_dev):
                if gruen:
                    pref = mont_mul(ctx, pref, eq_factor(ctx, beta[i - 1], r))
                buf_lm = fold_lm_ref(ctx, buf_lm, r, act // (4 * MTILE))
                act //= 2
                if gruen:
                    gs = eval_lm_gruen_ref(
                        ctx, buf_lm, e_flat, terms,
                        act // (2 * MTILE), (b_local - act) // MTILE,
                    )
                else:
                    gs = eval_lm_ref(ctx, buf_lm, terms, act // (2 * MTILE))
                evals = decode(psum_gs(gs), jnp.int32(i), pref)
                lanes, sbuf, pos, r = fs_step(lanes, sbuf, pos, evals)
                evals_arr = evals_arr.at[i].set(evals)
                rs_arr = rs_arr.at[i].set(r)

        active = b_local >> (n_dev - 1)
        out = _from_lm(buf_lm, active)
        if gruen:
            # folded eq row for the host tail: pref · (pre-scaled local
            # suffix level n_dev−1) — the per-device w_d is already folded
            # into e_flat, so this is the exact global eq restriction
            nv_local = b_local.bit_length() - 1
            offs = suffix_offsets(nv_local)
            lvl = jax.lax.slice_in_dim(
                e_flat, int(offs[n_dev - 2]), int(offs[n_dev - 2]) + active, axis=1
            )
            eq_lm = jax.vmap(
                lambda col: mont_mul(ctx, pref, col), in_axes=1, out_axes=1
            )(lvl)
            out = jnp.concatenate([out, _from_lm(eq_lm[None], active)], axis=0)
        return out, evals_arr, rs_arr, lanes, sbuf

    n_out = n_tabs + 1 if gruen else n_tabs
    in_specs = [P(None, None, axes), P(None, None), P(None, None), P(None)]
    if gruen:
        in_specs += [P(None, axes), P(None, None)]
    fn = jax.shard_map(
        local_prog,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(
            P(None, axes, None),
            P(None, None, None),
            P(None, None),
            P(None, None),
            P(None),
        ),
        # evals/sponge are replicated by construction (computed from psum'd
        # planes), but the checker can't see that through the hash kernels
        check_vma=False,
    )
    return jax.jit(fn)


def prove_as_subprotocol_device_fs_sharded(
    transcript: KeccakTranscript,
    cfg: FieldConfig,
    tables,  # (n_tabs, 2^nvars, L) Montgomery limbs (host or device)
    nvars: int,
    degree: int,
    comb,
    mesh: Mesh,
    eq_beta=None,  # list[Fp] | None — Gruen: `tables` EXCLUDES the eq MLE
):
    """Transcript-identical sharded sumcheck with device Fiat-Shamir.

    Callers gate on :func:`wants_fs_sharded`.  Returns
    (proof, randomness, mles_host) like the single-chip FS driver.  The
    program — the largest trace in the system — is routed through the
    jax.export disk cache with mesh-topology-keyed sharded avals
    (utils/export_cache.py), so on a multi-host deployment only the first
    process per topology pays the trace."""
    from ..ops.keccak_kernel import DeviceSponge
    from ..sumcheck.device_fs import _StaticCfg, _host_tail
    from ..sumcheck.mxu_exec import TILE as MTILE
    from ..sumcheck.prover import _absorb_nvars_degree

    _absorb_nvars_degree(transcript, nvars, degree, cfg)

    from ..utils.timing import timed

    ctx = device_field(cfg)
    b = tables.shape[1]
    d = mesh.size
    b_local = b // d
    use_pallas = _lm_use_pallas(b_local)
    gruen = eq_beta is not None

    n_dev = 1
    a = b_local
    while n_dev < nvars and a >= 4 * MTILE:
        n_dev += 1
        a //= 2
    assert n_dev >= 2, "wants_fs_sharded guarantees >= 2 device rounds"

    axes = tuple(mesh.axis_names)
    with timed("fs_sharded.prep"):
        sharded = jax.device_put(
            jnp.asarray(tables), NamedSharding(mesh, P(None, axes, None))
        )
        buf_lm = _sharded_lm_prep(mesh, b_local)(sharded)
        coeffs = jnp.asarray(fps_to_limbs([c for c, _ in comb], cfg))
    idx_terms = tuple(tuple(idxs) for _, idxs in comb)

    sp = DeviceSponge.from_host(transcript.h)
    fn = _fs_sharded_fn(
        mesh, ctx, _StaticCfg(cfg), int(sp.pos), degree, idx_terms,
        n_dev, use_pallas, gruen, tables.shape[0],
    )
    from ..utils.export_cache import cached_call

    repl = NamedSharding(mesh, P())
    coeffs = jax.device_put(coeffs, repl)
    lanes0 = jax.device_put(sp.lanes, repl)
    sbuf0 = jax.device_put(sp.buf, repl)
    static_key = (cfg.q, int(sp.pos), degree, idx_terms, n_dev, use_pallas,
                  gruen, tables.shape[0])
    if gruen:
        with timed("fs_sharded.suffix"):
            e_flat = build_sharded_suffix(cfg, ctx, mesh, eq_beta, b_local, d)
            beta_l = jax.device_put(jnp.asarray(fps_to_limbs(eq_beta, cfg)), repl)
        args = (buf_lm, coeffs, lanes0, sbuf0, e_flat, beta_l)
    else:
        args = (buf_lm, coeffs, lanes0, sbuf0)
    with timed("fs_sharded.launch"):
        out = cached_call(
            "fs-sharded-gruen" if gruen else "fs-sharded-classic",
            static_key, fn, *args,
            in_shardings=tuple(a.sharding for a in args),
        )
    buf_out, evals_dev, rs_dev, lanes, sbuf = out

    # absorb totals are fully static → the buffer position is too
    frame = 2 * cfg.nbytes + 4
    pos = (sp.pos + n_dev * ((degree + 1) * frame + 34 + frame)) % 136
    with timed("fs_sharded.fetch"):
        evals_np = np.asarray(evals_dev)
        rs_np = np.asarray(rs_dev)
        lanes_np, sbuf_np = np.asarray(lanes), np.asarray(sbuf)
        arr = fetch_global(buf_out)  # (n_tabs[+1], d·act_local, L) global order
    DeviceSponge(None, None, pos).export_to_host(transcript.h, lanes_np, sbuf_np)
    proof: list[list[Fp]] = []
    randomness: list[Fp] = []
    for rnd in range(n_dev):
        proof.append(
            [limbs_to_fp(evals_np[rnd, p], cfg) for p in range(evals_np.shape[1])]
        )
        randomness.append(limbs_to_fp(rs_np[rnd], cfg))

    with timed("fs_sharded.host_tail"):
        return _host_tail(
            transcript, cfg, arr, proof, randomness, n_dev, nvars, degree, comb
        )
