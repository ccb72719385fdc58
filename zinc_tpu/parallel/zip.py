"""Row-sharded Zip PCS commit: RAA encode + BLAKE3 Merkle over a mesh.

The codeword matrix is (num_rows, codeword_len); RAA encoding, leaf hashing
and every Merkle level merge are row-independent (the seeded permutations act
*within* a row — /root/reference/src/zip/code_raa.rs:88-105 encodes each row
separately), so the natural mesh layout shards rows and needs zero
communication: each device encodes and hashes its row block, and only the
32-byte per-row roots come back to the host.  This replaces the reference's
Rayon chunking of rows (/root/reference/src/zip/pcs/commit.rs:158-183).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.config import FieldConfig
from ..fields.integers import cumsum_wrap, sign_extend
from ..fields.limbs import i64_to_limbs, ints_to_limbs
from ..ops.blake3_kernel import merkle_tree_device
from ..zip.device import DeviceZipData
from ..zip.pcs import ZipCommitment, ZipParams
from .mesh import fetch_global


@lru_cache(maxsize=32)
def _sharded_commit_fn(mesh: Mesh, row_len: int, rep: int, lk: int, kwords: int, n_levels: int):
    axis = mesh.axis_names[0]

    def local_commit(rows, p1, p2):
        # rows: (R_local, row_len, Ln) two's-complement limbs
        vec = sign_extend(rows, lk)
        vec = jnp.concatenate([vec] * rep, axis=1)  # repeat
        vec = vec[:, p1, :]
        vec = cumsum_wrap(vec, axis=1)
        vec = vec[:, p2, :]
        enc = cumsum_wrap(vec, axis=1)  # (R_local, cw, lk)
        layers = merkle_tree_device(enc, kwords)
        return enc, tuple(layers)

    fn = jax.shard_map(
        local_commit,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(None), P(None)),
        out_specs=(
            P(axis, None, None),
            tuple(P(axis, None, None) for _ in range(n_levels)),
        ),
    )
    return jax.jit(fn)


def commit_device_sharded(
    pp: ZipParams, z_values, cfg: FieldConfig, mesh: Mesh
) -> tuple[DeviceZipData, ZipCommitment]:
    """Row-sharded commit; byte-identical roots/layers to zip.device.commit_device."""
    row_len = pp.code.row_len
    rep = pp.code.repetition_factor
    lk = 4 * pp.zt.k_words
    cw = pp.code.codeword_len()
    p1, p2 = pp.code.permutations()
    num_rows = pp.num_rows

    if num_rows % mesh.size != 0:
        from ..zip.device import commit_device

        return commit_device(pp, z_values, cfg)

    if isinstance(z_values, np.ndarray) and z_values.dtype == np.int64:
        z_limbs = i64_to_limbs(z_values, 4 * pp.zt.n_words)
    else:
        z_limbs = ints_to_limbs(list(z_values), 4 * pp.zt.n_words)
    rows = z_limbs.reshape(num_rows, row_len, -1)
    axis = mesh.axis_names[0]
    rows = jax.device_put(rows, NamedSharding(mesh, P(axis, None, None)))

    n_levels = max(cw.bit_length() - 1, 0) + 1  # leaves + each merge level
    fn = _sharded_commit_fn(mesh, row_len, rep, lk, pp.zt.k_words, n_levels)
    enc, layers_dev = fn(rows, jnp.asarray(p1), jnp.asarray(p2))

    enc_np = fetch_global(enc.astype(jnp.uint16))
    layers = [fetch_global(l) for l in layers_dev]
    roots = [layers[-1][r, 0].astype("<u4").tobytes() for r in range(num_rows)]
    return DeviceZipData(enc_np, layers, roots), ZipCommitment(roots)


# ---------------------------------------------------------------------------
# 2-D mesh: rows × row-interior (SURVEY §7 stage 9)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sharded_commit_fn_2d(
    mesh: Mesh, row_len: int, rep: int, lk: int, kwords: int, cw: int
):
    """Commit over a ("r", "c") mesh: rows block-sharded over "r", each row's
    codeword interior block-sharded over "c".

    The RAA cumulative sums become distributed prefix sums (local
    ``cumsum_wrap`` + a psum-style offset of the preceding chunks' totals,
    gathered over ICI), and each row's Merkle tree is built as C local
    subtrees whose roots are all-gathered and merged replicated — the
    classic distributed-Merkle shape.  The seeded global permutations are
    applied by regathering the row (an all-gather standing in for the
    all-to-all; the permutation itself is reproduced bit-exactly).
    """
    from ..fields.integers import _carry_limbs_lastaxis

    ax_r, ax_c = mesh.axis_names
    c_size = mesh.shape[ax_c]
    chunk = cw // c_size

    def local_commit(rows, p1, p2):
        # rows: (R_local, row_len, Ln) two's-complement limbs, replicated on c
        c_idx = jax.lax.axis_index(ax_c)

        def dist_cumsum(local):
            cs = cumsum_wrap(local, axis=1)  # canonical local prefix
            totals = cs[:, -1, :]  # (R_local, lk)
            gath = jax.lax.all_gather(totals, ax_c)  # (C, R_local, lk)
            mask = (jnp.arange(c_size) < c_idx)[:, None, None]
            lazy_off = jnp.sum(jnp.where(mask, gath, 0), axis=0, dtype=jnp.uint32)
            off = _carry_limbs_lastaxis(lazy_off, lk)
            return _carry_limbs_lastaxis(cs + off[:, None, :], lk)

        def my_slice(full):
            return jax.lax.dynamic_slice_in_dim(full, c_idx * chunk, chunk, 1)

        def regather(local):
            g = jax.lax.all_gather(local, ax_c)  # (C, R_local, chunk, lk)
            return jnp.moveaxis(g, 0, 1).reshape(local.shape[0], cw, lk)

        vec = sign_extend(rows, lk)
        full = jnp.concatenate([vec] * rep, axis=1)  # (R_local, cw, lk)
        local = my_slice(jnp.take(full, p1, axis=1))
        local = dist_cumsum(local)
        local = my_slice(jnp.take(regather(local), p2, axis=1))
        enc_local = dist_cumsum(local)  # (R_local, chunk, lk)

        # Merkle: local subtree per chunk, then merge gathered subtree roots
        sub_layers = merkle_tree_device(enc_local, kwords)  # leaves → (R_local,1,8)
        gath_roots = jax.lax.all_gather(sub_layers[-1][:, 0, :], ax_c)  # (C, R_local, 8)
        level = jnp.moveaxis(gath_roots, 0, 1)  # (R_local, C, 8)
        top_layers = []
        while level.shape[1] > 1:
            from ..ops.blake3_kernel import merge_pairs_batch

            pairs = level.reshape(level.shape[0] * level.shape[1] // 2, 2, 8)
            level = merge_pairs_batch(pairs).reshape(level.shape[0], -1, 8)
            top_layers.append(level)
        return enc_local, tuple(sub_layers), tuple(top_layers)

    n_sub = chunk.bit_length()  # log2(chunk) + 1 levels, leaves included
    n_top = max(c_size.bit_length() - 1, 0)
    fn = jax.shard_map(
        local_commit,
        mesh=mesh,
        in_specs=(P(ax_r, None, None), P(None), P(None)),
        out_specs=(
            P(ax_r, ax_c, None),
            tuple(P(ax_r, ax_c, None) for _ in range(n_sub)),
            tuple(P(ax_r, None, None) for _ in range(n_top)),
        ),
        # the top levels are computed from an all_gather over "c", hence
        # replicated on "c" — that replication is real but not statically
        # inferable through the hash kernels
        check_vma=False,
    )
    return jax.jit(fn)


def commit_device_sharded_2d(
    pp: ZipParams, z_values, cfg: FieldConfig, mesh: Mesh
) -> tuple[DeviceZipData, ZipCommitment]:
    """2-D-mesh commit; byte-identical roots/layers to zip.device.commit_device."""
    row_len = pp.code.row_len
    rep = pp.code.repetition_factor
    lk = 4 * pp.zt.k_words
    cw = pp.code.codeword_len()
    p1, p2 = pp.code.permutations()
    num_rows = pp.num_rows

    ax_r, ax_c = mesh.axis_names
    c_size = mesh.shape[ax_c]
    r_size = mesh.shape[ax_r]
    if (
        num_rows % r_size != 0
        or cw % c_size != 0
        or (cw // c_size) & (cw // c_size - 1)
        or c_size & (c_size - 1)
    ):
        from ..zip.device import commit_device

        return commit_device(pp, z_values, cfg)

    if isinstance(z_values, np.ndarray) and z_values.dtype == np.int64:
        z_limbs = i64_to_limbs(z_values, 4 * pp.zt.n_words)
    else:
        z_limbs = ints_to_limbs(list(z_values), 4 * pp.zt.n_words)
    rows = z_limbs.reshape(num_rows, row_len, -1)
    rows = jax.device_put(rows, NamedSharding(mesh, P(ax_r, None, None)))

    fn = _sharded_commit_fn_2d(mesh, row_len, rep, lk, pp.zt.k_words, cw)
    enc, sub_layers, top_layers = fn(rows, jnp.asarray(p1), jnp.asarray(p2))

    enc_np = fetch_global(enc.astype(jnp.uint16))
    layers = [fetch_global(l) for l in sub_layers] + [fetch_global(l) for l in top_layers]
    roots = [layers[-1][r, 0].astype("<u4").tobytes() for r in range(num_rows)]
    return DeviceZipData(enc_np, layers, roots), ZipCommitment(roots)


# ---------------------------------------------------------------------------
# sharded open: proximity combine + evaluation combine over the row axis
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _sharded_prox_fn(mesh: Mesh, out_l16: int):
    """Row-sharded proximity matvec: local signed-magnitude MXU accumulation
    (linear in the row set), psum over the row axis, one replicated carry
    sweep (mirrors open_z.rs's row fold, distributed)."""
    from ..fields.integers import combine_acc_to_limbs, combine_rows_acc

    ax_r = mesh.axis_names[0]

    def local(c_mag, c_sign, e_mag, e_sign):
        acc = combine_rows_acc(c_mag, c_sign, e_mag, e_sign, out_l16)
        return combine_acc_to_limbs(jax.lax.psum(acc, ax_r))

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ax_r, None), P(ax_r), P(ax_r, None, None), P(ax_r, None)),
            out_specs=P(None, None),
        )
    )


@lru_cache(maxsize=32)
def _sharded_eval_fn(mesh: Mesh, ctx):
    """Row-sharded q₀ᵀ·Z: local Montgomery products + exact lazy row sums,
    psum over the row axis, replicated sweep + reduction mod q."""
    from ..fields.limbs import carry_sweep
    from ..fields.montgomery import lazy_sum, mod_reduce_wide, mont_mul

    ax_r = mesh.axis_names[0]

    def local(q0, e_f):
        prod = mont_mul(ctx, q0[:, None, :], e_f)  # (R_local, C, L)
        part = lazy_sum(ctx, prod, axis=0)  # (C, Lw) canonical
        total = jax.lax.psum(part, ax_r)  # lazy: lanes ≤ (2^16−1)·D < 2^32
        total = carry_sweep(total, part.shape[-1] + 1)
        return mod_reduce_wide(ctx, total)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ax_r, None), P(ax_r, None, None)),
            out_specs=P(None, None),
        )
    )


def open_device_sharded(
    pp: ZipParams,
    z_values,
    z_f,
    data: DeviceZipData,
    point: list,
    cfg: FieldConfig,
    transcript,
    mesh: Mesh,
) -> None:
    """Mesh-sharded open; proof bytes identical to zip.device.open_device
    (and hence to the host oracle).  The heavy phases — proximity matvec and
    the q₀ᵀ·Z field combine — run sharded over the row axis; the column
    records are assembled host-side from the committed layer data."""
    from ..fields.integers import i64_to_mag8, ints_to_mag8
    from ..fields.montgomery import device_field
    from ..poly.device import build_eq_table_device
    from ..zip.device import (
        _write_limb_ints,
        open_device,
        write_column_records,
        write_eval_row,
    )

    num_rows = pp.num_rows
    r_size = mesh.shape[mesh.axis_names[0]]
    if num_rows <= 1 or num_rows % r_size != 0:
        return open_device(pp, z_values, z_f, data, point, cfg, transcript)

    row_len = pp.code.row_len
    codeword_len = pp.code.codeword_len()
    ctx = device_field(cfg)
    ax_r = mesh.axis_names[0]

    # ---- proximity rows ----------------------------------------------------
    if isinstance(z_values, np.ndarray) and z_values.dtype == np.int64:
        e_mag8, e_sign = i64_to_mag8(z_values)
    else:
        e_mag8, e_sign = ints_to_mag8(list(z_values), 8 * pp.zt.n_words)
    e_mag8 = jax.device_put(
        e_mag8.reshape(num_rows, row_len, -1), NamedSharding(mesh, P(ax_r, None, None))
    )
    e_sign = jax.device_put(
        e_sign.reshape(num_rows, row_len), NamedSharding(mesh, P(ax_r, None))
    )
    prox_fn = _sharded_prox_fn(mesh, 4 * pp.zt.m_words)
    for _ in range(pp.code.num_proximity_testing()):
        coeffs = transcript.fs.get_integer_challenges(num_rows, pp.zt.n_words)
        c_mag8, c_sign = ints_to_mag8(coeffs, 8 * pp.zt.n_words)
        c_mag8 = jax.device_put(c_mag8, NamedSharding(mesh, P(ax_r, None)))
        c_sign = jax.device_put(c_sign, NamedSharding(mesh, P(ax_r)))
        combined = prox_fn(c_mag8, c_sign, e_mag8, e_sign)
        _write_limb_ints(transcript, np.asarray(combined))

    # ---- column openings ---------------------------------------------------
    depth = (codeword_len - 1).bit_length() if codeword_len > 1 else 0
    n_open = pp.code.num_column_opening()
    cols = np.array(
        [transcript.squeeze_challenge_idx(cfg, codeword_len) for _ in range(n_open)]
    )
    write_column_records(data, cols, depth, num_rows, transcript)

    # ---- evaluation phase --------------------------------------------------
    log_rows = num_rows.bit_length() - 1
    lo = point[len(point) - log_rows :]
    if lo:
        q0 = jax.device_put(
            np.asarray(build_eq_table_device(cfg, lo)),
            NamedSharding(mesh, P(ax_r, None)),
        )
        e_f = jax.device_put(
            np.asarray(z_f).reshape(num_rows, row_len, -1),
            NamedSharding(mesh, P(ax_r, None, None)),
        )
        combined_f = _sharded_eval_fn(mesh, ctx)(q0, e_f)
    else:
        combined_f = z_f
    write_eval_row(cfg, np.asarray(combined_f), transcript)
