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

    enc_np = np.asarray(enc.astype(jnp.uint16))
    layers = [np.asarray(l) for l in layers_dev]
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

    enc_np = np.asarray(enc.astype(jnp.uint16))
    layers = [np.asarray(l) for l in sub_layers] + [np.asarray(l) for l in top_layers]
    roots = [layers[-1][r, 0].astype("<u4").tobytes() for r in range(num_rows)]
    return DeviceZipData(enc_np, layers, roots), ZipCommitment(roots)
