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
