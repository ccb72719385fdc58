"""Multi-device scaling layer: mesh construction plus sharded prover kernels.

The reference's only parallelism is Rayon shared-memory fan-out
(/root/reference/src/sumcheck/prover.rs:126-176, src/zip/pcs/commit.rs:164-180);
this package is its TPU-native replacement: a 1-D ``jax.sharding.Mesh`` over
which

* the sumcheck hypercube axis is contiguously block-sharded — each round is a
  ``shard_map`` of the same fused fold-and-evaluate body used on one chip,
  closed by a ``psum`` of the lazy wide claim sums over ICI;
* the Zip codeword matrix is row-sharded — RAA encoding, BLAKE3 leaf hashing
  and Merkle level merges are row-independent, so they run with zero
  communication and only the per-row roots are gathered;
* the proximity / evaluation row combinations contract over the row axis and
  close with a ``psum``.

Everything here produces bit-identical transcripts and proofs to the
single-device backend — sharding is purely a layout choice.
"""

from .mesh import hierarchical_mesh, init_distributed, local_mesh, local_mesh_2d
from .sumcheck import ShardedSumcheckExecutor
from .zip import commit_device_sharded, commit_device_sharded_2d

__all__ = [
    "hierarchical_mesh",
    "init_distributed",
    "local_mesh",
    "local_mesh_2d",
    "ShardedSumcheckExecutor",
    "commit_device_sharded",
    "commit_device_sharded_2d",
]
