"""Mesh helpers for the sharded prover.

One 1-D mesh axis (default name ``"hc"``, for hypercube) serves both prover
phases: Spartan sumchecks shard the 2^s eval-table axis over it, and the Zip
PCS shards the num_rows axis of the codeword matrix over it.  On real
hardware the axis should be laid out over ICI (within a slice); the same
program runs unchanged on the CPU backend with
``--xla_force_host_platform_device_count`` for testing.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "hc"


def local_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` local devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def local_mesh_2d(rows: int, cols: int, axes: tuple[str, str] = ("r", "c")) -> Mesh:
    """A 2-D (rows × cols) mesh: "r" shards the codeword-matrix row axis /
    hypercube blocks, "c" shards each row's interior (SURVEY §7 stage 9).
    On real hardware both axes map onto the ICI torus."""
    devs = jax.devices()
    if len(devs) < rows * cols:
        raise ValueError(f"need {rows * cols} devices, have {len(devs)}")
    return Mesh(np.array(devs[: rows * cols]).reshape(rows, cols), axes)


def shard_on_axis(mesh: Mesh, arr, dim: int):
    """Place ``arr`` with dimension ``dim`` block-sharded over the mesh axis."""
    spec = [None] * arr.ndim
    spec[dim] = mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
