"""Mesh helpers for the sharded prover.

One 1-D mesh axis (default name ``"hc"``, for hypercube) serves both prover
phases: Spartan sumchecks shard the 2^s eval-table axis over it, and the Zip
PCS shards the num_rows axis of the codeword matrix over it.  On real
hardware the axis should be laid out over ICI (within a slice); the same
program runs unchanged on the CPU backend with
``--xla_force_host_platform_device_count`` for testing.

Multi-host (DCN) execution: :func:`init_distributed` brings up
``jax.distributed`` from explicit coordinates or cluster env vars, and
:func:`hierarchical_mesh` builds a ("host", "chip") mesh whose first axis
crosses process (= DCN) boundaries while the second stays on each host's
ICI-connected chips.  The sharded prover code is axis-name-agnostic (it
reads ``mesh.axis_names``), so a hierarchical mesh drops into the same
paths as the single-host 2-D ("r", "c") mesh: codeword rows / hypercube
high bits shard over "host" (the commit is embarrassingly parallel; the
only DCN collectives are the tiny per-round claim psums and the final
open-phase row psum), and row interiors / hypercube low bits shard over
"chip" where the all_gathers of the distributed prefix sums ride ICI.
Replaces the reference's single-host Rayon ceiling
(/root/reference/src/zip/pcs/commit.rs:164-180).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "hc"


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize ``jax.distributed`` for multi-host (DCN) meshes.

    Explicit arguments win; otherwise standard cluster env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or any TPU-pod metadata jax auto-detects) are used.  Returns True when
    a multi-process runtime is (already or newly) active, False for
    single-process runs — callers fall back to local meshes.  Safe to call
    twice (the second call is a no-op).

    MUST run before any JAX call that initializes the XLA backends (even
    ``jax.process_count()`` does) — so coordinates are inspected FIRST and
    ``jax.distributed.initialize`` is attempted straight away; backend-
    touching calls happen only after it."""
    coord = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if coord is None and nproc is None:
        return jax.process_count() > 1
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc is not None else None,
            process_id=(
                process_id
                if process_id is not None
                else int(os.environ.get("JAX_PROCESS_ID", "0"))
            ),
        )
    except RuntimeError as e:
        msg = str(e).lower()
        if "already" in msg:
            pass  # double-initialize: benign no-op
        elif "before any jax calls" in msg:
            # the backends were already brought up in this process — DCN
            # can no longer attach; surface an actionable error instead of
            # jax's generic one
            raise RuntimeError(
                "init_distributed() must be called before any other JAX "
                "use in this process (imports are fine; device/backend "
                "queries are not) — move it to the top of the worker's "
                "main()"
            ) from e
        else:
            # a dead coordinator / port conflict must NOT silently degrade
            # every worker to a lonely single-process prove
            raise
    return jax.process_count() > 1


def hierarchical_mesh(
    hosts: int | None = None,
    chips_per_host: int | None = None,
    axes: tuple[str, str] = ("host", "chip"),
) -> Mesh:
    """A ("host", "chip") mesh whose first axis crosses DCN boundaries.

    In a multi-process runtime this uses
    ``mesh_utils.create_hybrid_device_mesh`` so the "chip" axis is ICI-
    contiguous within each process and only "host" spans DCN.  In a
    single-process run (tests, the driver's virtual CPU mesh) the local
    devices are reshaped to (hosts, chips_per_host) — same program, same
    collectives, DCN axis simulated."""
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        hosts = hosts or jax.process_count()
        chips_per_host = chips_per_host or jax.local_device_count()
        try:
            devs = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, chips_per_host),
                dcn_mesh_shape=(hosts, 1),
                devices=jax.devices(),
            )
            return Mesh(devs.reshape(hosts, chips_per_host), axes)
        except ValueError:
            # devices without slice attributes (CPU multi-process runs,
            # single-slice pods): group by process — "host" still crosses
            # the DCN/process boundary, "chip" stays process-local
            devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
            if len(devs) != hosts * chips_per_host:
                raise ValueError(
                    f"need {hosts * chips_per_host} devices, have {len(devs)}"
                ) from None
            return Mesh(np.array(devs).reshape(hosts, chips_per_host), axes)
    devs = jax.devices()
    if hosts is None or chips_per_host is None:
        raise ValueError("single-process hierarchical_mesh needs explicit shape")
    if len(devs) < hosts * chips_per_host:
        raise ValueError(f"need {hosts * chips_per_host} devices, have {len(devs)}")
    return Mesh(
        np.array(devs[: hosts * chips_per_host]).reshape(hosts, chips_per_host), axes
    )


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


def fetch_global(arr) -> np.ndarray:
    """Host copy of a (possibly mesh-sharded) global array.

    ``np.asarray`` raises on a multi-process (DCN) mesh where remote
    shards are not process-addressable; there the value is closed with a
    ``process_allgather`` instead."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def shard_on_axis(mesh: Mesh, arr, dim: int):
    """Place ``arr`` with dimension ``dim`` block-sharded over the mesh axis."""
    spec = [None] * arr.ndim
    spec[dim] = mesh.axis_names[0]
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
