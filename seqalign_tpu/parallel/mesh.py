"""Device-mesh helpers for multi-chip / multi-host execution.

The reference is single-GPU (its SLURM scripts request 1 node / 1 GPU);
its scaling mechanisms are CUDA streams + a device-global spin-lock
protocol (reference: alignSequenceGPU.cu:14-40, 470-484).  The TPU-native
scaling story is a ``jax.sharding.Mesh``: the pair batch is data-parallel
sharded over the ``data`` axis (score matrices replicated) and XLA
inserts the collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_data_mesh(num_devices: Optional[int] = None,
                   devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (default: the default backend's; pass ``devices`` to override, e.g.
    the virtual CPU devices when the default backend is a real chip)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    # Auto axis typing: engine outputs (e.g. the sequence-parallel
    # boundary checkpoints) feed plain single-chip jits afterwards, and
    # Explicit-typed avals would demand a mesh context there.
    return jax.make_mesh(
        (len(devices),), (DATA_AXIS,), devices=devices,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def maybe_initialize_distributed() -> None:
    """Initialize the jax.distributed runtime when launched multi-process
    (no-op single-host).  On TPU pods jax auto-detects the topology;
    for manual launches (scripts/distributed_worker.py, SLURM-less
    clusters) set JAX_COORDINATOR_ADDRESS plus JAX_NUM_PROCESSES /
    JAX_PROCESS_ID."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
