"""Mesh + sharding policy for data-parallel training.

The reference's parallelism is single-axis data parallelism over NCCL
(torch DDP, /root/reference/model/graph_model.py:470-523,2019-2023). The
TPU-native equivalent is a 1-D ('data',) jax.sharding.Mesh: batches are
sharded on axis 0, parameters/optimizer state replicated, and XLA inserts
the gradient all-reduce over ICI automatically when the jitted train step
consumes sharded batches with replicated-out params — no explicit psum and
no DistributedSampler, and BatchNorm's batch reduction becomes a global
(synced) reduction for free.

Multi-host extension: `jax.distributed.initialize()` before mesh creation
turns the same code into a multi-slice DCN+ICI program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None,
                       devices: Optional[Sequence] = None,
                       axis_name: str = "data") -> Mesh:
    """1-D mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (the batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """device_put every float array in a host batch with batch-axis
    sharding. Non-array fields (guids, labels) pass through."""
    sh = batch_sharding(mesh, axis_name)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.dtype.kind in "fiu":
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return type(batch)(out) if not isinstance(batch, dict) else out
