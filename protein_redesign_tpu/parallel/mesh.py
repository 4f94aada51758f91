"""Mesh construction and sharding rules.

The reference's distribution story is Lightning DDP over NCCL
(`/root/reference/train.py:38`, implicit gradient all-reduce). The
TPU-native equivalent (SURVEY.md §2.3): a 2-D ``jax.sharding.Mesh``
('data', 'model') over ICI with

- batch sharded over 'data' (data parallelism; XLA inserts the gradient
  all-reduce that DDP did),
- large parameters sharded over 'model' (FSDP-style; XLA inserts
  all-gathers on use and reduce-scatters on gradients),
- everything else replicated.

Multi-host TPU slices: call ``jax.distributed.initialize()`` before
``make_mesh`` (done by the train CLI when JAX reports multiple processes).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[Any]] = None,
    mesh_shape: Optional[Tuple[int, int]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.

    Default shape: all devices on the data axis (pure DP — the reference's
    strategy), model axis 1. Pass ``mesh_shape=(d, m)`` to enable
    FSDP-style parameter sharding over m devices.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    d, m = mesh_shape
    if d * m != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(d, m)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_scalar(x: Any) -> Any:
    """Python scalar from a replicated global array — multi-host-safe.

    ``float(x)``/``int(x)`` on a ``jax.Array`` raises when the array
    spans non-addressable devices (every metric/step counter does on a
    multi-process mesh, even though each host holds the full value under
    the replicated shardings the train CLI uses); read this host's first
    addressable shard instead. Fully-addressable arrays and plain
    numbers pass straight through."""
    if getattr(x, "is_fully_addressable", True) is False:
        x = x.addressable_shards[0].data
    return np.asarray(x).item()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def _param_spec(path_leaf_shape: Tuple[int, ...], model_size: int) -> P:
    """FSDP rule: shard the largest divisible axis of >=2D params over
    'model'; replicate small/indivisible ones."""
    shape = path_leaf_shape
    if model_size <= 1 or len(shape) < 2:
        return P()
    # Prefer sharding the largest axis (usually the fan-out of big kernels).
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % model_size == 0 and shape[axis] >= 2 * model_size:
            spec: list = [None] * len(shape)
            spec[axis] = MODEL_AXIS
            return P(*spec)
    return P()


def param_sharding(mesh: Mesh, params: Any) -> Any:
    """A pytree of NamedShardings matching ``params``."""
    model_size = mesh.shape[MODEL_AXIS]

    def leaf_sharding(x: Any) -> NamedSharding:
        shape = getattr(x, "shape", ())
        return NamedSharding(mesh, _param_spec(tuple(shape), model_size))

    return jax.tree_util.tree_map(leaf_sharding, params)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with the leading axis split over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
