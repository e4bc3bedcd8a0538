"""Device mesh and sharding utilities.

The reference's only parallelism is single-process ``nn.DataParallel``
(replicate + scatter/gather, train_flow.py:96). The TPU-native equivalent
is SPMD over a ``jax.sharding.Mesh``: parameters replicated, batch sharded
over the ``data`` axis, gradient all-reduce inserted by XLA over ICI.

A second optional ``space`` axis shards the correlation volume's query axis
(the O((HW/64)^2) memory hog, SURVEY.md §5) for resolutions that exceed
single-chip HBM — the spatial analog of model parallelism for this
all-CNN model.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1D ``('data',)`` by default; pass ``axis_names=('data', 'space')`` and a
    ``shape`` for 2D meshes.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("explicit shape required for >1 mesh axes")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_mesh_2d(data: int, space: int) -> Mesh:
    """2D mesh: 'data' (batch parallelism) x 'space' (spatial parallelism).

    With NHWC inputs sharded P('data', 'space'), XLA SPMD partitions the
    whole PriOr-RAFT step — convolution halo exchanges, the correlation
    einsums, and the scan — across the image-height axis as well as batch;
    verified numerically identical to the single-device step
    (tests/test_train_parallel.py). This is the honest TPU analog of model
    parallelism for this all-CNN model (SURVEY.md §2.3): it divides the
    O((HW/64)^2) correlation volume's query axis across chips.
    """
    devices = np.asarray(jax.devices()[: data * space]).reshape(data, space)
    return Mesh(devices, ("data", "space"))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the data axis; rest replicated."""
    return NamedSharding(mesh, P(axis))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, H, ...) arrays as P('data', 'space'): batch over the data
    axis AND image height over the space axis."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a host batch with batch-dim sharding."""
    s = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
