"""Device mesh construction and batch sharding helpers.

Replaces the reference's torch.nn.DataParallel (run.py:390 — single-process
replicate/gather) with a jax.sharding Mesh over ICI: batch rows spread over
the `data` axis, the dense voxel grid optionally over the `space` axis
(SURVEY §2.5's sequence-parallel analog). XLA's SPMD partitioner inserts the
all-reduces (gradients) and all-gathers (keypoints/theta are tiny and
replicated) automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    data: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'space') mesh.

    Args:
        num_devices: total devices to use (default: all available).
        data: data-parallel axis size (default: num_devices // space).
        space: spatial-sharding axis size for the dense-grid/warp stage.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    devices = devices[:n]
    if data is None:
        assert n % space == 0, f"{n} devices not divisible by space={space}"
        data = n // space
    assert data * space == n, f"data*space must equal device count ({n})"
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: axis 0 over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
