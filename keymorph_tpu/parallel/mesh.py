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
    dcn: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'space') mesh — or, with ``dcn > 1``, a two-level
    ('dcn', 'data', 'space') mesh for multi-slice deployments.

    Args:
        num_devices: total devices to use (default: all available).
        data: data-parallel axis size (default: num_devices // (space*dcn)).
        space: spatial-sharding axis size for the dense-grid/warp stage.
        dcn: number of ICI slices connected over DCN (SURVEY §2.5's
            "DCN for multi-slice"). The slice index is the SLOWEST-varying
            mesh dim, so consecutive devices (one ICI slice) fill each
            ('data', 'space') block and only the outer gradient/subject DP
            reduction crosses DCN. Shard batch/subject axes over
            ('dcn', 'data') jointly (see batch_sharding) — XLA then lowers
            the gradient all-reduce hierarchically (intra-slice ICI
            reduce-scatter + inter-slice DCN all-reduce).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    devices = devices[:n]
    inner = space * dcn
    if data is None:
        assert n % inner == 0, f"{n} devices not divisible by space*dcn={inner}"
        data = n // inner
    assert data * space * dcn == n, (
        f"dcn*data*space must equal device count ({n})"
    )
    if dcn > 1:
        arr = np.asarray(devices).reshape(dcn, data, space)
        return Mesh(arr, ("dcn", "data", "space"))
    arr = np.asarray(devices).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: axis 0 over the data-parallel axes ('dcn','data') on a
    two-level mesh, 'data' otherwise; everything else replicated."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", "data")))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
