"""Keypoint heads and conv building blocks (Flax).

Feature maps flow channel-LAST internally ((B, *spatial, C)) — the layout XLA
tiles best onto the TPU MXU — while the public model API stays channel-first
for parity with the reference (layers.py, net.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_PREC = jax.lax.Precision.HIGHEST


def center_of_mass(vol, indexing="ij"):
    """Differentiable per-channel center of mass in normalized [-1, 1] coords.

    The d marginal masses are computed in one pass over the volume (a single
    reduction per axis); XLA fuses the ReLU and the weighted sums, so the
    volume is read once — the fused-reduction design SURVEY §7 step 4 calls
    for (vs the reference's repeated full-volume sums, layers.py:92-134).

    Args:
        vol: (B, *spatial, C) channel-last heatmaps (any float dtype).
        indexing: 'ij' (matrix order, default for the pipeline) or 'xy'.

    Returns:
        (B, C, d) coordinates in [-1, 1]. Coordinate k along axis of size N is
        computed against linspace(0, 1, N) then mapped to [-1, 1] — the
        reference's convention (layers.py:100-134), which is align_corners=True
        style; replicated deliberately.
    """
    spatial = vol.shape[1:-1]
    d = len(spatial)
    # ReLU in the input dtype (exact in any float dtype); the reduces below
    # accumulate in f32 with the convert fused into the reduction. Summing
    # bf16 addends into an f32 accumulator is value-identical to upcasting
    # first, but upcasting materialized the full f32 heatmap volume (under
    # AMP at 256^3/256 kp: ~5 GB of scheduler copies — a round-5 OOM item).
    v = jax.nn.relu(vol)
    eps = 1e-8

    coords = []
    # marginal mass along each axis: reduce all spatial axes but one
    for k in range(d):
        axes = tuple(i + 1 for i in range(d) if i != k)
        m = jnp.sum(v, axis=axes, dtype=jnp.float32)  # (B, Nk, C)
        total = jnp.sum(m, axis=1) + eps  # (B, C)
        line = jnp.linspace(0.0, 1.0, spatial[k], dtype=jnp.float32)
        c = jnp.einsum("bnc,n->bc", m, line, precision=_PREC) / total
        coords.append(c)
    # 'ij': first volume axis first; 'xy': reversed (reference layers.py:131-134)
    if indexing == "xy":
        coords = coords[::-1]
    return jnp.stack(coords, axis=-1) * 2.0 - 1.0


class CenterOfMass(nn.Module):
    """Module wrapper over :func:`center_of_mass` (no parameters).

    Parity: reference CenterOfMass2d/3d (layers.py:30-134), dim-generic.
    """

    indexing: str = "ij"

    @nn.compact
    def __call__(self, vol):
        assert self.indexing in ("ij", "xy")
        return center_of_mass(vol, self.indexing)


class LinearRegressor(nn.Module):
    """Global-average-pool + dense + sigmoid keypoint regressor.

    Parity: reference LinearRegressor2d/3d (layers.py:6-27) — with the
    undefined-``num_keypoints`` bug fixed (SURVEY known defects).
    """

    num_keypoints: int
    dim: int = 3

    @nn.compact
    def __call__(self, x):
        # x: (B, *spatial, C) — global average pool over spatial axes
        pooled = jnp.mean(x.astype(jnp.float32), axis=tuple(range(1, x.ndim - 1)))
        out = nn.Dense(self.num_keypoints * self.dim)(pooled)
        out = jax.nn.sigmoid(out) * 2.0 - 1.0
        return out.reshape(-1, self.num_keypoints, self.dim)


class StatelessBatchNorm(nn.Module):
    """Batch normalization over current-batch statistics (no running stats).

    Parity: reference ``norm_type="batch"`` (layers.py:156-187) and the 'b'
    layer-order char (unet3d/buildingblocks.py:75-87) use torch BatchNorm in
    train mode, i.e. normalize by the statistics of the batch in hand. This
    module reproduces exactly that, with learnable scale/bias, as a pure
    function: there is no ``batch_stats`` mutable collection to thread through
    jit/pjit/Orbax, so it works under plain ``Module.apply``. The deliberate
    deviation from torch is eval time — torch would switch to running
    averages, this module keeps batch statistics (torch's
    ``track_running_stats=False`` mode). Registration nets here run with
    batch statistics in the reference's own training path, so numerics match
    where it matters.
    """

    epsilon: float = 1e-5  # torch BatchNorm default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # batch + spatial axes, per channel; fp32 stats for stability
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (xf - mean) * inv + bias
        return y.astype(self.dtype)


def _norm_layer(norm_type: Optional[str], channels: int, dtype):
    if norm_type in (None, "none"):
        return None
    if norm_type == "instance":
        # InstanceNorm = GroupNorm with one channel per group (torch eps)
        return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5, dtype=dtype)
    if norm_type == "batch":
        return StatelessBatchNorm(dtype=dtype)
    if norm_type == "group":
        groups = 8 if channels % 8 == 0 and channels >= 8 else 1
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype)
    raise NotImplementedError(f"norm_type={norm_type}")


class ConvBlock(nn.Module):
    """Conv(3^d) + {none,instance,batch,group}-norm + ReLU + optional MaxPool(2).

    Parity: reference ConvBlock (layers.py:137-187).
    """

    out_channels: int
    stride: int = 1
    norm_type: str = "instance"
    down_sample: bool = True
    dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels,
            kernel_size=(3,) * self.dim,
            strides=(self.stride,) * self.dim,
            padding=1,
            dtype=self.dtype,
        )(x)
        norm = _norm_layer(self.norm_type, self.out_channels, self.dtype)
        if norm is not None:
            x = norm(x)
        x = jax.nn.relu(x)
        if self.down_sample:
            x = nn.max_pool(
                x, window_shape=(2,) * self.dim, strides=(2,) * self.dim
            )
        return x
