"""Plain convolutional keypoint-heatmap backbone.

Parity: reference ConvNet (net.py:7-36) — 9 ConvBlocks over the channel
ladder [32, 64, 64, 128, 128, 256, 256, 512] with a downsample every second
block (4 pools -> 16x spatial reduction), then an out-head block.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from keymorph_tpu.models.layers import ConvBlock

H_DIMS = (32, 64, 64, 128, 128, 256, 256, 512)


class ConvNet(nn.Module):
    """Input (B, *spatial, C_in) -> heatmaps (B, *spatial/16, out_dim)."""

    out_dim: int
    dim: int = 3
    norm_type: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        down = (False, True, False, True, False, True, False, True)
        for ch, ds in zip(H_DIMS, down):
            x = ConvBlock(
                ch, 1, self.norm_type, ds, self.dim, dtype=self.dtype
            )(x)
        x = ConvBlock(
            self.out_dim, 1, self.norm_type, False, self.dim, dtype=self.dtype
        )(x)
        return x
