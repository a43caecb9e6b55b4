"""U-Net backbones (Flax) with the reference's architecture semantics.

Parity anchors: reference keymorph/unet3d/{model,buildingblocks}.py —
  * f_maps geometric ladder: [f * 2^k] (unet3d/utils.py:109-110)
  * layer order "gcr": GroupNorm -> Conv(no bias) -> ReLU
    (buildingblocks.py:10-95)
  * DoubleConv channel plan: encoder conv1 out = max(out//2, in)
    (buildingblocks.py:170-181)
  * encoders: MaxPool(2) before every block except the first
    (buildingblocks.py:478-520)
  * decoders: nearest-neighbor upsample to the skip's size + concat
    (buildingblocks.py:523-582)
  * TruncatedUNet3D: drop the last `num_truncated_layers` decoders; the
    final 1x1 conv reads f_maps[num_truncated_layers] (model.py:307-430) —
    output at reduced resolution (fine: the CoM head is resolution-agnostic)
  * SimpleUnet brain extractor (model.py:533-616)

Feature maps are channel-last ((B, *spatial, C)); gradient checkpointing is a
`jax.checkpoint` policy applied per block when `use_checkpoint` is set
(the reference's torch.utils.checkpoint flag, unet3d/model.py:115-151).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from keymorph_tpu.models.layers import StatelessBatchNorm


def number_of_features_per_level(init_channels: int, num_levels: int):
    """f_maps ladder (reference unet3d/utils.py:109-110)."""
    return [init_channels * 2**k for k in range(num_levels)]


class SingleConv(nn.Module):
    """One 'gcr'-style layer: norm -> conv -> activation, order-configurable.

    Supported order chars (reference buildingblocks.py:10-95): 'g' groupnorm,
    'b' batchnorm, 'c' conv, 'r' ReLU, 'l' LeakyReLU, 'e' ELU. Conv has a
    bias only when no norm is present, matching the reference.
    """

    out_channels: int
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int = 1
    dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert "c" in self.order, "Conv layer MUST be present"
        use_bias = not ("g" in self.order or "b" in self.order)
        for ch in self.order:
            if ch == "c":
                x = nn.Conv(
                    self.out_channels,
                    kernel_size=(self.kernel_size,) * self.dim,
                    padding=self.padding,
                    use_bias=use_bias,
                    dtype=self.dtype,
                )(x)
            elif ch == "g":
                c = x.shape[-1]
                # reference rule (buildingblocks.py:66-72): one group when
                # channels < num_groups, else num_groups; largest-divisor
                # fallback only for channel counts the reference would reject
                if c < self.num_groups:
                    groups = 1
                elif c % self.num_groups == 0:
                    groups = self.num_groups
                else:
                    groups = next(
                        g for g in range(self.num_groups, 0, -1) if c % g == 0
                    )
                # torch GroupNorm epsilon (flax defaults to 1e-6)
                x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=self.dtype)(x)
            elif ch == "b":
                # stateless batch norm: current-batch statistics, no mutable
                # collections (see models/layers.py:StatelessBatchNorm)
                x = StatelessBatchNorm(dtype=self.dtype)(x)
            elif ch == "r":
                x = jax.nn.relu(x)
            elif ch == "l":
                x = jax.nn.leaky_relu(x, negative_slope=0.1)
            elif ch == "e":
                x = jax.nn.elu(x)
            else:
                raise ValueError(f"Unsupported layer char '{ch}'")
        return x


class DoubleConv(nn.Module):
    """Two stacked SingleConvs with the reference's channel plan."""

    out_channels: int
    encoder: bool
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int = 1
    dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        if self.encoder:
            mid = max(self.out_channels // 2, in_channels)
        else:
            mid = self.out_channels
        kw = dict(
            kernel_size=self.kernel_size,
            order=self.order,
            num_groups=self.num_groups,
            padding=self.padding,
            dim=self.dim,
            dtype=self.dtype,
        )
        x = SingleConv(mid, **kw)(x)
        x = SingleConv(self.out_channels, **kw)(x)
        return x


class ChannelSE(nn.Module):
    """Squeeze-and-Excitation channel gate (reference unet3d/se.py:18-65,
    channel-last): global-average squeeze -> 2-layer MLP -> sigmoid scale."""

    reduction_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        s = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # (B, C)
        s = jax.nn.relu(nn.Dense(max(C // self.reduction_ratio, 1), dtype=self.dtype)(s))
        s = jax.nn.sigmoid(nn.Dense(C, dtype=self.dtype)(s))
        return x * s.reshape(s.shape[0], *([1] * (x.ndim - 2)), C)


class SpatialSE(nn.Module):
    """Spatial SE gate (reference se.py:68-104): 1x1 conv to one channel,
    sigmoid, scale every channel by the spatial map."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.ndim - 2
        s = jax.nn.sigmoid(
            nn.Conv(1, kernel_size=(1,) * dim, dtype=self.dtype)(x)
        )
        return x * s


class ChannelSpatialSE(nn.Module):
    """Concurrent scSE (reference se.py:107-130): elementwise max of the
    channel- and spatial-SE outputs."""

    reduction_ratio: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return jnp.maximum(
            ChannelSE(self.reduction_ratio, dtype=self.dtype)(x),
            SpatialSE(dtype=self.dtype)(x),
        )


class ResNetBlock(nn.Module):
    """Residual block (reference buildingblocks.py:211-281): optional 1x1
    channel-lift -> SingleConv(order) -> SingleConv(order minus the
    non-linearity) -> +residual -> non-linearity; optional SE gate
    (ResNetBlockSE, buildingblocks.py:284-318, reduction_ratio=1)."""

    out_channels: int
    encoder: bool = True  # unused; keeps the DoubleConv block interface
    kernel_size: int = 3
    order: str = "gcr"
    num_groups: int = 8
    padding: int = 1
    dim: int = 3
    dtype: jnp.dtype = jnp.float32
    se_module: str = ""  # "", "scse", "cse", "sse"

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, kernel_size=(1,) * self.dim, dtype=self.dtype
            )(x)
        else:
            residual = x
        kw = dict(
            kernel_size=self.kernel_size,
            num_groups=self.num_groups,
            padding=self.padding,
            dim=self.dim,
            dtype=self.dtype,
        )
        out = SingleConv(self.out_channels, order=self.order, **kw)(residual)
        n_order = self.order
        for c in "rel":
            n_order = n_order.replace(c, "")
        out = SingleConv(self.out_channels, order=n_order, **kw)(out)
        out = out + residual
        if "l" in self.order:
            out = jax.nn.leaky_relu(out, negative_slope=0.1)
        elif "e" in self.order:
            out = jax.nn.elu(out)
        else:
            out = jax.nn.relu(out)
        if self.se_module:
            se = {
                "scse": lambda: ChannelSpatialSE(1, dtype=self.dtype),
                "cse": lambda: ChannelSE(1, dtype=self.dtype),
                "sse": lambda: SpatialSE(dtype=self.dtype),
            }[self.se_module]()
            out = se(out)
        return out


class PointwiseConv(nn.Module):
    """1x1(x1) conv computed as a channel matmul.

    Param-tree compatible with ``nn.Conv`` (same 'kernel'/'bias' shapes, and
    instantiated with name="Conv_0" where it replaces one), so checkpoints
    and the torch importer are unchanged. XLA's conv lowering of the 1x1
    measured 2.2 TFLOPS on the v5e (tools/conv_microbench.py 'head'); the
    einsum lowers as a clean MXU matmul.
    """

    features: int
    dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            ((1,) * self.dim) + (cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.reshape(cin, self.features).astype(self.dtype)
        out = jnp.einsum(
            "...c,ck->...k", x.astype(self.dtype), w,
            preferred_element_type=jnp.float32,
        )
        return (out + bias.astype(jnp.float32)).astype(self.dtype)


def _maxpool(x, dim):
    return nn.max_pool(x, window_shape=(2,) * dim, strides=(2,) * dim)


def _nearest_upsample_to(x, target_spatial):
    """Nearest-neighbor resize of channel-last x to target spatial size
    (the reference's F.interpolate(mode='nearest'), buildingblocks.py:568-582).

    Integer upscale factors (the U-Net's 2x decoders) lower as
    broadcast+reshape via jnp.repeat — identical indices to torch nearest
    (floor(arange(k*s)*s/(k*s)) repeats each element k times) without the
    gather a jnp.take would emit (TPU gathers run ~116M elem/s; see PERF.md).
    """
    B, *spatial, C = x.shape
    out = x
    for axis, (s, t) in enumerate(zip(spatial, target_spatial), start=1):
        if s == t:
            continue
        if t % s == 0:
            out = jnp.repeat(out, t // s, axis=axis)
            continue
        # torch nearest: src_idx = floor(dst_idx * s / t)
        idx = jnp.floor(jnp.arange(t) * (s / t)).astype(jnp.int32)
        out = jnp.take(out, idx, axis=axis)
    return out


class AbstractUNet(nn.Module):
    """Configurable encoder/decoder U-Net (reference unet3d/model.py:14-151).

    basic_module selects the block family (reference's basic_module arg):
      * "double" — DoubleConv blocks, nearest-upsample + CONCAT decoders
      * "resnet" / "resnetse" — ResNetBlock(SE) blocks, transposed-conv
        upsample + SUM decoders (buildingblocks.py:429-446)
    """

    out_channels: int
    f_maps: int = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    num_truncated_layers: int = 0
    is_segmentation: bool = False
    final_sigmoid: bool = False
    conv_kernel_size: int = 3
    conv_padding: int = 1
    basic_module: str = "double"
    dim: int = 3
    dtype: jnp.dtype = jnp.float32
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(self.f_maps, int):
            f_maps = number_of_features_per_level(self.f_maps, self.num_levels)
        else:
            f_maps = list(self.f_maps)
        assert len(f_maps) > 1, "Required at least 2 levels in the U-Net"

        kw = dict(
            kernel_size=self.conv_kernel_size,
            order=self.layer_order,
            num_groups=self.num_groups,
            padding=self.conv_padding,
            dim=self.dim,
            dtype=self.dtype,
        )
        residual = self.basic_module in ("resnet", "resnetse")
        if residual:
            base_cls = ResNetBlock
            if self.basic_module == "resnetse":
                kw = dict(kw, se_module="scse")
        else:
            base_cls = DoubleConv
        block_cls = nn.remat(base_cls) if self.use_checkpoint else base_cls

        def block(out_ch, encoder):
            return block_cls(out_ch, encoder=encoder, **kw)

        # encoder path
        skips = []
        for i, ch in enumerate(f_maps):
            if i > 0:
                x = _maxpool(x, self.dim)
            x = block(ch, encoder=True)(x)
            skips.append(x)

        # decoder path: deepest skip is the input; truncation drops the last
        # (highest-resolution) decoders (reference model.py:383-391)
        reversed_f = list(reversed(f_maps))
        num_decoders = len(reversed_f) - 1 - self.num_truncated_layers
        skips = skips[:-1][::-1]  # encoder features to join, deepest first
        for i in range(num_decoders):
            enc = skips[i]
            if residual:
                # transposed-conv upsample + SUM joining. padding (1, 2) at
                # stride 2 / kernel 3 reproduces torch ConvTranspose3d
                # (padding=1) with output_size = the skip's size; odd skip
                # sizes crop the trailing voxel the output_padding would drop.
                x = nn.ConvTranspose(
                    reversed_f[i + 1],
                    kernel_size=(self.conv_kernel_size,) * self.dim,
                    strides=(2,) * self.dim,
                    padding=((1, 2),) * self.dim,
                    transpose_kernel=True,  # torch ConvTranspose semantics
                    dtype=self.dtype,
                )(x)
                x = x[
                    (slice(None),)
                    + tuple(slice(0, s) for s in enc.shape[1:-1])
                ]
                x = enc + x
            else:
                x = _nearest_upsample_to(x, enc.shape[1:-1])
                x = jnp.concatenate([enc, x], axis=-1)
            x = block(reversed_f[i + 1], encoder=False)(x)

        x = PointwiseConv(
            self.out_channels, dim=self.dim, dtype=self.dtype, name="Conv_0"
        )(x)

        if self.is_segmentation and not train:
            x = jax.nn.sigmoid(x) if self.final_sigmoid else jax.nn.softmax(x, axis=-1)
        return x


class UNet3D(AbstractUNet):
    """3D U-Net (reference unet3d/model.py:154-189)."""

    dim: int = 3


class UNet2D(AbstractUNet):
    """2D U-Net (reference unet3d/model.py:266-297)."""

    dim: int = 2


class TruncatedUNet3D(AbstractUNet):
    """U-Net minus the last `num_truncated_layers` decoders
    (reference unet3d/model.py:307-430). Set num_truncated_layers > 0."""

    dim: int = 3


class ResidualUNet3D(AbstractUNet):
    """Residual 3D U-Net (reference unet3d/model.py:192-225): ResNetBlocks,
    summation joining, transposed-conv upsampling."""

    basic_module: str = "resnet"
    num_levels: int = 5
    dim: int = 3


class ResidualUNetSE3D(AbstractUNet):
    """Residual 3D U-Net with scSE gates (reference unet3d/model.py:228-263,
    se.py:18-113; ResNetBlockSE uses reduction_ratio=1)."""

    basic_module: str = "resnetse"
    num_levels: int = 5
    dim: int = 3


class SimpleUnet(nn.Module):
    """Small skip-connection U-Net used by the brain extractor
    (reference keymorph/model.py:533-616). Trilinear upsampling, instance
    norm, 3^3 convs.
    """

    out_channels: int = 1
    enc_nf: Sequence[int] = (4, 8, 16, 32)
    dec_nf: Sequence[int] = (32, 16, 8, 4)
    use_in: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def simple_block(h, ch):
            h = nn.Conv(ch, kernel_size=(3, 3, 3), padding=1, dtype=self.dtype)(h)
            if self.use_in:
                h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(h)
            return jax.nn.relu(h)

        def up2(h):
            # trilinear (align_corners=False) x2 upsample
            B, *spatial, C = h.shape
            new = tuple(2 * s for s in spatial)
            return jax.image.resize(h, (B, *new, C), method="trilinear")

        x0 = simple_block(x, self.enc_nf[0])
        x1 = simple_block(_maxpool(x0, 3), self.enc_nf[1])
        x2 = simple_block(_maxpool(x1, 3), self.enc_nf[2])
        x3 = simple_block(_maxpool(x2, 3), self.enc_nf[3])

        h = simple_block(_maxpool(x3, 3), self.dec_nf[0])
        h = up2(h)
        h = simple_block(jnp.concatenate([h, x3], -1), self.dec_nf[1])
        h = up2(h)
        h = simple_block(jnp.concatenate([h, x2], -1), self.dec_nf[2])
        h = up2(h)
        h = simple_block(jnp.concatenate([h, x1], -1), self.dec_nf[3])
        h = up2(h)
        h = simple_block(jnp.concatenate([h, x0], -1), self.out_channels)
        return nn.Conv(self.out_channels, kernel_size=(3, 3, 3), padding=1, dtype=self.dtype)(h)
