"""Import reference (PyTorch) KeyMorph checkpoints into keymorph_tpu.

The reference releases trained backbones as torch ``state_dict``s (UNet3D /
TruncatedUNet3D / ConvNet; README.md:309-312, checkpoints saved at
run.py:640-654 with a ``backbone.`` prefix stripped on load,
script_utils.py:59-81). This module maps those tensors onto our Flax
parameter trees so users can switch frameworks without retraining.

Verified in tests by round-tripping randomly initialized reference models:
our forward matches the torch forward on identical inputs.

Usage:
    params = load_torch_backbone("weights.pt", net, params)  # KeyMorphNet
    # or, for a raw backbone:
    new_backbone_params = import_backbone_state_dict(sd, backbone_params)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _strip_prefixes(state_dict: Dict[str, "np.ndarray"]):
    """Drop DataParallel / pipeline prefixes (backbone., module.)."""
    out = {}
    for k, v in state_dict.items():
        for prefix in ("backbone.", "module."):
            while k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, *k) -> flax (*k, I, O)."""
    spatial = list(range(2, w.ndim))
    return np.transpose(w, (*spatial, 1, 0))


def _map_unet_keys(state_dict, num_encoders: int):
    """Reference unet3d names -> our flax paths.

    DoubleConv family:
      encoders.i.basic_module.SingleConv{1,2}.{conv,groupnorm,batchnorm}.*
      and decoders.j.basic_module.... -> DoubleConv_{i or E+j}/SingleConv_{0,1}/...
    ResNetBlock(SE) family (ResidualUNet3D / ResidualUNetSE3D):
      ...basic_module.conv1 (1x1 lift)     -> ResNetBlock_{b}/Conv_0
      ...basic_module.conv{2,3}.{conv,groupnorm} -> ResNetBlock_{b}/SingleConv_{0,1}/...
      ...basic_module.se_module.cSE.fc{1,2} -> .../ChannelSpatialSE_0/ChannelSE_0/Dense_{0,1}
      ...basic_module.se_module.sSE.conv    -> .../ChannelSpatialSE_0/SpatialSE_0/Conv_0
      decoders.j.upsampling.upsample (ConvTranspose3d) -> ConvTranspose_{j}
        (kernel kept in torch (I, O) minor order — our decoder uses
        transpose_kernel=True, whose param layout is (*k, O, I))
    final_conv.{weight,bias} -> Conv_0/{kernel,bias}.
    """
    mapping = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] == "final_conv":
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            val = _conv_kernel(val) if leaf == "kernel" else val
            mapping[("Conv_0", leaf)] = val
        elif parts[0] in ("encoders", "decoders"):
            idx = int(parts[1])
            block = idx if parts[0] == "encoders" else num_encoders + idx
            if parts[2] == "upsampling":
                assert parts[0] == "decoders" and parts[3] == "upsample"
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                if leaf == "kernel":
                    # torch ConvTranspose3d weight (I, O, *k) -> (*k, O, I)
                    spatial = list(range(2, val.ndim))
                    val = np.transpose(val, (*spatial, 1, 0))
                mapping[(f"ConvTranspose_{idx}", leaf)] = val
                continue
            assert parts[2] == "basic_module", f"unsupported key {key}"
            sub = parts[3]
            if sub in ("SingleConv1", "SingleConv2"):
                blk = f"DoubleConv_{block}"
                sc = "SingleConv_0" if sub == "SingleConv1" else "SingleConv_1"
                layer, leaf_t = parts[4], parts[5]
            elif sub == "conv1":  # residual 1x1 channel lift
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                val = _conv_kernel(val) if leaf == "kernel" else val
                mapping[(f"ResNetBlock_{block}", "Conv_0", leaf)] = val
                continue
            elif sub in ("conv2", "conv3"):
                blk = f"ResNetBlock_{block}"
                sc = "SingleConv_0" if sub == "conv2" else "SingleConv_1"
                layer, leaf_t = parts[4], parts[5]
            elif sub == "se_module":
                blk = (f"ResNetBlock_{block}", "ChannelSpatialSE_0")
                leaf = "kernel" if parts[-1] == "weight" else "bias"
                if parts[4] == "cSE":
                    dense = "Dense_0" if parts[5] == "fc1" else "Dense_1"
                    if leaf == "kernel":
                        val = np.transpose(val)  # torch Linear (O, I) -> (I, O)
                    mapping[(*blk, "ChannelSE_0", dense, leaf)] = val
                else:  # sSE
                    assert parts[4] == "sSE" and parts[5] == "conv"
                    val = _conv_kernel(val) if leaf == "kernel" else val
                    mapping[(*blk, "SpatialSE_0", "Conv_0", leaf)] = val
                continue
            else:
                raise ValueError(f"unsupported reference module in key {key}")
            if layer == "conv":
                leaf = "kernel" if leaf_t == "weight" else "bias"
                val = _conv_kernel(val) if leaf == "kernel" else val
                mapping[(blk, sc, "Conv_0", leaf)] = val
            elif layer in ("groupnorm", "batchnorm"):
                norm = "GroupNorm_0" if layer == "groupnorm" else "BatchNorm_0"
                leaf = "scale" if leaf_t == "weight" else "bias"
                if leaf_t in ("running_mean", "running_var", "num_batches_tracked"):
                    continue  # batch statistics are not parameters here
                mapping[(blk, sc, norm, leaf)] = val
            else:
                raise ValueError(f"unsupported reference layer in key {key}")
        else:
            raise ValueError(f"unrecognized reference key {key}")
    return mapping


def _map_convnet_keys(state_dict):
    """Reference net.py ConvNet names -> our flax paths.

    block{k}.conv.{weight,bias} -> ConvBlock_{k-1}/Conv_0/{kernel,bias};
    block{k}.norm.* (group/batch norm) -> ConvBlock_{k-1}/{Group,Batch}Norm_0.
    (InstanceNorm in the reference is affine=False — no parameters — while
    our instance norm is a GroupNorm module with scale/bias; those keep their
    identity initialization, which is numerically equivalent.)
    """
    mapping = {}
    for key, val in state_dict.items():
        parts = key.split(".")
        if not parts[0].startswith("block"):
            raise ValueError(f"unrecognized reference key {key}")
        block = int(parts[0][len("block"):]) - 1
        layer, leaf_t = parts[1], parts[2]
        if layer == "conv":
            leaf = "kernel" if leaf_t == "weight" else "bias"
            val = _conv_kernel(val) if leaf == "kernel" else val
            mapping[(f"ConvBlock_{block}", "Conv_0", leaf)] = val
        elif layer == "norm":
            if leaf_t in ("running_mean", "running_var", "num_batches_tracked"):
                continue
            leaf = "scale" if leaf_t == "weight" else "bias"
            mapping[(f"ConvBlock_{block}", "GroupNorm_0", leaf)] = val
        elif layer in ("down", "activation"):
            continue  # parameter-free
        else:
            raise ValueError(f"unsupported reference layer in key {key}")
    return mapping


def import_backbone_state_dict(state_dict, backbone_params):
    """Map a reference backbone state_dict onto our backbone param tree.

    Auto-detects UNet-family vs ConvNet from the key names. Returns a new
    params dict of the same structure with imported values; raises if any
    target parameter is missing from the checkpoint or shapes mismatch.
    """
    import flax
    import jax.numpy as jnp

    sd = {k: _to_numpy(v) for k, v in _strip_prefixes(state_dict).items()}
    flat = flax.traverse_util.flatten_dict(backbone_params)

    if any(k.startswith(("encoders.", "decoders.", "final_conv.")) for k in sd):
        num_encoders = (
            max(int(k.split(".")[1]) for k in sd if k.startswith("encoders.")) + 1
        )
        mapping = _map_unet_keys(sd, num_encoders)
    elif any(k.startswith("block") for k in sd):
        mapping = _map_convnet_keys(sd)
    else:
        raise ValueError(
            f"unrecognized backbone checkpoint (keys like {sorted(sd)[:3]})"
        )

    new_flat = {}
    for path, current in flat.items():
        if path in mapping:
            val = mapping[path]
            assert val.shape == current.shape, (
                f"shape mismatch at {'/'.join(path)}: checkpoint {val.shape} "
                f"vs model {current.shape}"
            )
            new_flat[path] = jnp.asarray(val, current.dtype)
        else:
            # parameters absent from the reference (e.g. instance-norm
            # scale/bias, which torch keeps affine-free) keep their init
            new_flat[path] = current
    unused = set(mapping) - set(flat)
    if unused:
        raise ValueError(
            f"checkpoint keys with no target parameter: {sorted(unused)[:5]}"
        )
    return flax.traverse_util.unflatten_dict(new_flat)


def load_torch_backbone(path_or_state_dict, params):
    """Load a torch checkpoint file (or state_dict) into KeyMorphNet params.

    `params` is the full net.init(...) tree; the backbone subtree is
    replaced. Accepts the reference's checkpoint dict format
    ({'state_dict': ...} or a bare state_dict).
    """
    sd = path_or_state_dict
    if isinstance(sd, (str, bytes)):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    new_params = dict(params)
    inner = dict(new_params["params"])
    inner["backbone"] = import_backbone_state_dict(sd, inner["backbone"])
    new_params["params"] = inner
    return new_params
