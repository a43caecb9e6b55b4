"""Torch-checkpoint import: our forward must match the reference model's
forward once its weights are imported."""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

REF_PATH = "/root/reference"


def _ref():
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    for name in ("nibabel", "skimage", "skimage.morphology"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage"].morphology = sys.modules["skimage.morphology"]
    try:
        import keymorph.net as ref_net
        import keymorph.unet3d.model as ref_unet
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")
    return ref_net, ref_unet


def test_import_truncated_unet3d_forward_parity(rng):
    import torch

    _, ref_unet = _ref()
    torch.manual_seed(0)
    K, F, L = 6, 8, 3
    t_model = ref_unet.TruncatedUNet3D(
        1, K, 1, final_sigmoid=False, f_maps=F, layer_order="gcr",
        num_groups=8, num_levels=L, is_segmentation=False, conv_padding=1,
    )
    t_model.eval()

    from keymorph_tpu.models import TruncatedUNet3D
    from keymorph_tpu.tools.import_torch_weights import import_backbone_state_dict

    j_model = TruncatedUNet3D(
        out_channels=K, f_maps=F, num_levels=L, num_truncated_layers=1
    )
    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    params = j_model.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1))
    imported = import_backbone_state_dict(t_model.state_dict(), params["params"])

    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x)).numpy()  # (1, K, 8, 8, 8)
    ours = np.asarray(
        j_model.apply({"params": imported}, jnp.moveaxis(jnp.asarray(x), 1, -1))
    )
    ours = np.moveaxis(ours, -1, 1)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)


def test_import_unet3d_forward_parity(rng):
    import torch

    _, ref_unet = _ref()
    torch.manual_seed(1)
    K, F, L = 4, 8, 2
    t_model = ref_unet.UNet3D(
        1, K, final_sigmoid=False, f_maps=F, layer_order="gcr",
        num_groups=8, num_levels=L, is_segmentation=False, conv_padding=1,
    )
    t_model.eval()

    from keymorph_tpu.models import UNet3D
    from keymorph_tpu.tools.import_torch_weights import import_backbone_state_dict

    j_model = UNet3D(out_channels=K, f_maps=F, num_levels=L)
    x = rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32)
    params = j_model.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1))
    imported = import_backbone_state_dict(t_model.state_dict(), params["params"])
    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x)).numpy()
    ours = np.moveaxis(
        np.asarray(j_model.apply({"params": imported}, jnp.moveaxis(jnp.asarray(x), 1, -1))),
        -1, 1,
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)


def test_imported_weights_keypoint_parity(rng):
    """End-to-end: keypoints from imported weights match the reference's
    backbone+CoM keypoints."""
    import torch

    ref_net_mod, ref_unet = _ref()
    import keymorph.layers as ref_layers

    torch.manual_seed(2)
    K, F, L = 6, 8, 2
    t_model = ref_unet.UNet3D(
        1, K, final_sigmoid=False, f_maps=F, layer_order="gcr",
        num_groups=8, num_levels=L, is_segmentation=False, conv_padding=1,
    )
    t_model.eval()
    com = ref_layers.CenterOfMass3d(indexing="ij")

    from keymorph_tpu.models import KeyMorph, UNet3D
    from keymorph_tpu.tools.import_torch_weights import load_torch_backbone

    km = KeyMorph(backbone=UNet3D(out_channels=K, f_maps=F, num_levels=L), num_keypoints=K)
    x = rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32)
    km.init_params(jax.random.PRNGKey(0), jnp.asarray(x))
    km.params = load_torch_backbone(
        {"state_dict": {f"backbone.{k}": v for k, v in t_model.state_dict().items()}},
        km.params,
    )
    ours = np.asarray(km.get_keypoints(jnp.asarray(x)))
    with torch.no_grad():
        theirs = com(t_model(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_import_convnet_forward_parity(rng):
    import torch

    ref_net_mod, _ = _ref()
    torch.manual_seed(3)
    t_model = ref_net_mod.ConvNet(3, 1, 4, norm_type="instance")
    t_model.eval()

    from keymorph_tpu.models import ConvNet
    from keymorph_tpu.tools.import_torch_weights import import_backbone_state_dict

    j_model = ConvNet(out_dim=4, dim=3, norm_type="instance")
    x = rng.normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    params = j_model.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1))
    imported = import_backbone_state_dict(t_model.state_dict(), params["params"])
    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x)).numpy()
    ours = np.moveaxis(
        np.asarray(j_model.apply({"params": imported}, jnp.moveaxis(jnp.asarray(x), 1, -1))),
        -1, 1,
    )
    np.testing.assert_allclose(ours, ref_out, atol=5e-4)


def test_import_residual_unet3d_forward_parity(rng):
    import torch

    _, ref_unet = _ref()
    torch.manual_seed(4)
    K, F, L = 5, 8, 3
    t_model = ref_unet.ResidualUNet3D(
        1, K, final_sigmoid=False, f_maps=F, layer_order="gcr",
        num_groups=8, num_levels=L, is_segmentation=False, conv_padding=1,
    )
    t_model.eval()

    from keymorph_tpu.models import ResidualUNet3D
    from keymorph_tpu.tools.import_torch_weights import import_backbone_state_dict

    j_model = ResidualUNet3D(out_channels=K, f_maps=F, num_levels=L)
    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    params = j_model.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1))
    imported = import_backbone_state_dict(t_model.state_dict(), params["params"])

    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x)).numpy()
    ours = np.moveaxis(
        np.asarray(
            j_model.apply({"params": imported}, jnp.moveaxis(jnp.asarray(x), 1, -1))
        ),
        -1, 1,
    )
    np.testing.assert_allclose(ours, ref_out, atol=5e-4)


def test_import_residual_unet_se3d_forward_parity(rng):
    import torch

    _, ref_unet = _ref()
    torch.manual_seed(5)
    K, F, L = 4, 8, 2
    t_model = ref_unet.ResidualUNetSE3D(
        1, K, final_sigmoid=False, f_maps=F, layer_order="gcr",
        num_groups=8, num_levels=L, is_segmentation=False, conv_padding=1,
    )
    t_model.eval()

    from keymorph_tpu.models import ResidualUNetSE3D
    from keymorph_tpu.tools.import_torch_weights import import_backbone_state_dict

    j_model = ResidualUNetSE3D(out_channels=K, f_maps=F, num_levels=L)
    x = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    params = j_model.init(jax.random.PRNGKey(0), jnp.moveaxis(jnp.asarray(x), 1, -1))
    imported = import_backbone_state_dict(t_model.state_dict(), params["params"])

    with torch.no_grad():
        ref_out = t_model(torch.from_numpy(x)).numpy()
    ours = np.moveaxis(
        np.asarray(
            j_model.apply({"params": imported}, jnp.moveaxis(jnp.asarray(x), 1, -1))
        ),
        -1, 1,
    )
    np.testing.assert_allclose(ours, ref_out, atol=5e-4)
