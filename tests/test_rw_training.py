"""Real-world-coords TRAINING and PRETRAINING (reference train.py:99-100,
pretrain.py:70-71, run.py:527-550) plus the batch-norm layer paths
(reference layers.py:156-187, unet3d/buildingblocks.py:75-87)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keymorph_tpu.models.convnet import ConvNet
from keymorph_tpu.models.keymorph import KeyMorphNet
from keymorph_tpu.models.unet import UNet3D
from keymorph_tpu.training.config import Config
from keymorph_tpu.training.train import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from keymorph_tpu.training.pretrain import make_pretrain_step


def _tiny_net(num_keypoints=8, **unet_kw):
    backbone = UNet3D(out_channels=num_keypoints, f_maps=2, num_levels=2, **unet_kw)
    return KeyMorphNet(backbone=backbone, num_keypoints=num_keypoints, dim=3)


def _affines(rng, batch=1):
    def one():
        a = np.eye(4, dtype=np.float32)
        a[:3, :3] = np.diag(rng.uniform(0.8, 2.0, size=3)).astype(np.float32)
        a[:3, 3] = rng.uniform(-30, 30, size=3)
        return a

    return jnp.asarray(np.stack([one() for _ in range(batch)]))


@pytest.mark.slow
@pytest.mark.parametrize("transform_type", ["affine", "tps_0.1"])
def test_rw_train_step_decreases_loss(rng, transform_type):
    net = _tiny_net()
    config = Config(
        num_keypoints=8,
        transform_type=transform_type,
        loss_fn="mse",
        lr=1e-3,
        max_random_affine_augment_params=(0.1, 0.1, 0.5, 0.05),
        align_keypoints_in_real_world_coords=True,
        max_train_keypoints=None,
    )
    img_f = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 10, 12, 14)).astype(np.float32))
    img_m = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 10, 12, 14)).astype(np.float32))
    aff_f, aff_m = _affines(rng), _affines(rng)
    params = net.init(jax.random.PRNGKey(0), img_f, img_m)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        key, sub = jax.random.split(key)
        # aug_scale=0 keeps the aug-matrix composition path live but
        # deterministic, so the loss sequence is comparable step to step
        state, m = step(
            state, sub, img_f, img_m, None, None, jnp.float32(0.0), aff_f, aff_m
        )
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0]


def test_rw_train_step_requires_affines(rng):
    """The rw step refuses to trace without the NIfTI affines."""
    net = _tiny_net()
    config = Config(
        num_keypoints=8,
        transform_type="affine",
        loss_fn="mse",
        align_keypoints_in_real_world_coords=True,
    )
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 10, 12, 14)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    with pytest.raises(AssertionError, match="real-world"):
        step(state, jax.random.PRNGKey(0), img, img, None, None, jnp.float32(1.0))


@pytest.mark.slow
def test_rw_pretrain_step_decreases_loss(rng):
    """rw pretraining: voxel-sampled reference points -> real coords via the
    affine; predicted norm points convert through the ORIGINAL affine
    (reference pretrain.py:70-71)."""
    from keymorph_tpu.training.pretrain import pick_reference_subject
    from keymorph_tpu.ops import coords as Coords

    net = _tiny_net()
    config = Config(
        num_keypoints=8,
        transform_type="affine",
        loss_fn="mse",
        lr=1e-3,
        align_keypoints_in_real_world_coords=True,
    )
    img = rng.uniform(0.2, 1.0, size=(1, 1, 10, 12, 14)).astype(np.float32)
    aff = _affines(rng)

    loader = [{"img": img, "affine": np.asarray(aff[0])}]
    ref_img, ref_points, ref_aff = pick_reference_subject(iter(loader), config)
    assert ref_aff is not None
    # round-trip: real points map back inside the normalized cube
    back = Coords.convert_points_real2norm(ref_points, ref_aff, img.shape[2:])
    assert np.all(np.abs(np.asarray(back)) <= 1.0 + 1e-5)

    params = net.init(jax.random.PRNGKey(0), ref_img, ref_img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(net, config, tx)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, ref_img, ref_points, jnp.float32(0.0), ref_aff)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0]


# -- batch norm (VERDICT r2 item 2) -----------------------------------------


def test_convblock_batch_norm_applies(rng):
    """norm_type='batch' must work under plain apply (the r2 repro)."""
    from keymorph_tpu.models.layers import ConvBlock

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8, 3)).astype(np.float32))
    blk = ConvBlock(out_channels=4, norm_type="batch", down_sample=False)
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (2, 8, 8, 8, 4)
    assert np.all(np.isfinite(np.asarray(y)))


def test_stateless_batchnorm_matches_torch(rng):
    """Numerics vs torch BatchNorm3d in train mode (batch statistics)."""
    torch = pytest.importorskip("torch")
    from keymorph_tpu.models.layers import StatelessBatchNorm

    x = rng.normal(size=(2, 6, 5, 4, 3)).astype(np.float32)  # (B,*S,C)
    bn = StatelessBatchNorm()
    params = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(bn.apply(params, jnp.asarray(x)))

    tbn = torch.nn.BatchNorm3d(3, affine=True)
    tbn.train()
    with torch.no_grad():
        ty = tbn(torch.from_numpy(np.moveaxis(x, -1, 1)))
    np.testing.assert_allclose(
        y, np.moveaxis(ty.numpy(), 1, -1), atol=2e-5, rtol=1e-4
    )


@pytest.mark.slow
def test_unet_bcr_order_trains(rng):
    """A 'bcr'-order U-Net initializes, applies, and takes a grad step."""
    net = _tiny_net(layer_order="bcr")
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-3,
        max_train_keypoints=None,
    )
    img_f = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 8, 8, 8)).astype(np.float32))
    img_m = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 8, 8, 8)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f, img_m)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    state, m = step(
        state, jax.random.PRNGKey(0), img_f, img_m, None, None, jnp.float32(0.0)
    )
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_convnet_batch_norm_forward(rng):
    """The ConvNet backbone with norm_type='batch' (reference net.py:7-36 +
    layers.py:156-187) runs end-to-end."""
    net = ConvNet(out_dim=4, dim=3, norm_type="batch")
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 6, 1)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    y = net.apply(params, x)
    assert np.all(np.isfinite(np.asarray(y)))
