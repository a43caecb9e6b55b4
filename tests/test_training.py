"""Training subsystem tests: step convergence, pretrain, checkpointing,
multi-chip sharding on the virtual CPU mesh."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from keymorph_tpu.models import UNet3D
from keymorph_tpu.models.keymorph import KeyMorphNet
from keymorph_tpu.training.config import Config, build_backbone, build_model
from keymorph_tpu.training.train import TrainState, make_optimizer, make_train_step
from keymorph_tpu.training.pretrain import make_pretrain_step
from keymorph_tpu.training import checkpoint as ckpt


def _tiny_net(num_keypoints=8):
    return KeyMorphNet(
        backbone=UNet3D(out_channels=num_keypoints, f_maps=4, num_levels=2),
        num_keypoints=num_keypoints,
    )


@pytest.fixture(scope="module")
def tiny_state():
    net = _tiny_net()
    img = jnp.zeros((1, 1, 12, 12, 12))
    params = net.init(jax.random.PRNGKey(0), img, img)
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    tx = make_optimizer(config)
    return net, config, TrainState.create(params, tx), tx


def test_train_step_reduces_loss(tiny_state, rng):
    net, config, state, tx = tiny_state
    step = make_train_step(net, config, tx)
    img_f = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    dummy = jnp.zeros((1,), jnp.float32)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sub, img_f, img_m, dummy, dummy, jnp.float32(1.0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0] + 1e-5, f"loss did not decrease: {losses}"


def test_train_step_tps_with_aug(rng):
    net = _tiny_net()
    config = Config(
        num_keypoints=8, transform_type="tps_loguniform", loss_fn="mse", lr=1e-5,
        max_train_keypoints=4,
        max_random_affine_augment_params=(0.1, 0.1, 0.5, 0.05),
    )
    img = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    dummy = jnp.zeros((1,), jnp.float32)
    state, metrics = step(state, jax.random.PRNGKey(1), img, img, dummy, dummy, jnp.float32(0.5))
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_dice(rng):
    net = _tiny_net()
    config = Config(num_keypoints=8, transform_type="affine", loss_fn="dice", lr=1e-5)
    img = jnp.asarray(rng.normal(size=(1, 1, 12, 12, 12)).astype(np.float32))
    seg = jnp.asarray(
        np.eye(3, dtype=np.float32)[rng.integers(0, 3, size=(1, 12, 12, 12))]
        .transpose(0, 4, 1, 2, 3)
    )
    params = net.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_train_step(net, config, tx)
    state, metrics = step(state, jax.random.PRNGKey(1), img, img, seg, seg, jnp.float32(1.0))
    assert 0 <= float(metrics["softdiceloss"]) <= 1


def test_pretrain_step_converges(rng):
    net = _tiny_net()
    config = Config(num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-3)
    img = jnp.asarray(rng.uniform(0, 1, size=(1, 1, 12, 12, 12)).astype(np.float32))
    ref_points = jnp.asarray(rng.uniform(-0.5, 0.5, size=(1, 8, 3)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img, img)
    tx = make_optimizer(config)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(net, config, tx)
    losses = []
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, img, ref_points, jnp.float32(0.0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path, tiny_state):
    net, config, state, tx = tiny_state
    path = ckpt.save_checkpoint(str(tmp_path), 5, state)
    assert "epoch5_model" in path
    assert ckpt.latest_epoch_checkpoint(str(tmp_path)) == path
    restored = ckpt.load_checkpoint(path, state_template=state)
    assert int(restored["epoch"]) == 5
    for a, b in zip(jax.tree.leaves(restored["params"]), jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_with_ref_points(tmp_path, tiny_state):
    """Pretrain checkpoints carry ref_points; the templated restore must
    include them (metadata-driven template, not exception fallback)."""
    net, config, state, tx = tiny_state
    ref = np.linspace(-0.5, 0.5, 24).reshape(1, 8, 3).astype(np.float32)
    path = ckpt.save_checkpoint(str(tmp_path), 3, state, ref_points=ref)
    restored = ckpt.load_checkpoint(path, state_template=state)
    np.testing.assert_allclose(np.asarray(restored["ref_points"]), ref)
    assert int(restored["epoch"]) == 3


def test_checkpoint_corrupt_raises(tmp_path, tiny_state):
    """A structurally broken checkpoint must raise, not silently degrade
    (the round-1 BaseException catch masked corruption)."""
    net, config, state, tx = tiny_state
    path = ckpt.save_checkpoint(str(tmp_path), 1, state)
    # destroy the array payload but keep the directory shape plausible
    import shutil

    for name in os.listdir(path):
        full = os.path.join(path, name)
        if os.path.isdir(full):
            shutil.rmtree(full)
        else:
            os.remove(full)
    with pytest.raises(Exception):
        ckpt.load_checkpoint(path, state_template=state)


def test_onehot_pin_is_per_step_fn(tiny_state):
    """The one-hot channel pin lives on the step fn, so a new run's step fn
    never inherits a stale count (the round-1 id()-keyed cache could)."""
    net, config, state, tx = tiny_state
    s1 = make_train_step(net, config, tx)
    s2 = make_train_step(net, config, tx)
    s1._n_cls_pin = 7
    assert getattr(s2, "_n_cls_pin", None) is None


def test_checkpoint_latest_picks_max(tmp_path, tiny_state):
    net, config, state, tx = tiny_state
    ckpt.save_checkpoint(str(tmp_path), 2, state)
    p10 = ckpt.save_checkpoint(str(tmp_path), 10, state)
    ckpt.save_checkpoint(str(tmp_path), 9, state)
    assert ckpt.latest_epoch_checkpoint(str(tmp_path)) == p10


def test_config_roundtrip(tmp_path):
    c = Config(num_keypoints=64, transform_type="tps_0.1", loss_fn="dice")
    path = str(tmp_path / "args.json")
    c.save(path)
    c2 = Config.load(path)
    assert c2.num_keypoints == 64 and c2.transform_type == "tps_0.1"


def test_build_backbone_variants():
    for backbone in (
        "conv", "unet", "truncatedunet", "residualunet", "residualunetse"
    ):
        c = Config(num_keypoints=8, backbone=backbone, num_levels_for_unet=2)
        net = build_backbone(c)
        assert net is not None


# -- multi-chip (virtual 8-device CPU mesh) ---------------------------------


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    warped = out[0]
    assert warped.shape == args[1].shape


def test_sharded_matches_single_device(rng):
    """The sharded train step must produce the same loss/params as the
    single-device step (same seeds, tiny tolerances)."""
    from keymorph_tpu.parallel import make_mesh, make_sharded_train_step

    net = _tiny_net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    img_f = jnp.asarray(rng.normal(size=(4, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(4, 1, 12, 12, 12)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f[:1], img_f[:1])
    tx = make_optimizer(config)
    dummy = jnp.zeros((1,), jnp.float32)
    key = jax.random.PRNGKey(7)

    single = make_train_step(net, config, tx)
    s0 = TrainState.create(params, tx)
    s1, m1 = single(s0, key, img_f, img_m, dummy, dummy, jnp.float32(1.0))

    mesh = make_mesh(num_devices=4, space=1)
    sharded = make_sharded_train_step(net, config, mesh, tx)
    s0b = TrainState.create(params, tx)
    s2, m2 = sharded(s0b, key, img_f, img_m, dummy, dummy, jnp.float32(1.0))

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    # adam normalizes updates to ~lr regardless of gradient magnitude, so
    # reduction-order differences in tiny gradients flip updates by +-2*lr
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_sharded_train_warp_kernel_path(rng, monkeypatch):
    """Sharded train step with the PALLAS warp active per shard (interpret
    mode): kernel-eligible local slabs, loss parity vs the XLA warp path
    (VERDICT r2 #7's done condition)."""
    from keymorph_tpu.parallel import make_mesh, make_sharded_train_step

    net = _tiny_net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.0, 0.0, 0.0, 0.0),
    )
    # local slab after space=2 sharding: (16, 16, 64) -> tiles 4*2*2 = 16,
    # a multiple of the kernel's 8-subtile group (shapes eligible)
    img_f = jnp.asarray(rng.normal(size=(2, 1, 32, 16, 64)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(2, 1, 32, 16, 64)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f[:1], img_f[:1])
    tx = make_optimizer(config)
    dummy = jnp.zeros((1,), jnp.float32)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(num_devices=4, space=2)

    sharded = make_sharded_train_step(net, config, mesh, tx)
    s0 = TrainState.create(params, tx)
    _, m_xla = sharded(s0, key, img_f, img_m, dummy, dummy, jnp.float32(1.0))

    monkeypatch.setenv("KM_FORCE_FAST_WARP", "1")
    sharded_k = make_sharded_train_step(net, config, mesh, tx)
    s0b = TrainState.create(params, tx)
    _, m_ker = sharded_k(s0b, key, img_f, img_m, dummy, dummy, jnp.float32(1.0))

    assert np.isfinite(float(m_ker["loss"]))
    assert float(m_ker["loss"]) == pytest.approx(float(m_xla["loss"]), rel=1e-4)


def test_sharded_matches_single_device_with_aug(rng):
    """Sharded train step with ACTIVE augmentation: the param draw happens
    once on the full batch (same key as the unsharded step) and only the
    warp runs under shard_map, so the two steps must agree."""
    from keymorph_tpu.parallel import make_mesh, make_sharded_train_step

    net = _tiny_net()
    config = Config(
        num_keypoints=8, transform_type="affine", loss_fn="mse", lr=1e-4,
        max_random_affine_augment_params=(0.1, 0.1, 0.5, 0.05),
    )
    img_f = jnp.asarray(rng.normal(size=(4, 1, 12, 12, 12)).astype(np.float32))
    img_m = jnp.asarray(rng.normal(size=(4, 1, 12, 12, 12)).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), img_f[:1], img_f[:1])
    tx = make_optimizer(config)
    dummy = jnp.zeros((1,), jnp.float32)
    key = jax.random.PRNGKey(9)

    single = make_train_step(net, config, tx)
    s1, m1 = single(
        TrainState.create(params, tx), key, img_f, img_m, dummy, dummy,
        jnp.float32(0.7),
    )

    mesh = make_mesh(num_devices=4, space=1)
    sharded = make_sharded_train_step(net, config, mesh, tx)
    s2, m2 = sharded(
        TrainState.create(params, tx), key, img_f, img_m, dummy, dummy,
        jnp.float32(0.7),
    )
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
