"""Augmentation tests: matrix composition parity vs a torch oracle of the
reference's composition, plus image/point consistency."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from keymorph_tpu import augment


def _torch_matrix_3d(scale, offset, theta, shear):
    """Oracle: reference AffineDeformation3d.build_affine_matrix
    (augmentation.py:85-158) math in torch."""
    bs = scale.shape[0]
    scale, offset, theta, shear = map(torch.from_numpy, (scale, offset, theta, shear))
    ones = torch.ones(bs)
    Ms = torch.zeros(bs, 4, 4)
    Ms[:, 0, 0], Ms[:, 1, 1], Ms[:, 2, 2], Ms[:, 3, 3] = (
        scale[:, 0], scale[:, 1], scale[:, 2], ones,
    )
    Mt = torch.eye(4).repeat(bs, 1, 1)
    Mt[:, 0, 3], Mt[:, 1, 3], Mt[:, 2, 3] = offset[:, 0], offset[:, 1], offset[:, 2]
    m1 = torch.eye(4).repeat(bs, 1, 1)
    m1[:, 1, 1] = torch.cos(theta[:, 0]); m1[:, 1, 2] = -torch.sin(theta[:, 0])
    m1[:, 2, 1] = torch.sin(theta[:, 0]); m1[:, 2, 2] = torch.cos(theta[:, 0])
    m2 = torch.eye(4).repeat(bs, 1, 1)
    m2[:, 0, 0] = torch.cos(theta[:, 1]); m2[:, 0, 2] = torch.sin(theta[:, 1])
    m2[:, 2, 0] = -torch.sin(theta[:, 1]); m2[:, 2, 2] = torch.cos(theta[:, 1])
    m3 = torch.eye(4).repeat(bs, 1, 1)
    m3[:, 0, 0] = torch.cos(theta[:, 2]); m3[:, 0, 1] = -torch.sin(theta[:, 2])
    m3[:, 1, 0] = torch.sin(theta[:, 2]); m3[:, 1, 1] = torch.cos(theta[:, 2])
    Mz = torch.eye(4).repeat(bs, 1, 1)
    Mz[:, 0, 1], Mz[:, 0, 2] = shear[:, 0], shear[:, 1]
    Mz[:, 1, 0], Mz[:, 1, 2] = shear[:, 2], shear[:, 3]
    Mz[:, 2, 0], Mz[:, 2, 1] = shear[:, 4], shear[:, 5]
    Mr = torch.bmm(m3, torch.bmm(m2, m1))
    return torch.bmm(Mz, torch.bmm(Ms, torch.bmm(Mt, Mr))).numpy()


def test_matrix_3d_parity(rng):
    scale = rng.uniform(0.8, 1.2, size=(2, 3)).astype(np.float32)
    offset = rng.uniform(-0.2, 0.2, size=(2, 3)).astype(np.float32)
    theta = rng.uniform(-1, 1, size=(2, 3)).astype(np.float32)
    shear = rng.uniform(-0.1, 0.1, size=(2, 6)).astype(np.float32)
    ours = np.asarray(
        augment.build_affine_matrix_3d(*map(jnp.asarray, (scale, offset, theta, shear)))
    )
    ref = _torch_matrix_3d(scale, offset, theta, shear)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matrix_2d_rotation():
    theta = np.array([[np.pi / 2]], np.float32)
    m = np.asarray(
        augment.build_affine_matrix_2d(
            jnp.ones((1, 2)), jnp.zeros((1, 2)), jnp.asarray(theta), jnp.zeros((1, 2))
        )
    )
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(m[0], expect, atol=1e-6)


def test_identity_augment_matches_torch_quirk(rng):
    """Identity params are NOT a perfect no-op: the reference evaluates flows
    on a linspace(-1,1) grid but samples with align_corners=False
    (SURVEY §7 'coordinate conventions'). Parity = match torch's grid_sample
    on that same grid, and be a no-op at the volume center."""
    img = rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32)
    out = np.asarray(augment.affine_augment(jnp.asarray(img), (0.0, 0.0, 0.0, 0.0)))
    axes = [np.linspace(-1, 1, 8, dtype=np.float32)] * 3
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1)[None][..., ::-1].copy()
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(img), torch.from_numpy(g),
        mode="bilinear", padding_mode="border", align_corners=False,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_points_and_image_move_consistently(rng):
    """An impulse at a keypoint must end up at the transformed keypoint."""
    D = 33
    loc = np.array([4, 20, 28])
    img = np.zeros((1, 1, D, D, D), np.float32)
    img[0, 0, loc[0], loc[1], loc[2]] = 1.0
    # point in [-1,1] using the linspace convention of the flow grids
    pt = (loc / (D - 1) * 2 - 1).astype(np.float32).reshape(1, 1, 3)

    params = augment.fixed_affine_params(1, 3, (0.0, 0.1, 0.3, 0.0))
    img_a, pts_a, M = augment.affine_augment_with_params(
        jnp.asarray(img), params, points=jnp.asarray(pt), return_affine_matrix=True
    )
    img_a = np.asarray(img_a)
    com = np.array(
        np.unravel_index(np.argmax(img_a[0, 0]), img_a[0, 0].shape), np.float64
    )
    com_norm = com / (D - 1) * 2 - 1
    np.testing.assert_allclose(com_norm, np.asarray(pts_a)[0, 0], atol=0.1)


def test_random_augment_jits(rng):
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))

    @jax.jit
    def step(key, img):
        return augment.random_affine_augment(key, img, scale_params=0.5)

    out = step(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    out2 = step(jax.random.PRNGKey(1), img)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_seg_nearest_interpolation(rng):
    seg = (rng.integers(0, 4, size=(1, 1, 8, 8, 8))).astype(np.float32)
    out = augment.affine_augment(jnp.asarray(seg), (0.0, 0.05, 0.2, 0.0), seg=jnp.asarray(seg))[1]
    vals = np.unique(np.asarray(out))
    assert set(vals).issubset({0.0, 1.0, 2.0, 3.0})


def test_pair_augment_same_transform(rng):
    img = jnp.asarray(rng.normal(size=(1, 1, 8, 8, 8)).astype(np.float32))
    a, b = augment.random_affine_augment_pair(jax.random.PRNGKey(3), img, img)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
