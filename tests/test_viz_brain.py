"""Visualization + brain-extraction tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from keymorph_tpu import viz
from keymorph_tpu.brain_extract import clean_mask, extract_brain
from keymorph_tpu.models import SimpleUnet


def test_imshow_registration_2d(tmp_path, rng):
    img = rng.normal(size=(16, 16))
    pts = rng.uniform(-1, 1, size=(5, 2))
    path = str(tmp_path / "reg2d.png")
    viz.imshow_registration_2d(img, img, img, pts, pts, pts, save_path=path)
    assert os.path.getsize(path) > 1000


def test_imshow_registration_3d(tmp_path, rng):
    vol = rng.normal(size=(12, 13, 14))
    pts = rng.uniform(-1, 1, size=(6, 3))
    w = rng.uniform(0.1, 1, size=6)
    path = str(tmp_path / "reg3d.png")
    viz.imshow_registration_3d(vol, vol, vol, pts, pts, pts, weights=w, save_path=path)
    assert os.path.getsize(path) > 1000


def test_imshow_img_and_points_3d(tmp_path, rng):
    vol = rng.normal(size=(10, 10, 10))
    pts = rng.uniform(-1, 1, size=(4, 3))
    path = str(tmp_path / "pts3d.png")
    viz.imshow_img_and_points_3d(vol, pts, projection=True, save_path=path)
    assert os.path.getsize(path) > 1000


def test_plot_groupwise_register(tmp_path, rng):
    slices = [rng.normal(size=(8, 8)) for _ in range(3)]
    path = str(tmp_path / "group.png")
    viz.plot_groupwise_register(slices, slices, save_path=path)
    assert os.path.getsize(path) > 1000


def test_clean_mask_removes_islands():
    mask = np.zeros((20, 20, 20), np.uint8)
    mask[2:12, 2:12, 2:12] = 1  # 1000-voxel blob
    mask[16:18, 16:18, 16:18] = 1  # 8-voxel island (below 20% threshold)
    out = clean_mask(mask)
    assert out[5, 5, 5] == 1
    assert out[16, 16, 16] == 0
    assert out.sum() == 1000


def test_clean_mask_keeps_comparable_components():
    mask = np.zeros((20, 20, 20), np.uint8)
    mask[1:6, 1:6, 1:6] = 1
    mask[10:15, 10:15, 10:15] = 1  # same size -> kept
    out = clean_mask(mask)
    assert out.sum() == 2 * 125


def test_clean_mask_empty():
    assert clean_mask(np.zeros((4, 4, 4))).sum() == 0


def test_extract_brain_shapes(rng):
    model = SimpleUnet(out_channels=1)
    x = jnp.zeros((1, 16, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    img = rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32)
    masks = extract_brain(params, img)
    assert masks.shape == (1, 1, 16, 16, 16)
    assert masks.dtype == np.uint8
    assert set(np.unique(masks)).issubset({0, 1})


def test_imshow_points_slab_and_rotation(tmp_path, rng):
    """Slab mode (projection=False, reference viz_tools.py:185-191) and
    rotate_90_deg views render with keypoints filtered to the slab."""
    img = rng.uniform(0, 1, size=(24, 24, 24)).astype("float32")
    pts = rng.uniform(-0.9, 0.9, size=(32, 3)).astype("float32")
    p1 = str(tmp_path / "slab.png")
    viz.imshow_img_and_points_3d(
        img, pts, projection=False, slab_thickness=6, save_path=p1
    )
    p2 = str(tmp_path / "rot.png")
    viz.imshow_img_and_points_3d(
        img, pts, projection=True, rotate_90_deg=1, save_path=p2
    )
    import os
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0


def test_imshow_registration_3d_slab_rotate(tmp_path, rng):
    """The 3x3 panel passes slab/rotate through and overlays aligned+fixed
    points on the warped column (reference viz_tools.py:428-436)."""
    vols = [rng.uniform(0, 1, size=(20, 20, 20)).astype("float32") for _ in range(3)]
    pts = [rng.uniform(-0.9, 0.9, size=(16, 3)).astype("float32") for _ in range(3)]
    p = str(tmp_path / "panel_slab.png")
    viz.imshow_registration_3d(
        *vols, *pts, projection=False, slab_thickness=8, rotate_90_deg=1,
        suptitle="slab", save_path=p,
    )
    import os
    assert os.path.getsize(p) > 0
