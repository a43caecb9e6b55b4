"""Weighted groupwise registration (the reference's open TODO, made real)
and LinearRegressor keypoint head through the pipeline, and long-eval."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from keymorph_tpu.models import KeyMorph, UNet3D


def test_weighted_groupwise_power(rng):
    km = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=2, num_levels=2),
        num_keypoints=8,
        weight_keypoints="power",
    )
    imgs = jnp.asarray(rng.uniform(0, 1, size=(3, 1, 10, 10, 10)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(0), imgs[:1])
    res = km.groupwise_register(imgs, transform_type=["affine"], num_iters=2)
    r = res["affine"]
    w = np.asarray(r["grouppoints_weights"])
    assert w.shape == (3, 8)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-4)
    assert r["groupgrids"].shape == (3, 10, 10, 10, 3)
    # NOTE: convergence is not asserted — untrained power weights on random
    # images concentrate mass on a few keypoints, making the weighted fit
    # ill-conditioned (true of the reference's pairwise weighting too);
    # trained weights are what make this useful.
    assert np.isfinite(np.asarray(r["grouppoints_a"])).all()
    assert np.isfinite(np.asarray(r["groupgrids"])).all()


def test_weighted_groupwise_variance(rng):
    km = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=2, num_levels=2),
        num_keypoints=8,
        weight_keypoints="variance",
    )
    imgs = jnp.asarray(rng.uniform(0, 1, size=(2, 1, 10, 10, 10)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(1), imgs[:1])
    res = km.groupwise_register(imgs, transform_type=["tps_1"], num_iters=1)
    assert np.isfinite(np.asarray(res["tps_1"]["groupgrids"])).all()


def test_linear_keypoint_layer_pipeline(rng):
    km = KeyMorph(
        backbone=UNet3D(out_channels=16, f_maps=2, num_levels=2),
        num_keypoints=8,
        keypoint_layer="linear",
    )
    img = jnp.asarray(rng.normal(size=(1, 1, 10, 10, 10)).astype(np.float32))
    km.init_params(jax.random.PRNGKey(2), img)
    res = km(img, img, transform_type="affine")
    pts = np.asarray(res["affine"]["points_f"])
    assert pts.shape == (1, 8, 3)
    assert (np.abs(pts) <= 1).all()


def test_run_long_eval(tmp_path, rng):
    """Longitudinal groupwise eval over a per-subject time series."""
    from keymorph_tpu.cli.eval_groupwise import run_long_eval

    km = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=2, num_levels=2), num_keypoints=8
    )
    km.init_params(jax.random.PRNGKey(3), jnp.zeros((1, 1, 10, 10, 10)))

    series = [
        [
            {
                "img": rng.uniform(0, 1, size=(1, 10, 10, 10)).astype(np.float32),
                "affine": np.eye(4, dtype=np.float32),
            }
            for _ in range(3)
        ]
    ]

    class Args:
        pass

    args = Args()
    args.model_eval_dir = tmp_path
    args.early_stop_eval_subjects = None
    args.seg_available = False
    args.dim = 3
    metrics = run_long_eval(
        {"ds": series}, km, ["mse"], ["ds"], ["rot0"], ["affine"], args
    )
    key = "mse:ds:rot0:affine"
    assert key in metrics and len(metrics[key]) == 1
    assert np.isfinite(metrics[key][0])
