"""Regression tests for the round-1 code-review findings."""

import os
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from keymorph_tpu.models import KeyMorph, UNet3D


@pytest.fixture(scope="module")
def km_small():
    km = KeyMorph(
        backbone=UNet3D(out_channels=8, f_maps=2, num_levels=2), num_keypoints=8
    )
    km.init_params(jax.random.PRNGKey(0), jnp.zeros((1, 1, 10, 10, 10)))
    return km


def _eval_args(tmp_path):
    class A:
        pass

    a = A()
    a.model_eval_dir = Path(tmp_path)
    a.early_stop_eval_subjects = None
    a.skip_if_completed = False
    a.seg_available = False
    a.dim = 3
    return a


def test_run_eval_skips_out_of_suite_pairs(km_small, tmp_path, rng):
    """A combined loader carrying T1-T2 pairs must not crash a unimodal
    suite (KeyError regression) — out-of-suite pairs are skipped."""
    from keymorph_tpu.cli.eval_pairwise import run_eval

    def batch(mod):
        return {
            "img": rng.uniform(0, 1, size=(1, 1, 10, 10, 10)).astype(np.float32),
            "affine": np.eye(4, dtype=np.float32)[None],
            "modality": [mod],
        }

    loader = [
        (batch("T1"), batch("T1")),
        (batch("T1"), batch("T2")),  # multimodal pair in a unimodal sweep
    ]
    metrics = run_eval(
        loader, km_small, ["mse"], [("T1", "T1")], ["rot0"], ["affine"],
        _eval_args(tmp_path),
    )
    assert len(metrics["mse:T1:T1:rot0:affine"]) == 1
    assert "mse:T1:T2:rot0:affine" not in metrics


def test_groupwise_grid_prefix_no_collision(tmp_path):
    """tps_1 must not pick up tps_10 grids (prefix-collision regression)."""
    from keymorph_tpu.cli.eval_groupwise import _run_group_eval_dir

    results_dir = tmp_path / "registration_results"
    results_dir.mkdir(parents=True)
    # simulate saved grids for both aligns
    for align in ("tps_1", "tps_10"):
        for i in range(2):
            np.save(results_dir / f"{align}_grid_{i:03}.npy", np.zeros((1, 4, 4, 4, 3)))
    found = sorted(
        f for f in os.listdir(results_dir) if f.startswith("tps_1_grid_")
    )
    assert found == ["tps_1_grid_000.npy", "tps_1_grid_001.npy"]


def test_one_hot_subsampled_pair_fresh_subsets(rng):
    """Without a seed, successive calls draw different label subsets
    (fixed-seed regression)."""
    from keymorph_tpu.utils import one_hot_subsampled_pair

    seg = rng.integers(0, 40, size=(1, 1, 8, 8, 8))
    picks = set()
    for _ in range(6):
        o1, _ = one_hot_subsampled_pair(seg, seg, subsample_num=5)
        # fingerprint the chosen subset by per-channel voxel counts
        picks.add(tuple(np.asarray(o1).sum(axis=(0, 2, 3, 4)).astype(int)))
    assert len(picks) > 1, "subset identical across calls"


def test_lc2_even_size_clear_error(rng):
    from keymorph_tpu.metrics import LC2

    img = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 16)).astype(np.float32))
    with pytest.raises(AssertionError, match="odd"):
        LC2(radiuses=(3,))(img, img)


def test_sharded_register_rejects_distributional_lambda():
    from keymorph_tpu.models import UNet3D
    from keymorph_tpu.models.keymorph import KeyMorphNet
    from keymorph_tpu.parallel import make_mesh, make_sharded_register_fn
    from keymorph_tpu.training.config import Config

    net = KeyMorphNet(
        backbone=UNet3D(out_channels=8, f_maps=2, num_levels=2), num_keypoints=8
    )
    mesh = make_mesh(num_devices=2, space=1)
    config = Config(num_keypoints=8, transform_type="tps_loguniform")
    with pytest.raises(ValueError, match="numeric TPS lambda"):
        make_sharded_register_fn(net, config, mesh)
