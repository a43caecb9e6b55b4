"""CLI end-to-end tests: train a couple of debug steps, run the eval
harness, run the register CLI — all on tiny synthetic NIfTI data."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from keymorph_tpu.data.nifti import save_nifti


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Four tiny subjects (2 modalities x train/test) with segs + CSV."""
    root = tmp_path_factory.mktemp("tiny_data")
    rng = np.random.default_rng(0)
    rows = []
    for i, (mod, train) in enumerate(
        [("T1", True), ("T1", True), ("T2", True), ("T1", False), ("T2", False)]
    ):
        img = rng.uniform(0, 1, size=(12, 12, 12)).astype(np.float32)
        seg = rng.integers(0, 3, size=(12, 12, 12)).astype(np.int16)
        img_path = str(root / f"img{i}.nii.gz")
        seg_path = str(root / f"seg{i}.nii.gz")
        save_nifti(img_path, img)
        save_nifti(seg_path, seg)
        rows.append(f"{img_path},{seg_path},None,{mod},{train}")
    csv_path = str(root / "data.csv")
    with open(csv_path, "w") as fh:
        fh.write("img_path,seg_path,mask_path,modality,train\n")
        fh.write("\n".join(rows) + "\n")
    return root, csv_path


def test_run_cli_train_debug(tiny_dataset, tmp_path):
    from keymorph_tpu.cli.run import main

    root, csv_path = tiny_dataset
    save_dir = str(tmp_path / "out")
    main([
        "--run_mode", "train", "--debug_mode",
        "--num_keypoints", "8", "--loss_fn", "mse", "--transform_type", "affine",
        "--data_path", csv_path, "--train_dataset", "csv",
        "--backbone", "unet", "--num_levels_for_unet", "2",
        "--img_size", "12", "12", "12",
        "--save_dir", save_dir, "--lr", "1e-4", "--log_interval", "1",
    ])
    # args dump + checkpoints exist
    model_dir = os.path.join(save_dir, "keymorph")
    assert os.path.exists(os.path.join(model_dir, "args.json"))
    ckpts = os.listdir(os.path.join(model_dir, "checkpoints"))
    assert any("epoch" in c for c in ckpts)


def test_run_cli_pretrain_debug(tiny_dataset, tmp_path):
    from keymorph_tpu.cli.run import main

    root, csv_path = tiny_dataset
    save_dir = str(tmp_path / "out_pre")
    main([
        "--run_mode", "pretrain", "--debug_mode",
        "--num_keypoints", "8", "--loss_fn", "mse", "--transform_type", "affine",
        "--data_path", csv_path, "--train_dataset", "csv",
        "--backbone", "unet", "--num_levels_for_unet", "2",
        "--img_size", "12", "12", "12",
        "--save_dir", save_dir, "--lr", "1e-4", "--log_interval", "1",
    ])
    model_dir = os.path.join(save_dir, "keymorph")
    ckpts = os.listdir(os.path.join(model_dir, "checkpoints"))
    assert any("epoch" in c for c in ckpts)


def test_run_cli_resume_latest(tiny_dataset, tmp_path):
    from keymorph_tpu.cli.run import main

    root, csv_path = tiny_dataset
    save_dir = str(tmp_path / "out_resume")
    base_args = [
        "--run_mode", "train", "--debug_mode",
        "--num_keypoints", "8", "--loss_fn", "mse", "--transform_type", "affine",
        "--data_path", csv_path, "--train_dataset", "csv",
        "--backbone", "unet", "--num_levels_for_unet", "2",
        "--img_size", "12", "12", "12",
        "--save_dir", save_dir, "--lr", "1e-4", "--log_interval", "1",
    ]
    main(base_args)
    # resume from latest must not crash and should pick up epoch numbering
    main(base_args + ["--resume_latest"])


def test_register_cli_pairwise(tiny_dataset, tmp_path):
    from keymorph_tpu.cli.register import main

    root, csv_path = tiny_dataset
    save_dir = str(tmp_path / "reg_out")
    metrics = main([
        "--moving", str(root / "img0.nii.gz"),
        "--fixed", str(root / "img1.nii.gz"),
        "--moving_seg", str(root / "seg0.nii.gz"),
        "--fixed_seg", str(root / "seg1.nii.gz"),
        "--list_of_aligns", "rigid", "affine", "tps_1",
        "--list_of_metrics", "mse", "harddice",
        "--save_dir", save_dir, "--size", "24",
        "--num_keypoints", "8", "--backbone", "unet", "--num_levels_for_unet", "2",
    ])
    key = "mse:fixed:moving:rot0:affine"
    assert key in metrics and len(metrics[key]) == 1
    # artifacts on disk
    sub = os.listdir(os.path.join(save_dir, "register"))[0]
    files = os.listdir(os.path.join(save_dir, "register", sub))
    assert any(f.startswith("grid_") for f in files)
    assert any(f.startswith("metrics-rot0-tps_1") for f in files)


def test_register_cli_groupwise(tiny_dataset, tmp_path):
    from keymorph_tpu.cli.register import main

    root, csv_path = tiny_dataset
    group_dir = tmp_path / "group_in"
    group_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        save_nifti(
            str(group_dir / f"sub{i}.nii.gz"),
            rng.uniform(0, 1, size=(12, 12, 12)).astype(np.float32),
        )
    save_dir = str(tmp_path / "group_out")
    metrics = main([
        "--moving", str(group_dir), "--groupwise",
        "--list_of_aligns", "affine", "--list_of_metrics", "mse",
        "--save_dir", save_dir, "--size", "24", "--group_size", "4",
        "--num_keypoints", "8", "--backbone", "unet", "--num_levels_for_unet", "2",
    ])
    key = "mse:group:rot0:affine:4"
    assert key in metrics and len(metrics[key]) == 1


def test_run_cli_train_visualize(tiny_dataset, tmp_path):
    """--visualize renders moving/fixed/aligned panels during training
    (reference train.py:223-291)."""
    from keymorph_tpu.cli.run import main

    root, csv_path = tiny_dataset
    save_dir = str(tmp_path / "out_viz")
    main([
        "--run_mode", "train", "--debug_mode", "--visualize",
        "--num_keypoints", "8", "--loss_fn", "dice", "--transform_type", "affine",
        "--data_path", csv_path, "--train_dataset", "csv",
        "--backbone", "unet", "--num_levels_for_unet", "2",
        "--img_size", "12", "12", "12",
        "--save_dir", save_dir, "--lr", "1e-4", "--log_interval", "1",
    ])
    img_dir = os.path.join(save_dir, "keymorph", "img")
    pngs = os.listdir(img_dir)
    assert any(p.startswith("img_epoch") for p in pngs), pngs
    assert any(p.startswith("seg_epoch") for p in pngs), pngs
