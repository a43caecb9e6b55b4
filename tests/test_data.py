"""Data layer tests: NIfTI IO (real files from the reference's example data),
preprocessing, datasets, and the native C++ fast path."""

import os

import numpy as np
import pytest

from keymorph_tpu.data.nifti import (
    load_nifti,
    save_nifti,
    to_canonical,
    NiftiImage,
)
from keymorph_tpu.data.preprocess import Preprocessor, resize_volume
from keymorph_tpu.data.datasets import (
    CSVDataset,
    IXIDataset,
    PairedDataset,
    Subject,
    DataLoader,
)
from keymorph_tpu.native import kmio

EXAMPLE_SEG = "/root/reference/example_data_half/seg_m/IXI_001_128x128x128.nii.gz"


def test_load_real_nifti():
    # (the half-res file is actually stored at 256^3 despite its name)
    img = load_nifti(EXAMPLE_SEG)
    assert img.shape == (256, 256, 256)
    assert img.affine.shape == (4, 4)
    labels = np.unique(img.data)
    assert len(labels) > 5  # a real segmentation
    assert np.isfinite(img.affine).all()


def test_nifti_roundtrip(tmp_path, rng):
    data = rng.normal(size=(9, 11, 13)).astype(np.float32)
    aff = np.eye(4, dtype=np.float64)
    aff[:3, 3] = [1, 2, 3]
    for name in ("a.nii", "a.nii.gz"):
        path = str(tmp_path / name)
        save_nifti(path, data, aff)
        back = load_nifti(path)
        np.testing.assert_allclose(back.data, data, atol=1e-6)
        np.testing.assert_allclose(back.affine, aff, atol=1e-5)


def test_nifti_int_roundtrip(tmp_path, rng):
    data = rng.integers(0, 100, size=(5, 6, 7)).astype(np.int16)
    path = str(tmp_path / "i.nii.gz")
    save_nifti(path, data)
    back = load_nifti(path, dtype=None)
    np.testing.assert_array_equal(back.data, data)


def test_to_canonical_flips():
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    aff = np.diag([-1.0, 1.0, 1.0, 1.0])  # L-A-S -> needs axis-0 flip
    img = NiftiImage(data=data, affine=aff)
    canon = to_canonical(img)
    np.testing.assert_allclose(canon.data, data[::-1])
    assert canon.affine[0, 0] > 0
    # world coordinates of any voxel must be preserved
    world_orig = aff @ np.array([0, 1, 2, 1.0])
    ijk_new = np.array([1, 1, 2, 1.0])  # flipped first axis: 0 -> 1
    world_new = canon.affine @ ijk_new
    np.testing.assert_allclose(world_orig, world_new)


def test_to_canonical_permutation():
    rng = np.random.default_rng(0)
    data = rng.normal(size=(3, 4, 5)).astype(np.float32)
    # axis order (j, k, i): world x comes from voxel axis 2, etc.
    perm_aff = np.zeros((4, 4))
    perm_aff[0, 2] = 1.0
    perm_aff[1, 0] = 1.0
    perm_aff[2, 1] = 1.0
    perm_aff[3, 3] = 1.0
    img = NiftiImage(data=data, affine=perm_aff)
    canon = to_canonical(img)
    assert canon.data.shape == (5, 3, 4)
    np.testing.assert_allclose(np.abs(np.diag(canon.affine))[:3], 1.0)


def test_resize_volume_upsample_matches_jax(rng):
    """Upsampling agrees with jax.image.resize (same center convention;
    downsampling intentionally differs — we sample at centers like TorchIO/
    ITK, jax antialiases)."""
    import jax
    import jax.numpy as jnp

    src = rng.normal(size=(8, 9, 10)).astype(np.float32)
    out = resize_volume(src, (16, 12, 20))
    ref = np.asarray(
        jax.image.resize(jnp.asarray(src), (16, 12, 20), method="trilinear")
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_resize_volume_downsample_matches_map_coordinates(rng):
    """Downsampling = linear interpolation at output voxel centers
    (the TorchIO/ITK convention the reference pipeline uses)."""
    from scipy.ndimage import map_coordinates

    src = rng.normal(size=(8, 9, 10)).astype(np.float32)
    target = (4, 5, 6)
    out = resize_volume(src, target)
    coords = np.meshgrid(
        *[(np.arange(t) + 0.5) * (s / t) - 0.5 for t, s in zip(target, src.shape)],
        indexing="ij",
    )
    ref = map_coordinates(src, np.stack(coords), order=1, mode="nearest")
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_native_kmio_available():
    assert kmio.available(), "libkmio.so should be built (make -C keymorph_tpu/native)"


def test_native_gunzip_matches_python():
    import gzip

    with gzip.open(EXAMPLE_SEG, "rb") as fh:
        expect = fh.read()
    got = kmio.gunzip_file(EXAMPLE_SEG)
    assert got == expect


def test_native_resize_matches_numpy(rng):
    src = rng.normal(size=(16, 16, 16)).astype(np.float32)
    ours = kmio.resize_trilinear(src, (8, 12, 20))
    ref = resize_volume(src, (8, 12, 20))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    near = kmio.resize_trilinear(src, (8, 8, 8), nearest=True)
    ref_n = resize_volume(src, (8, 8, 8), order="nearest")
    np.testing.assert_allclose(near, ref_n, atol=1e-6)


def test_preprocessor_pipeline():
    pre = Preprocessor(size=(32, 32, 32))
    out = pre.load(EXAMPLE_SEG)
    assert out["img"].shape == (1, 32, 32, 32)
    assert out["img"].min() >= 0 and out["img"].max() <= 1.0
    assert out["affine"].shape == (4, 4)
    # resized affine: voxel (0,0,0) center must map near the original
    # half-voxel-shifted origin
    orig = load_nifti(EXAMPLE_SEG)
    scale = np.asarray(orig.shape) / 32.0
    expect_spacing = np.linalg.norm(orig.affine[:3, 0]) * scale[0]
    got_spacing = np.linalg.norm(out["affine"][:3, 0])
    assert got_spacing == pytest.approx(expect_spacing, rel=1e-4)


def test_csv_dataset_modality_schema(tmp_path):
    csv_path = tmp_path / "data.csv"
    csv_path.write_text(
        "img_path,seg_path,mask_path,modality,train\n"
        f"{EXAMPLE_SEG},{EXAMPLE_SEG},None,T1,True\n"
        f"{EXAMPLE_SEG},None,None,T1,True\n"
        f"{EXAMPLE_SEG},None,None,T2,True\n"
        f"{EXAMPLE_SEG},None,None,T1,False\n"
    )
    ds = CSVDataset(str(csv_path))
    subs = ds.get_subjects(train=True)
    assert set(subs.keys()) == {"T1", "T2"}
    assert len(subs["T1"]) == 2 and len(subs["T2"]) == 1
    assert ds.seg_available
    test_subs = ds.get_subjects(train=False)
    assert len(test_subs["T1"]) == 1


def test_csv_dataset_pairs_schema(tmp_path):
    csv_path = tmp_path / "pairs.csv"
    csv_path.write_text(
        "fixed_img_path,fixed_seg_path,fixed_mask_path,"
        "moving_img_path,moving_seg_path,moving_mask_path,train\n"
        f"{EXAMPLE_SEG},None,None,{EXAMPLE_SEG},None,None,True\n"
    )
    ds = CSVDataset(str(csv_path))
    fixed, moving = ds.get_subjects(train=True)
    assert len(fixed) == 1 and len(moving) == 1
    assert fixed[0].modality == "fixed"


@pytest.mark.slow
def test_paired_loader_batching(tmp_path):
    subs = [Subject(img_path=EXAMPLE_SEG, modality="T1") for _ in range(3)]
    pre = Preprocessor(size=(16, 16, 16))
    loader = DataLoader(
        PairedDataset(list(zip(subs, subs)), pre), batch_size=2, shuffle=True
    )
    batches = list(loader)
    assert len(batches) == 2
    b1, b2 = batches[0]
    assert b1["img"].shape == (2, 1, 16, 16, 16)
    assert b2["img"].shape == (2, 1, 16, 16, 16)
    assert b1["affine"].shape == (2, 4, 4)


def test_ixi_dataset_layout(tmp_path):
    import gzip as _g

    root = tmp_path / "ixi"
    for mod in ("T1", "T2", "PD"):
        (root / mod).mkdir(parents=True)
        (root / f"{mod}_mask").mkdir()
        (root / f"{mod}_seg").mkdir()
    # two tiny subjects for T1
    from keymorph_tpu.data.nifti import save_nifti as _save

    for i in range(2):
        _save(str(root / "T1" / f"sub{i}.nii.gz"), np.zeros((4, 4, 4), np.float32))
        _save(str(root / "T1_mask" / f"sub{i}_mask.nii.gz"), np.ones((4, 4, 4), np.float32))
    ds = IXIDataset(str(root))
    ds.TRAIN_SLICE = (0, 1)
    ds.TEST_SLICE = (1, 2)
    subs = ds.get_subjects(train=True)
    assert len(subs["T1"]) == 1
    assert subs["T1"][0].mask_path is not None
    assert subs["T1"][0].seg_path is None
    assert len(ds.get_subjects(train=False)["T1"]) == 1


def test_thread_prefetcher_order_and_reuse():
    from keymorph_tpu.data.loader import ThreadPrefetcher

    loader = [1, 2, 3, 4]
    pf = ThreadPrefetcher(loader, depth=2)
    assert list(pf) == [1, 2, 3, 4]
    assert list(pf) == [1, 2, 3, 4]  # re-iterable
    assert len(pf) == 4


def test_thread_prefetcher_propagates_errors():
    from keymorph_tpu.data.loader import ThreadPrefetcher

    def gen():
        yield 1
        raise RuntimeError("boom")

    class L:
        def __iter__(self):
            return gen()

    pf = ThreadPrefetcher(L(), depth=1)
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_thread_prefetcher_early_break_releases_worker():
    """Breaking out of a prefetched loop must release the worker thread
    (it previously blocked forever on q.put, pinning decoded volumes)."""
    import threading
    import time
    from keymorph_tpu.data.loader import ThreadPrefetcher

    produced = []

    class L:
        def __iter__(self):
            for i in range(100):
                produced.append(i)
                yield i

    before = threading.active_count()
    for x in ThreadPrefetcher(L(), depth=2):
        if x == 3:
            break
    # the worker sees the stop event within its 0.1 s put timeout
    deadline = time.time() + 3.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker still alive"
    assert len(produced) < 100, "worker consumed the whole loader anyway"


def test_device_prefetch_mapping():
    from keymorph_tpu.data.loader import device_prefetch

    pf = device_prefetch([1, 2, 3], to_device=lambda x: x * 10, depth=1)
    assert list(pf) == [10, 20, 30]


def test_prefetcher_overlaps_io(rng):
    """Prefetch must overlap producer latency with consumer work.
    Compared against a measured serial baseline (not an absolute time) so a
    loaded single-core host doesn't flake the test."""
    import time
    from keymorph_tpu.data.loader import ThreadPrefetcher

    class SlowLoader:
        def __iter__(self):
            for i in range(4):
                time.sleep(0.05)  # IO
                yield i

    t0 = time.time()
    for _ in SlowLoader():
        time.sleep(0.05)  # compute, serial baseline
    serial = time.time() - t0

    t0 = time.time()
    for _ in ThreadPrefetcher(SlowLoader(), depth=2):
        time.sleep(0.05)  # compute
    overlapped = time.time() - t0
    # perfect overlap ~0.62*serial; require clear improvement
    assert overlapped < 0.9 * serial, f"no overlap: {overlapped:.2f}s vs serial {serial:.2f}s"
