"""Data-prep tool tests (notebook-equivalent scripts)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from keymorph_tpu.data.nifti import load_nifti, save_nifti


@pytest.fixture()
def raw_dir(tmp_path, rng):
    d = tmp_path / "raw"
    d.mkdir()
    for i in range(2):
        vol = rng.uniform(0, 0.1, size=(20, 22, 24)).astype(np.float32)
        c = (5 + 4 * i, 8, 12)
        vol[c[0] - 2 : c[0] + 2, c[1] - 2 : c[1] + 2, c[2] - 2 : c[2] + 2] = 1.0
        save_nifti(str(d / f"sub{i}.nii.gz"), vol)
    return d


def test_prepare_ixi_resample(raw_dir, tmp_path):
    from keymorph_tpu.tools.prepare_ixi import main

    main(["--out_dir", str(tmp_path / "ixi"), "--raw_dir", str(raw_dir),
          "--modalities", "T1", "--size", "16"])
    out = load_nifti(str(tmp_path / "ixi" / "T1" / "sub0.nii.gz"))
    assert out.shape == (16, 16, 16)
    # spacing updated: 20/16 = 1.25 along the first axis
    assert np.linalg.norm(out.affine[:3, 0]) == pytest.approx(1.25, rel=1e-3)


def test_extract_brains_smoke(raw_dir, tmp_path):
    from keymorph_tpu.tools.extract_brains import main

    main(["--img_dir", str(raw_dir), "--out_dir", str(tmp_path / "masks"),
          "--size", "16"])
    mask = load_nifti(str(tmp_path / "masks" / "sub0_mask.nii.gz"))
    assert mask.shape == (20, 22, 24)  # restored to original resolution
    assert set(np.unique(mask.data)).issubset({0.0, 1.0})


def test_center_volumes(raw_dir, tmp_path):
    from keymorph_tpu.tools.center_volumes import intensity_centroid_voxel, main

    main(["--img_dir", str(raw_dir), "--reference", str(raw_dir / "sub1.nii.gz"),
          "--out_dir", str(tmp_path / "centered")])
    ref = load_nifti(str(raw_dir / "sub1.nii.gz")).data
    before = load_nifti(str(raw_dir / "sub0.nii.gz")).data
    after = load_nifti(str(tmp_path / "centered" / "sub0.nii.gz")).data
    d_before = np.linalg.norm(
        intensity_centroid_voxel(before) - intensity_centroid_voxel(ref)
    )
    d_after = np.linalg.norm(
        intensity_centroid_voxel(after) - intensity_centroid_voxel(ref)
    )
    assert d_after < d_before


def test_trace_summary_parses(tmp_path):
    """trace_summary handles a minimal Chrome trace."""
    import gzip
    import json

    from keymorph_tpu.tools.trace_summary import find_trace_file, summarize_trace

    trace = {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 5000},
            {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 3000},
            {"ph": "X", "pid": 2, "name": "host_thing", "dur": 99999},
        ]
    }
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    path = d / "host.trace.json.gz"
    with gzip.open(path, "wt") as fh:
        json.dump(trace, fh)
    assert find_trace_file(str(tmp_path)) == str(path)
    rows = summarize_trace(str(path))
    assert rows[0] == ("fusion.1", 8.0, 2)
