"""IXI data preparation (the reference's notebook [A] as a script).

Downloads the IXI T1/T2/PD archives (when the environment has network
access) and resamples every volume to 1mm/256^3 (or a chosen size) into the
{root}/{T1,T2,PD} layout IXIDataset expects.

Offline use: point --raw_dir at already-downloaded NIfTI files and only the
resample step runs.

Usage:
    python -m keymorph_tpu.tools.prepare_ixi --out_dir ./ixi [--raw_dir ...]
"""

from __future__ import annotations

import argparse
import os
import tarfile
import urllib.request

import numpy as np

IXI_URLS = {
    "T1": "https://biomedic.doc.ic.ac.uk/brain-development/downloads/IXI/IXI-T1.tar",
    "T2": "https://biomedic.doc.ic.ac.uk/brain-development/downloads/IXI/IXI-T2.tar",
    "PD": "https://biomedic.doc.ic.ac.uk/brain-development/downloads/IXI/IXI-PD.tar",
}


def download(modality: str, dest_dir: str):
    os.makedirs(dest_dir, exist_ok=True)
    url = IXI_URLS[modality]
    tar_path = os.path.join(dest_dir, f"IXI-{modality}.tar")
    if not os.path.exists(tar_path):
        print(f"Downloading {url} ...")
        urllib.request.urlretrieve(url, tar_path)
    with tarfile.open(tar_path) as tf:
        tf.extractall(dest_dir)
    return dest_dir


def resample_dir(raw_dir: str, out_dir: str, size: int = 256):
    """Canonicalize + resize every NIfTI in raw_dir into out_dir."""
    from keymorph_tpu.data.nifti import load_nifti, save_nifti, to_canonical
    from keymorph_tpu.data.preprocess import resize_volume

    os.makedirs(out_dir, exist_ok=True)
    names = sorted(
        f for f in os.listdir(raw_dir) if f.endswith((".nii", ".nii.gz"))
    )
    for name in names:
        img = to_canonical(load_nifti(os.path.join(raw_dir, name)))
        data = img.data
        if data.ndim == 4:
            data = data[..., 0]
        scale = np.asarray(data.shape, np.float64) / size
        out = resize_volume(data.astype(np.float32), (size,) * 3)
        aff = img.affine.copy()
        R_old = aff[:3, :3].copy()
        aff[:3, :3] = R_old * scale[None, :]
        aff[:3, 3] = aff[:3, 3] + R_old @ (0.5 * (scale - 1.0))
        save_nifti(os.path.join(out_dir, name), out, aff)
        print(f"resampled {name} -> {out.shape}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", required=True)
    p.add_argument("--raw_dir", default=None,
                   help="Already-downloaded NIfTI dir (skips download)")
    p.add_argument("--modalities", nargs="*", default=["T1", "T2", "PD"])
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)

    for mod in args.modalities:
        raw = args.raw_dir or download(mod, os.path.join(args.out_dir, f"raw_{mod}"))
        resample_dir(raw, os.path.join(args.out_dir, mod), args.size)


if __name__ == "__main__":
    main()
