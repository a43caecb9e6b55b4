"""Generate a synthetic blob-brain dataset (NIfTI + CSV) for training runs.

The reference's example intensity volumes are stripped from this snapshot
(/root/reference/.MISSING_LARGE_BLOBS) and IXI is not downloadable (zero
egress), so sustained training runs use the same deformed-blob phantoms as
the weight-parity harness (tools/weight_parity.py::make_subjects): a shared
gaussian-blob template, per-subject affine + jitter, 4-label segmentations.

Run: python -m keymorph_tpu.tools.make_synthetic_dataset --out DIR \
        --n 10 --size 128 [--modalities T1 T2]

Writes DIR/img{i}_{mod}.nii.gz, DIR/seg{i}_{mod}.nii.gz and DIR/data.csv in
the CSVDataset modality schema (img_path,seg_path,mask_path,modality,train);
the last two subjects per modality are test rows. Non-first modalities apply
distinct monotone intensity remaps to the same anatomy — multimodal pairs
share geometry, like IXI T1/T2/PD (each modality gets its OWN remap so e.g.
a T2:PD pair is genuinely cross-modality).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=10, help="subjects per modality")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--n_test", type=int, default=2)
    p.add_argument("--modalities", nargs="+", default=["T1"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np

    from keymorph_tpu.data.nifti import save_nifti
    from keymorph_tpu.tools.weight_parity import make_subjects

    os.makedirs(args.out, exist_ok=True)
    imgs, segs = make_subjects(
        n_subjects=args.n, size=args.size, seed=args.seed
    )
    # distinct monotone remaps per modality slot (identity for the first)
    remaps = [
        lambda x: x,
        lambda x: (1.0 - x) ** 2,
        lambda x: np.sqrt(np.clip(x, 0.0, 1.0)) * (1.0 - 0.5 * x),
        lambda x: np.sin(x * np.pi / 2.0) ** 2,
    ]
    rows = []
    for i in range(args.n):
        train = i < args.n - args.n_test
        for j, mod in enumerate(args.modalities):
            img = remaps[j % len(remaps)](imgs[i, 0])
            img_path = os.path.join(args.out, f"img{i}_{mod}.nii.gz")
            seg_path = os.path.join(args.out, f"seg{i}_{mod}.nii.gz")
            save_nifti(img_path, img.astype(np.float32))
            save_nifti(seg_path, segs[i, 0].astype(np.int16))
            rows.append(f"{img_path},{seg_path},None,{mod},{train}")
    csv_path = os.path.join(args.out, "data.csv")
    with open(csv_path, "w") as fh:
        fh.write("img_path,seg_path,mask_path,modality,train\n")
        fh.write("\n".join(rows) + "\n")
    print(f"wrote {len(rows)} rows to {csv_path}")
    return csv_path


if __name__ == "__main__":
    main()
