"""Evaluation-sweep constants (reference scripts/hyperparameters.py:13-52).

The preprocessing pipeline itself lives in keymorph_tpu.data.Preprocessor
(ToCanonical -> Mask -> Resize(128) -> rescale, hyperparameters.py:4-11).
"""

EVAL_METRICS = [
    "mse",
    "softdice",
    "harddice",
    "hausd",
    "jdstd",
    "jdlessthan0",
]

EVAL_UNI_NAMES = [
    ("T1", "T1"),
    ("T2", "T2"),
    ("PD", "PD"),
]

EVAL_MULTI_NAMES = [
    ("T1", "T2"),
    ("T1", "PD"),
    ("T2", "PD"),
]

EVAL_AUGS = [
    "rot0",
    "rot45",
    "rot90",
    "rot135",
    "rot180",
]

EVAL_KP_ALIGNS = [
    "rigid",
    "affine",
    "tps_10",
    "tps_1",
    "tps_0.1",
    "tps_0.01",
    "tps_0",
]
