"""Script helpers (reference scripts/script_utils.py)."""

from __future__ import annotations

import json
import math
import os


# canonical helpers live in keymorph_tpu.utils; re-exported here for the
# reference-parity import surface
from keymorph_tpu.utils import aggregate_dicts, parse_test_mod  # noqa: F401


def parse_test_aug(aug):
    """'rot90' -> fixed augmentation params (script_utils.py:23-39)."""
    rots = {
        "rot0": 0.0,
        "rot45": math.pi / 4,
        "rot90": math.pi / 2,
        "rot135": 3 * math.pi / 4,
        "rot180": math.pi,
    }
    if aug in rots:
        return (0.0, 0.0, rots[aug], 0.0)
    raise NotImplementedError(f"Unknown aug {aug}")


def save_dict_as_json(d, path):
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(d, fh, indent=2, default=float)


def load_dict_from_json(path):
    with open(path) as fh:
        return json.load(fh)


def summary(model):
    """Print parameter counts (script_utils.py:103-115)."""
    import jax
    import numpy as np

    params = getattr(model, "params", model)
    leaves = jax.tree.leaves(params)
    total = sum(int(np.prod(x.shape)) for x in leaves)
    print("Model summary:")
    print(f"  parameter arrays: {len(leaves)}")
    print(f"  trainable parameters: {total:,}")
    return total


def initialize_wandb(config):
    """Optional Weights & Biases init (script_utils.py:50-56); silently
    disabled when wandb isn't installed (this image has no wandb)."""
    try:
        import wandb
    except ImportError:
        print("wandb not available; logging to stdout only")
        return None
    if config.wandb_api_key_path:
        with open(config.wandb_api_key_path) as fh:
            os.environ["WANDB_API_KEY"] = fh.read().strip()
    wandb.init(
        name=config.job_name, config=config.__dict__, **(config.wandb_kwargs or {})
    )
    return wandb
