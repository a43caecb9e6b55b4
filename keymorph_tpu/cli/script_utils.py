"""Script helpers (reference scripts/script_utils.py)."""

from __future__ import annotations

import json
import math
import os
from collections import defaultdict


def parse_test_mod(mod):
    if isinstance(mod, str):
        mod1, mod2 = mod.split("_")
    else:
        mod1, mod2 = mod
    return mod1, mod2


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


def aggregate_dicts(dicts):
    """Mean over a list of dicts (script_utils.py:42-47)."""
    result = defaultdict(list)
    for d in dicts:
        for k, v in d.items():
            result[k].append(float(v))
    return {k: sum(v) / len(v) for k, v in result.items()}


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
