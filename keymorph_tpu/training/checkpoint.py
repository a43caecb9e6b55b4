"""Checkpoint save/load via Orbax (the reference's torch.save dicts,
run.py:587-602/640-654 + script_utils.py:59-81, 129-154).

A checkpoint carries {params, opt_state, epoch, [ref_points]} — unlike the
reference, optimizer state and the variance-weighting parameters are saved
too (the reference silently drops both; SURVEY §5 'latent gap').
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"epoch(\d+)")


def save_checkpoint(directory: str, epoch: int, state, ref_points=None, keep: int = 100):
    """Write `{directory}/epoch{N}_model/` with params + opt state."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, f"epoch{epoch}_model"))
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    if ref_points is not None:
        payload["ref_points"] = np.asarray(ref_points)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_epoch_checkpoint(directory: str) -> Optional[str]:
    """Newest epoch{N}_model in a directory by N
    (reference script_utils.py:129-154)."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        m = _EPOCH_RE.search(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, name)
    return best


def load_checkpoint(path: str, state_template=None):
    """Load a checkpoint. With a template (a TrainState of matching
    structure), arrays restore to matching dtypes/shardings; otherwise raw
    numpy is returned. Returns the payload dict.

    The on-disk key set is read from checkpoint metadata (a pretrain
    checkpoint carries `ref_points`, a train one doesn't) so the restore
    template always matches; a genuinely corrupt or structurally
    incompatible checkpoint raises instead of being silently degraded."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if state_template is not None:
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "step": np.asarray(state_template.step),
            "epoch": np.asarray(0),
        }
        on_disk = ckptr.metadata(path).item_metadata.tree
        if "ref_points" in on_disk:
            meta = on_disk["ref_points"]
            # restore to the on-disk dtype (a bare np.zeros(shape) template
            # would silently promote fp32 checkpoints to float64)
            template["ref_points"] = np.zeros(
                meta.shape, dtype=getattr(meta, "dtype", np.float32) or np.float32
            )
        return ckptr.restore(path, template)
    return ckptr.restore(path)
