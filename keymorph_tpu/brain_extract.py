"""Brain extraction: SimpleUnet inference + connected-component mask cleanup.

Reference: Simple_Unet + clean_mask (keymorph/model.py:533-659, used by
notebook [B]). Connected components via scipy.ndimage.label (skimage is not
in this image); the largest component is kept along with any component whose
size exceeds `threshold` x the largest.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage


def clean_mask(mask: np.ndarray, threshold: float = 0.2) -> np.ndarray:
    """Drop small islands from a binary mask (reference model.py:622-659)."""
    mask = np.asarray(mask)
    labeled, num = scipy.ndimage.label(mask > 0)
    if num == 0:
        return np.zeros_like(mask, dtype=np.uint8)
    sizes = scipy.ndimage.sum_labels(np.ones_like(labeled), labeled, range(1, num + 1))
    max_size = sizes.max()
    keep = {i + 1 for i, s in enumerate(sizes) if s / max_size > threshold}
    return np.isin(labeled, list(keep)).astype(np.uint8)


def extract_brain(params, img, apply_fn=None, threshold: float = 0.5,
                  clean_threshold: float = 0.2):
    """Run the SimpleUnet brain extractor and clean the predicted mask.

    Args:
        params: SimpleUnet Flax params.
        img: (B, 1, D, H, W) channel-first volume.
        apply_fn: optional custom apply; defaults to SimpleUnet defaults
            (enc (4,8,16,32), dec (32,16,8,4); reference notebook [B] config).
    Returns:
        (B, 1, D, H, W) uint8 cleaned masks.
    """
    import jax
    import jax.numpy as jnp

    from keymorph_tpu.models import SimpleUnet

    if apply_fn is None:
        model = SimpleUnet(out_channels=1)
        apply_fn = jax.jit(model.apply)
    x = jnp.moveaxis(jnp.asarray(img, jnp.float32), 1, -1)
    logits = apply_fn(params, x)
    prob = jax.nn.sigmoid(logits)[..., 0]
    masks = np.asarray(prob > threshold)
    out = np.stack([clean_mask(m, clean_threshold) for m in masks])
    return out[:, None]
