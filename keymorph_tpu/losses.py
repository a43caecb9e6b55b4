"""Training losses (jit/grad-safe). Parity: reference keymorph/loss_ops.py:9-63."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(pred, target):
    """Mean squared error (reference loss_ops.py:9-13)."""
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def soft_dice_loss(pred, target, ign_first_ch: bool = False, eps: float = 1.0):
    """Soft Dice loss (lower is better), scalar over the whole batch.

    Args:
        pred, target: (B, C, *spatial) channel-first probabilities/one-hot.
        ign_first_ch: drop channel 0 (background) from the average.
    Parity: reference DiceLoss (loss_ops.py:16-63) with eps=1 smoothing.
    """
    return _dice(pred, target, hard=False, ign_first_ch=ign_first_ch, eps=eps)[0]


def hard_dice_loss(
    pred, target, ign_first_ch: bool = False, return_regions: bool = False, eps: float = 1.0
):
    """Hard Dice: argmax the prediction into one-hot first.

    Returns the scalar average, or per-region averages (C,) when
    `return_regions` (reference DiceLoss(hard=True, return_regions=...)).
    """
    total, regions = _dice(pred, target, hard=True, ign_first_ch=ign_first_ch, eps=eps)
    return regions if return_regions else total


def _dice(pred, target, hard, ign_first_ch, eps):
    assert pred.shape == target.shape, "Input and target are different dim"
    B, C = pred.shape[:2]
    pred = pred.reshape(B, C, -1).astype(jnp.float32)
    target = target.reshape(B, C, -1).astype(jnp.float32)

    if hard:
        am = jnp.argmax(pred, axis=1)
        pred = jnp.moveaxis(jax.nn.one_hot(am, C, dtype=jnp.float32), -1, 1)
    if ign_first_ch:
        pred = pred[:, 1:]
        target = target[:, 1:]

    num = 2.0 * jnp.sum(pred * target, axis=2) + eps
    den = jnp.sum(pred * pred, axis=2) + jnp.sum(target * target, axis=2) + eps
    dice_loss = 1.0 - num / den  # (B, C')
    return jnp.mean(dice_loss), jnp.mean(dice_loss, axis=0)


class MSELoss:
    """Object-style wrapper for API parity with the reference."""

    def __call__(self, pred, target):
        return mse_loss(pred, target)

    forward = __call__


class DiceLoss:
    """Object-style wrapper (reference loss_ops.py:16-63)."""

    def __init__(self, hard: bool = False, return_regions: bool = False):
        self.hard = hard
        self.return_regions = return_regions

    def __call__(self, pred, target, ign_first_ch: bool = False):
        if self.hard:
            return hard_dice_loss(
                pred, target, ign_first_ch=ign_first_ch, return_regions=self.return_regions
            )
        total, regions = _dice(pred, target, hard=False, ign_first_ch=ign_first_ch, eps=1.0)
        return regions if self.return_regions else total

    forward = __call__
