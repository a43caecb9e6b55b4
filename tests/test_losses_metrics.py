"""Loss/metric parity tests (torch + scipy/numpy oracles)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from keymorph_tpu.losses import mse_loss, soft_dice_loss, DiceLoss, MSELoss
from keymorph_tpu import metrics
from keymorph_tpu import utils as km_utils


def _torch_dice(pred, target, hard=False, return_regions=False, ign_first_ch=False):
    """Oracle: the reference DiceLoss math, written against torch directly."""
    eps = 1
    pred = torch.from_numpy(pred)
    target = torch.from_numpy(target)
    n, c = target.shape[:2]
    target = target.reshape(n, c, -1)
    pred = pred.reshape(n, c, -1)
    if hard:
        onehot = torch.zeros_like(pred)
        am = torch.argmax(pred, dim=1, keepdim=True)
        pred = torch.scatter(onehot, 1, am, 1.0)
    if ign_first_ch:
        target = target[:, 1:]
        pred = pred[:, 1:]
    num = torch.sum(2 * target * pred, 2) + eps
    den = (pred * pred).sum(2) + (target * target).sum(2) + eps
    dl = 1 - num / den
    return (dl.mean(0) if return_regions else dl.mean()).numpy()


def test_mse(rng):
    a = rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)
    b = rng.normal(size=(2, 1, 8, 8, 8)).astype(np.float32)
    ours = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch.nn.functional.mse_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert ours == pytest.approx(ref, rel=1e-5)


@pytest.mark.parametrize("hard", [False, True])
@pytest.mark.parametrize("ign_first_ch", [False, True])
def test_dice_parity(rng, hard, ign_first_ch):
    pred = rng.uniform(0, 1, size=(2, 4, 6, 6, 6)).astype(np.float32)
    labels = rng.integers(0, 4, size=(2, 6, 6, 6))
    target = np.eye(4, dtype=np.float32)[labels].transpose(0, 4, 1, 2, 3)
    ours = float(DiceLoss(hard=hard)(jnp.asarray(pred), jnp.asarray(target), ign_first_ch=ign_first_ch))
    ref = float(_torch_dice(pred, target, hard=hard, ign_first_ch=ign_first_ch))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_dice_regions(rng):
    pred = rng.uniform(0, 1, size=(2, 4, 5, 5, 5)).astype(np.float32)
    target = (rng.uniform(0, 1, size=(2, 4, 5, 5, 5)) > 0.5).astype(np.float32)
    ours = np.asarray(DiceLoss(hard=True, return_regions=True)(jnp.asarray(pred), jnp.asarray(target)))
    ref = _torch_dice(pred, target, hard=True, return_regions=True)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_jacobian_determinant_parity(rng):
    """jax jacobian-determinant vs a scipy.ndimage.correlate oracle
    (the reference's implementation, loss_ops.py:161-233)."""
    import scipy.ndimage

    disp = rng.normal(size=(1, 3, 10, 10, 10)).astype(np.float32)

    gradz = np.array([-0.5, 0, 0.5]).reshape(1, 3, 1, 1)
    grady = np.array([-0.5, 0, 0.5]).reshape(1, 1, 3, 1)
    gradx = np.array([-0.5, 0, 0.5]).reshape(1, 1, 1, 3)
    stacks = []
    for k in (gradz, grady, gradx):
        stacks.append(
            np.stack(
                [
                    scipy.ndimage.correlate(disp[:, c], k, mode="constant", cval=0.0)
                    for c in range(3)
                ],
                axis=1,
            )
        )
    grad_disp = np.concatenate(stacks, 0)
    jac = grad_disp + np.eye(3).reshape(3, 3, 1, 1, 1)
    jac = jac[:, :, 2:-2, 2:-2, 2:-2]
    det_ref = (
        jac[0, 0] * (jac[1, 1] * jac[2, 2] - jac[1, 2] * jac[2, 1])
        - jac[1, 0] * (jac[0, 1] * jac[2, 2] - jac[0, 2] * jac[2, 1])
        + jac[2, 0] * (jac[0, 1] * jac[1, 2] - jac[0, 2] * jac[1, 1])
    )
    ours = np.asarray(metrics.jacobian_determinant(jnp.asarray(disp)))[0]
    np.testing.assert_allclose(ours, det_ref, atol=1e-5)


def test_jdstd_jdlessthan0_identity_grid():
    """Zero displacement -> det == 1 everywhere, jdstd == 0, none <= 0."""
    disp = np.zeros((1, 3, 8, 8, 8), np.float32)
    assert metrics.jdstd(disp) == pytest.approx(0.0, abs=1e-6)
    assert metrics.jdlessthan0(disp) == 0


def test_hausdorff_symmetric_shapes():
    a = np.zeros((1, 1, 12, 12, 12))
    b = np.zeros((1, 1, 12, 12, 12))
    a[0, 0, 3:9, 3:9, 3:9] = 1
    b[0, 0, 4:10, 4:10, 4:10] = 1
    hd = metrics.hausdorff_distance(a, b, sampling=(1, 1, 1))
    assert 0 < hd <= 4


def test_surface_distances_kdtree_matches_edt(rng):
    """The KD-tree nearest-surface path returns exactly the EDT recipe's
    distance samples (reference loss_ops.py:121-139) on irregular masks."""
    z, y, x = np.mgrid[:40, :40, :40]
    m1 = ((z - 18) ** 2 + (y - 20) ** 2 + (x - 22) ** 2) < 12**2
    m2 = ((z - 21) ** 2 + 2 * (y - 18) ** 2 + (x - 19) ** 2) < 10**2
    m1 |= rng.random((40, 40, 40)) > 0.995  # speckle: many tiny components
    d_kd = metrics._surface_distances(m1, m2, [1.25, 1.25, 10], 1)
    old = metrics._HAUSD_KDTREE_MAX_SURFACE
    try:
        metrics._HAUSD_KDTREE_MAX_SURFACE = 0  # force the EDT fallback
        d_edt = metrics._surface_distances(m1, m2, [1.25, 1.25, 10], 1)
    finally:
        metrics._HAUSD_KDTREE_MAX_SURFACE = old
    np.testing.assert_allclose(np.sort(d_kd), np.sort(d_edt), atol=1e-9)


def test_fast_dice_perfect_match(rng):
    labels = rng.integers(0, 5, size=(1, 6, 6, 6))
    onehot = np.eye(5, dtype=np.float32)[labels].transpose(0, 4, 1, 2, 3)
    assert metrics.fast_dice(onehot, onehot) == pytest.approx(1.0)


def test_one_hot_roundtrip(rng):
    labels = rng.integers(0, 7, size=(2, 1, 5, 5, 5))
    oh = np.asarray(km_utils.one_hot(labels, num_classes=7))
    assert oh.shape == (2, 7, 5, 5, 5)
    np.testing.assert_array_equal(oh.argmax(1), labels[:, 0])
    np.testing.assert_allclose(oh.sum(1), 1.0)


def test_one_hot_subsampled_pair(rng):
    s1 = rng.integers(0, 30, size=(1, 1, 6, 6, 6))
    s2 = rng.integers(0, 30, size=(1, 1, 6, 6, 6))
    o1, o2 = km_utils.one_hot_subsampled_pair(s1, s2, subsample_num=5)
    assert o1.shape[1] == 5 and o2.shape[1] == 5
    assert np.asarray(o1).max() <= 1


def test_one_hot_synthseg():
    asegs = np.zeros((1, 1, 4, 4, 4))
    asegs[0, 0, 0] = 13  # pallidum
    asegs[0, 0, 1] = 52  # pallidum (right)
    oh = np.asarray(km_utils.one_hot_eval_synthseg(asegs))
    assert oh.shape == (1, 14, 4, 4, 4)
    np.testing.assert_allclose(oh.sum(1), 1.0)
    assert oh[0, 1, 0].sum() == 16 and oh[0, 1, 1].sum() == 16


def test_rescale_intensity(rng):
    x = rng.normal(size=(4, 4, 4)).astype(np.float32) * 100
    out = np.asarray(km_utils.rescale_intensity(x))
    assert out.min() == pytest.approx(0, abs=1e-5)
    assert out.max() == pytest.approx(1, abs=1e-5)


def test_lc2_identical_images_high(rng):
    """LC2 of an image with itself should be ~1 (perfect local correlation)."""
    img = rng.normal(size=(1, 1, 17, 17, 17)).astype(np.float32)
    score = np.asarray(metrics.LC2(radiuses=(3,))(jnp.asarray(img), jnp.asarray(img)))
    assert score.shape == (1,)
    assert score[0] > 0.95


def test_lc2_parity_with_torch(rng):
    """LC2 vs a direct torch port of the reference math."""
    us = rng.normal(size=(1, 1, 15, 15, 15)).astype(np.float32)
    mr = rng.normal(size=(1, 1, 15, 15, 15)).astype(np.float32)
    ours = float(np.asarray(metrics.LC2(radiuses=(5,))(jnp.asarray(us), jnp.asarray(mr)))[0])

    f = torch.zeros(3, 1, 3, 3, 3)
    f[0, 0, 1, 1, 0] = 1; f[0, 0, 1, 1, 2] = -1
    f[1, 0, 1, 0, 1] = 1; f[1, 0, 1, 2, 1] = -1
    f[2, 0, 0, 1, 1] = 1; f[2, 0, 2, 1, 1] = -1
    tus, tmr = torch.from_numpy(us).squeeze(1), torch.from_numpy(mr).squeeze(1)
    radius, alpha, beta = 5, 1e-3, 1e-2
    bs = 1
    pad = (tmr.size(1) - (2 * radius + 1)) // 2
    count = (2 * radius + 1) ** 3
    grad = torch.norm(torch.nn.functional.conv3d(tmr.unsqueeze(1), f, padding=1), dim=1)
    A = torch.ones(bs, 3, count)
    A[:, 0] = tmr[:, pad:-pad, pad:-pad, pad:-pad].reshape(bs, -1)
    A[:, 1] = grad[:, pad:-pad, pad:-pad, pad:-pad].reshape(bs, -1)
    b = tus[:, pad:-pad, pad:-pad, pad:-pad].reshape(bs, -1)
    C = torch.einsum("bip,bjp->bij", A, A) / count + torch.eye(3).unsqueeze(0) * alpha
    Atb = torch.einsum("bip,bp->bi", A, b) / count
    coeff = torch.linalg.solve(C, Atb)
    var = torch.mean(b**2, dim=1) - torch.mean(b, dim=1) ** 2
    dist = (
        torch.mean(b**2, dim=1)
        + torch.einsum("bi,bj,bij->b", coeff, coeff, C)
        - 2 * torch.einsum("bi,bi->b", coeff, Atb)
    )
    ref = float(((var - dist) / var.clamp_min(beta)).clamp(0, 1)[0])
    assert ours == pytest.approx(ref, abs=1e-3)


def test_pairwise_aggregate(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, size=(3, 2, 5, 5, 5)).astype(np.float32))
    agg = metrics.MultipleAvgSegPairwiseMetric()
    out = agg(imgs, ["softdice"])
    # mean of the 3 pairwise soft dices
    d = DiceLoss()
    expect = (
        float(d(imgs[0:1], imgs[1:2])) + float(d(imgs[0:1], imgs[2:3])) + float(d(imgs[1:2], imgs[2:3]))
    ) / 3
    assert float(out["softdice"]) == pytest.approx(expect, rel=1e-5)
