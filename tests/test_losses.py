"""Loss parity vs a torch re-implementation of the reference loss_utils."""

import numpy as np
import pytest

from gsdf_slam_tpu.ops import losses

torch = pytest.importorskip("torch")


def _torch_ssim(a, b, window_size=11):
    """Reference SSIM (include/loss_utils.h:49-124) in torch, CHW batched."""
    import torch.nn.functional as F

    sigma = 1.5
    xs = torch.arange(window_size).float() - window_size // 2
    g = torch.exp(-(xs**2) / (2 * sigma * sigma))
    g = g / g.sum()
    w2 = torch.outer(g, g)[None, None].expand(3, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(a, w2, padding=pad, groups=3)
    mu2 = F.conv2d(b, w2, padding=pad, groups=3)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(a * a, w2, padding=pad, groups=3) - mu1_sq
    s2 = F.conv2d(b * b, w2, padding=pad, groups=3) - mu2_sq
    s12 = F.conv2d(a * b, w2, padding=pad, groups=3) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean()


def test_ssim_matches_reference_formula():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (33, 47, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape).astype(np.float32), 0, 1)
    ours = float(losses.ssim(a, b))
    ta = torch.from_numpy(a.transpose(2, 0, 1))[None]
    tb = torch.from_numpy(b.transpose(2, 0, 1))[None]
    theirs = float(_torch_ssim(ta, tb))
    assert abs(ours - theirs) < 1e-5, (ours, theirs)


def test_l1_psnr():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    assert abs(float(losses.l1_loss(a, b)) - np.abs(a - b).mean()) < 1e-6
    mse = ((a - b) ** 2).mean()
    assert abs(float(losses.psnr(a, b)) - 10 * np.log10(1 / mse)) < 1e-4


def test_mapper_loss_mask_quirk():
    """Masked pixels go white in L1; SSIM compares against UNMASKED gt."""
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    mask = np.ones((32, 32), np.float32)
    mask[:8] = 0.0
    full = float(losses.mapper_loss(img, gt, mask, 0.2))
    # manual: L1 on white-filled, ssim(masked_img, gt)
    mi = np.where(mask[..., None] > 0, img, 1.0)
    mg = np.where(mask[..., None] > 0, gt, 1.0)
    l1 = np.abs(mi - mg).mean()
    expected = 0.8 * l1 + 0.2 * (1 - float(losses.ssim(mi, gt)))
    assert abs(full - expected) < 1e-6
