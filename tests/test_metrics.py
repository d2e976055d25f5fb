"""Quality-metric tests: PSNR closed-form values, SSIM vs an independent
torch restatement of the published formula (Wang et al. 2004) plus the
identities every SSIM must satisfy."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hivae_tpu.utils import metrics as M


class TestPSNR:
    def test_identical_is_large(self):
        x = jnp.linspace(-1, 1, 3 * 8 * 8).reshape(1, 3, 8, 8)
        assert float(M.psnr(x, x)) > 100.0

    def test_known_value(self):
        """Uniform error e on range-2 data: PSNR = 10 log10(4 / e^2)."""
        x = jnp.zeros((1, 3, 8, 8))
        y = x + 0.1
        expect = 10 * np.log10(4.0 / 0.01)
        assert abs(float(M.psnr(x, y)) - expect) < 1e-4

    def test_data_range(self):
        x = jnp.zeros((1, 3, 8, 8))
        y = x + 0.1
        assert abs(float(M.psnr(x, y, data_range=1.0)) -
                   10 * np.log10(1.0 / 0.01)) < 1e-4


def torch_ssim(x, y, data_range=2.0, window=11, sigma=1.5):
    """Independent torch restatement of Gaussian-windowed SSIM."""
    x = torch.as_tensor(np.asarray(x), dtype=torch.float64)
    y = torch.as_tensor(np.asarray(y), dtype=torch.float64)
    x = x.reshape(-1, 1, *x.shape[-2:])
    y = y.reshape(-1, 1, *y.shape[-2:])
    coords = torch.arange(window, dtype=torch.float64) - window // 2
    g = torch.exp(-coords ** 2 / (2 * sigma ** 2))
    g = g / g.sum()
    k = (g[:, None] @ g[None, :])[None, None]
    blur = lambda v: F.conv2d(v, k)
    mu_x, mu_y = blur(x), blur(y)
    sxx, syy = blur(x * x) - mu_x ** 2, blur(y * y) - mu_y ** 2
    sxy = blur(x * y) - mu_x * mu_y
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    s = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2) /
         ((mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2)))
    return float(s.mean())


class TestSSIM:
    def test_identical_is_one(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 32, 32)))
        assert abs(float(M.ssim(x, x)) - 1.0) < 1e-6

    def test_matches_torch_golden(self):
        rng = np.random.RandomState(1)
        x = rng.uniform(-1, 1, (1, 4, 3, 32, 32)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)
        ours = float(M.ssim(jnp.asarray(x), jnp.asarray(y)))
        gold = torch_ssim(x, y)
        assert abs(ours - gold) < 1e-5

    def test_degrades_with_noise(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)))
        small = float(M.ssim(x, jnp.clip(x + 0.05, -1, 1)))
        large = float(M.ssim(
            x, jnp.clip(x + jnp.asarray(rng.normal(0, 0.5, x.shape)), -1, 1)))
        assert 1.0 > small > large

    def test_video_and_frame_batches_agree(self):
        """(N,F,C,H,W) input must equal the mean over flattened frames."""
        rng = np.random.RandomState(3)
        x = rng.uniform(-1, 1, (1, 2, 3, 24, 24)).astype(np.float32)
        y = rng.uniform(-1, 1, (1, 2, 3, 24, 24)).astype(np.float32)
        v = float(M.ssim(jnp.asarray(x), jnp.asarray(y)))
        f = float(M.ssim(jnp.asarray(x.reshape(-1, 3, 24, 24)),
                         jnp.asarray(y.reshape(-1, 3, 24, 24))))
        assert abs(v - f) < 1e-6
