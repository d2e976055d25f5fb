"""Unit tests for the pure-numerics layer, including torch golden checks.

The golden tests re-state the reference formulas (rectified_flow.py,
frequency_utils.py, wavelet.py, regularizers.py) in torch inside the test and
compare — validating our XLA implementations against the reference's
semantics without importing reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from hivae_tpu.ops import rectified_flow as rf
from hivae_tpu.ops import frequency, wavelet, regularizers, embeddings


class TestRectifiedFlow:
    def test_timestep_to_time(self):
        steps = jnp.array([0, 250, 500, 1000])
        t = rf.timestep_to_time(steps, 1000, ndim=4)
        assert t.shape == (4, 1, 1, 1)
        np.testing.assert_allclose(np.ravel(t), [1.0, 0.75, 0.5, 0.0])

    def test_train_tuple_interpolation(self):
        key = jax.random.PRNGKey(0)
        z1 = jax.random.normal(key, (2, 4, 8, 8))
        z0 = jnp.zeros_like(z1)
        ts = jnp.array([0, 1000])
        zt, target = rf.get_train_tuple(z1, ts, z0)
        # t=1 at step 0 -> zt == z1 ; t=0 at step 1000 -> zt == z0
        np.testing.assert_allclose(zt[0], z1[0], rtol=1e-6)
        np.testing.assert_allclose(zt[1], z0[1], atol=1e-6)
        np.testing.assert_allclose(target, z1 - z0, rtol=1e-6)

    def test_target_recovery_identity(self):
        """z1 == zt + (1-t) * (z1 - z0) must hold for all t."""
        key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        z1 = jax.random.normal(k1, (3, 4, 8, 8))
        z0 = jax.random.normal(k2, (3, 4, 8, 8))
        ts = jnp.array([100, 500, 900])
        zt, vel = rf.get_train_tuple(z1, ts, z0)
        z1_hat = rf.get_target_with_zt_vel(zt, vel, ts)
        np.testing.assert_allclose(z1_hat, z1, rtol=1e-4, atol=1e-5)

    def test_step_sequences_match_reference_convention(self):
        # model_AMD.py:554-555 -> linspace(0, 1000, num=steps+1)[1:] reversed
        seq = rf.sample_step_sequence(4, 1000)
        np.testing.assert_array_equal(seq, [1000, 750, 500, 250])
        seq2 = rf.scheduler_step_sequence(5, 1000)
        np.testing.assert_array_equal(seq2, [1000, 750, 500, 250, 0])

    def test_euler_sample_linear_flow(self):
        """With v(z,t) = c constant, Euler recovers z0 + c exactly."""
        z0 = jnp.zeros((2, 4))
        c = jnp.arange(8.0).reshape(2, 4)
        out = rf.euler_sample(lambda z, t: c, z0, rf.sample_step_sequence(10))
        np.testing.assert_allclose(out, c, rtol=1e-5)


class TestFrequency:
    def test_mask_matches_torch_reference(self):
        """Golden check of the Gaussian LPF formula vs the reference math."""
        T, H, W = 9, 16, 16
        d_s, d_t = 0.5, 0.6
        t = torch.arange(T).float() * 2 / T - 1
        h = torch.arange(H).float() * 2 / H - 1
        w = torch.arange(W).float() * 2 / W - 1
        gt_, gh_, gw_ = torch.meshgrid(t, h, w, indexing="ij")
        d2 = (gt_ / d_t) ** 2 + (gh_ / d_s) ** 2 + (gw_ / d_s) ** 2
        ref = torch.exp(-0.5 * d2).numpy()
        ours = np.asarray(frequency.gaussian_low_pass_filter((T, H, W), d_s, d_t))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_split_matches_torch_fft_reference(self):
        """Golden check of the full band split vs the reference fft chain."""
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 8, 16, 16).astype(np.float32)
        d_s, d_t = 0.5, 0.25
        # reference chain in torch (frequency_utils.py:84-108)
        lpf = torch.from_numpy(np.asarray(
            frequency.gaussian_low_pass_filter((8, 16, 16), d_s, d_t)))
        xt = torch.from_numpy(x)
        x_freq = torch.fft.fftn(xt, dim=(-3, -2, -1))
        x_freq = torch.fft.fftshift(x_freq, dim=(-3, -2, -1))
        low_ref = torch.fft.ifftn(
            torch.fft.ifftshift(x_freq * lpf, dim=(-3, -2, -1)),
            dim=(-3, -2, -1)).real.numpy()
        high_ref = torch.fft.ifftn(
            torch.fft.ifftshift(x_freq * (1 - lpf), dim=(-3, -2, -1)),
            dim=(-3, -2, -1)).real.numpy()

        low, high = frequency.freq_3d_split(jnp.asarray(x), d_s, d_t)
        np.testing.assert_allclose(np.asarray(low), low_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(high), high_ref, rtol=1e-4, atol=1e-5)

    def test_band_sum_reconstructs(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 16, 16))
        low, high = frequency.freq_3d_split(x, 0.6, 0.5)
        np.testing.assert_allclose(np.asarray(low + high), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_views_and_weights(self):
        assert frequency.get_views(32, 16, 8) == [(0, 16), (8, 24), (16, 32)]
        assert frequency.generate_weight_sequence(4) == [1, 2, 2, 1]
        assert frequency.generate_weight_sequence(5) == [1, 2, 3, 2, 1]


class TestWavelet:
    def test_matches_torch_reference(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 8, 8).astype(np.float32)
        xt = torch.from_numpy(x)
        # reference dwt_init (wavelet.py:13-27)
        x01, x02 = xt[:, :, 0::2, :] / 2, xt[:, :, 1::2, :] / 2
        x1, x2 = x01[:, :, :, 0::2], x02[:, :, :, 0::2]
        x3, x4 = x01[:, :, :, 1::2], x02[:, :, :, 1::2]
        ref = [(x1 + x2 + x3 + x4), (-x1 - x2 + x3 + x4),
               (-x1 + x2 - x3 + x4), (x1 - x2 - x3 + x4)]
        ours = wavelet.dwt2(jnp.asarray(x))
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(np.asarray(o), r.numpy(), rtol=1e-5,
                                       atol=1e-6)

    def test_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16))
        bands = wavelet.dwt2(x)
        rec = wavelet.iwt2_from_bands(*bands)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x), rtol=1e-4,
                                   atol=1e-5)


class TestRegularizers:
    def test_kl_matches_torch_reference(self):
        rng = np.random.RandomState(3)
        p = rng.randn(8, 64, 6).astype(np.float32)
        # reference DiagonalGaussianDistribution.kl (regularizers.py:61-69)
        pt = torch.from_numpy(p)
        mean, logvar = torch.chunk(pt, 2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        var = torch.exp(logvar)
        kl_ref = 0.5 * torch.sum(mean ** 2 + var - 1.0 - logvar, dim=[1, 2])
        kl_ref = (torch.sum(kl_ref) / kl_ref.shape[0]).item()

        _, kl = regularizers.diagonal_gaussian_regularize(
            jnp.asarray(p), jax.random.PRNGKey(0))
        assert abs(float(kl) - kl_ref) / abs(kl_ref) < 1e-4

    def test_mode_is_mean(self):
        p = jnp.concatenate([jnp.full((2, 3, 4), 1.5), jnp.zeros((2, 3, 4))],
                            axis=1)
        z, _ = regularizers.diagonal_gaussian_regularize(p, sample=False)
        np.testing.assert_allclose(np.asarray(z), 1.5)

    def test_sample_statistics(self):
        p = jnp.zeros((1, 2, 4096))  # mean 0, logvar 0 -> std 1
        z, _ = regularizers.diagonal_gaussian_regularize(
            p, jax.random.PRNGKey(1))
        assert abs(float(jnp.std(z)) - 1.0) < 0.05


class TestEmbeddings:
    def test_timestep_embedding_shape_and_parity(self):
        """Check against a torch restatement of diffusers get_timestep_embedding."""
        dim = 64
        ts = np.array([0.0, 1.0, 500.0, 999.0], dtype=np.float32)
        half = dim // 2
        exponent = -np.log(10000.0) * torch.arange(half).float() / half
        freqs = torch.exp(exponent)
        emb = torch.from_numpy(ts)[:, None] * freqs[None, :]
        ref = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1).numpy()
        ours = np.asarray(embeddings.timestep_embedding(jnp.asarray(ts), dim))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_sincos_tables(self):
        tab = embeddings.get_1d_sincos_pos_embed(32, 10)
        assert tab.shape == (10, 32)
        # position 0 -> sin part 0, cos part 1
        np.testing.assert_allclose(tab[0, :16], 0.0, atol=1e-7)
        np.testing.assert_allclose(tab[0, 16:], 1.0, atol=1e-7)
        tab2 = embeddings.get_2d_sincos_pos_embed(64, (4, 4))
        assert tab2.shape == (16, 64)
        # rows with equal w coordinate share the first channel half
        np.testing.assert_allclose(tab2[0, :32], tab2[4, :32], atol=1e-7)


class TestDistributed:
    def test_eight_fake_devices(self):
        assert jax.device_count() == 8


class TestHeunSampler:
    def test_second_order_convergence(self):
        """Linear field v(z, t) = a(t) z with analytic solution: Heun's
        error shrinks ~4x per step doubling (2nd order) and beats Euler at
        equal step counts."""
        from hivae_tpu.ops import rectified_flow as rf

        num = 1000
        z0 = jnp.ones((1, 4)) * 0.5

        def vel(z, step):
            t = (num - step[0]) / num
            return (1.0 + t) * z

        # dz/dt = (1+t) z  =>  z(1) = z(0) exp(t + t^2/2)|_0^1 = z0 e^{1.5}
        exact = np.asarray(z0) * np.exp(1.5)

        def err(sampler, k):
            out = sampler(vel, z0, rf.sample_step_sequence(k, None, num))
            return float(np.abs(np.asarray(out) - exact).max())

        e_eu_8, e_eu_16 = err(rf.euler_sample, 8), err(rf.euler_sample, 16)
        e_he_8, e_he_16 = err(rf.heun_sample, 8), err(rf.heun_sample, 16)
        assert e_he_8 < e_eu_8 / 4
        # order: euler halves, heun quarters
        assert e_eu_8 / e_eu_16 == pytest.approx(2.0, rel=0.3)
        assert e_he_8 / e_he_16 == pytest.approx(4.0, rel=0.4)


def test_sincos_tables_match_independent_torch_restatement():
    """The goldens' positional tables must NOT be blind to a frequency
    formula bug: pin hivae_tpu.ops.embeddings' tables against
    torch_ref's independent torch restatement (a shared import would
    make both sides wrong together)."""
    import torch_ref as TR

    from hivae_tpu.ops import embeddings as E

    np.testing.assert_allclose(
        E.get_1d_sincos_pos_embed(32, 17),
        TR.sincos_1d(32, 17).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        E.get_2d_sincos_pos_embed(16, (4, 6)),
        TR.sincos_2d(16, (4, 6)).numpy(), atol=1e-6)
