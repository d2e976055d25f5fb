"""Tests for the generic RF harness and timestep samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from hivae_tpu.models.base import (RectifiedFlowHarness, get_sample_t_schedule,
                                   sample_t, sample_timestep)

KEY = jax.random.PRNGKey(0)


class TestSamplers:
    def test_sample_t_range(self):
        t = sample_t(KEY, 1000)
        assert float(t.min()) > 0.0 and float(t.max()) < 1.0

    def test_sample_timestep_bounds(self):
        ts = sample_timestep(KEY, 1000, num_steps=1000)
        assert ts.dtype == jnp.int32
        assert 0 <= int(ts.min()) and int(ts.max()) <= 1000

    def test_schedule_sums_to_one(self):
        for steps in (4, 10, 50):
            sched = get_sample_t_schedule({}, steps)
            assert len(sched) == steps
            np.testing.assert_allclose(sched.sum(), 1.0, rtol=1e-5)
        custom = get_sample_t_schedule({"m": 2, "n": 50}, 10)
        np.testing.assert_allclose(custom.sum(), 1.0, rtol=1e-5)


class TestHarness:
    def test_forward_identities(self):
        h = RectifiedFlowHarness(lambda z, c, t: c - z, num_steps=1000)
        gt = jax.random.normal(KEY, (2, 3, 4))
        # timestep 0 -> t=1 -> zt == gt exactly, pinning the convention
        zt, motion_pred, vel_pred, vel_gt = h.forward(
            KEY, gt, gt, timestep=jnp.zeros((2,), jnp.int32))
        np.testing.assert_allclose(np.asarray(zt), np.asarray(gt), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(motion_pred), np.asarray(gt),
                                   rtol=1e-5, atol=1e-6)
        seen_dtypes = []
        h2 = RectifiedFlowHarness(
            lambda z, c, t: seen_dtypes.append(t.dtype) or (c - z))
        h2.forward(KEY, gt, gt)
        h2.sample(KEY, (2, 3, 4), gt, sample_steps=2)
        assert all(d == jnp.float32 for d in seen_dtypes)

    def test_sample_converges_for_linear_flow(self):
        """v(z) = target - z integrates towards the target."""
        target = jnp.full((2, 4), 3.0)
        h = RectifiedFlowHarness(lambda z, c, t: c - z, num_steps=1000)
        out = h.sample(KEY, (2, 4), target, sample_steps=50)
        err0 = float(jnp.mean(jnp.abs(
            jax.random.normal(KEY, (2, 4)) - target)))
        err = float(jnp.mean(jnp.abs(out - target)))
        assert err < err0
