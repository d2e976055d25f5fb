"""Generic conditioned motion-diffusion abstractions + timestep samplers.

Capability parity with the reference's ``downstream_tasks`` package
(reference: ``downstream_tasks/base_model.py:11-214``,
``downstream_tasks/utils.py:5-32``): a generic rectified-flow forward/sample
harness around any conditioned velocity model, the logit-normal timestep
sampler, and the logarithmic sample-t schedule.

The concrete a2m/l2m decoders of that package are covered by the richer
heads in ``models/a2m.py`` / ``models/t2m.py``; this module provides the
abstract harness so custom conditioning heads can be added with only a
``velocity_fn``.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sample_t(key: jax.Array, num_samples: int, m: float = 0.0,
             s: float = 1.0) -> jax.Array:
    """Logit-normal t in (0,1) (reference ``utils.py:10-12``)."""
    mu = m + s * jax.random.normal(key, (num_samples,))
    return jax.nn.sigmoid(mu)


def sample_timestep(key: jax.Array, num_samples: int, m: float = 0.0,
                    s: float = 1.0, num_steps: int = 1000) -> jax.Array:
    """Logit-normal integer timesteps (reference ``utils.py:13-15``)."""
    return (sample_t(key, num_samples, m, s) * num_steps).astype(jnp.int32)


def get_sample_t_schedule(t_schedule: Optional[Dict] = None,
                          sample_steps: int = 10) -> np.ndarray:
    """Logarithmic dt schedule summing to 1 (reference ``utils.py:16-30``)."""
    t_schedule = t_schedule or {}
    m = t_schedule.get("m", 1)
    n = t_schedule.get("n", 100)
    logm, logn = math.log(m), math.log(n)
    progress = np.linspace(0, 1, sample_steps + 1)
    logmn = np.log(progress * (m - n) + n)
    t = 1 - (logm - logmn) / (logm - logn)
    return np.diff(t).astype(np.float32)


class RectifiedFlowHarness:
    """Generic conditioned RF training/sampling around a velocity function.

    ``velocity_fn(zt, conds, timestep)`` -> velocity with zt's shape.
    Mirrors ``BaseDiffusionModel.forward/sample`` (reference
    ``base_model.py:118-207``).
    """

    def __init__(self, velocity_fn: Callable, num_steps: int = 1000):
        self.velocity_fn = velocity_fn
        self.num_steps = num_steps

    def forward(self, key: jax.Array, motion_gt: jax.Array, conds,
                timestep: Optional[jax.Array] = None):
        n = motion_gt.shape[0]
        kt, kz = jax.random.split(key)
        if timestep is None:
            timestep = jax.random.randint(kt, (n,), 0, self.num_steps + 1)
        t = (1.0 - timestep / self.num_steps).reshape(
            (n,) + (1,) * (motion_gt.ndim - 1))
        noise = jax.random.normal(kz, motion_gt.shape, motion_gt.dtype)
        vel_gt = motion_gt - noise
        zt = t * motion_gt + (1 - t) * noise
        # float timesteps at the model boundary, matching sample()
        vel_pred = self.velocity_fn(zt, conds, timestep.astype(jnp.float32))
        motion_pred = zt + (1 - t) * vel_pred
        return zt, motion_pred, vel_pred, vel_gt

    def sample(self, key: jax.Array, shape, conds, sample_steps: int = 10,
               t_schedule: Optional[Dict] = None) -> jax.Array:
        z = jax.random.normal(key, shape)
        if t_schedule is not None:
            dts = get_sample_t_schedule(t_schedule, sample_steps)
        else:
            dts = np.full((sample_steps,), 1.0 / sample_steps, np.float32)
        timestep = jnp.full((shape[0],), float(self.num_steps))

        for dt in dts:  # static-length python loop; jit-friendly via closure
            vel = self.velocity_fn(z, conds, timestep)
            z = z + float(dt) * vel
            timestep = timestep - float(dt) * self.num_steps
        return z
