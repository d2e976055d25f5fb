"""Rectified-flow (flow-matching) scheduler as pure JAX functions.

Capability parity with the reference scheduler (reference:
``model/rectified_flow.py:6-139``), re-designed functionally: no object state,
explicit PRNG keys, and Euler sampling expressed as ``lax.scan`` so the whole
ODE loop compiles into a single XLA program.

Semantics (matching the reference exactly):
  * integer timesteps ``step`` in [0, num_steps] map to continuous time
    ``t = (num_steps - step) / num_steps``  (``rectified_flow.py:70-75``)
  * the forward interpolant is ``z_t = t * z1 + (1 - t) * z0`` with velocity
    target ``z1 - z0``                       (``rectified_flow.py:18-40``)
  * the model prediction can be converted back to a target sample via
    ``z1_hat = z_t + (1 - t) * v``           (``rectified_flow.py:42-45``)
  * Euler sampling walks a precomputed integer ``step_seq`` from high step to
    low with ``dt = 1 / len(step_seq)``      (``rectified_flow.py:77-116``)
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_NUM_STEPS = 1000


def timestep_to_time(timestep: jax.Array, num_steps: int = DEFAULT_NUM_STEPS,
                     ndim: int = 4) -> jax.Array:
    """Map integer timestep(s) to continuous time in [0, 1].

    ``t = (num_steps - step) / num_steps``; a 1-D batch of steps is reshaped to
    broadcast against an ``ndim``-dimensional batch of samples.
    """
    t = (num_steps - timestep.astype(jnp.float32)) / num_steps
    if t.ndim == 1:
        t = t.reshape((-1,) + (1,) * (ndim - 1))
    return t


def get_train_tuple(
    z1: jax.Array,
    timestep: Optional[jax.Array] = None,
    z0: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,
    num_steps: int = DEFAULT_NUM_STEPS,
):
    """Sample the interpolant ``z_t`` and velocity target for training.

    Args:
      z1: target distribution sample, any shape with leading batch dim.
      timestep: integer steps ``(batch,)``; if None, ``t ~ U[0,1)`` is drawn
        (requires ``key``).
      z0: source distribution sample; standard normal if None (requires key).
      key: PRNG key used for whichever of ``t`` / ``z0`` is sampled.

    Returns:
      (z_t, target) with ``target = z1 - z0``.
    """
    kt = kz = None
    if key is not None:
        kt, kz = jax.random.split(key)
    if timestep is None:
        t = jax.random.uniform(kt, (z1.shape[0],) + (1,) * (z1.ndim - 1))
    else:
        t = timestep_to_time(timestep, num_steps, ndim=z1.ndim)
    if z0 is None:
        z0 = jax.random.normal(kz, z1.shape, z1.dtype)
    z_t = t * z1 + (1.0 - t) * z0
    target = z1 - z0
    return z_t, target


def get_target_with_zt_vel(z_t: jax.Array, vel: jax.Array, timestep: jax.Array,
                           num_steps: int = DEFAULT_NUM_STEPS) -> jax.Array:
    """Recover the predicted clean sample: ``z1_hat = z_t + (1 - t) * vel``."""
    t = timestep_to_time(timestep, num_steps, ndim=z_t.ndim)
    return z_t + (1.0 - t) * vel


def euler_start(z0: jax.Array, z1: Optional[jax.Array], start_step: int,
                num_steps: int = DEFAULT_NUM_STEPS) -> jax.Array:
    """Initial state for an Euler walk that begins at ``start_step``.

    The reference seeds every sampler with ``get_train_tuple(z1=zj,
    time_step=start_step)`` (e.g. ``model_AMD.py:2052``), i.e. the partially
    noised target ``t0*z1 + (1-t0)*z0`` with ``t0 = (num_steps - start_step)
    / num_steps``. At the default ``start_step == num_steps`` this is pure
    noise and ``z1`` is not needed.
    """
    if start_step >= num_steps:
        return z0
    if z1 is None:
        raise ValueError(
            f"start_step={start_step} < num_steps={num_steps} requires the "
            "target sample z1 to seed the partially-noised start state")
    t0 = (num_steps - start_step) / num_steps
    return t0 * z1 + (1.0 - t0) * z0


def sample_step_sequence(sample_steps: int, start_step: Optional[int] = None,
                         num_steps: int = DEFAULT_NUM_STEPS) -> np.ndarray:
    """Integer step sequence used by the top-level models' Euler loops.

    Matches the reference's ``np.linspace(0, start_step, num=steps+1)[1:]``
    convention (``model_AMD.py:554-555``), returned high->low (denoising
    order).
    """
    if start_step is None:
        start_step = num_steps
    seq = np.linspace(0, start_step, num=sample_steps + 1, endpoint=True,
                      dtype=np.int64)[1:]
    return seq[::-1].copy()


def scheduler_step_sequence(sample_steps: int, start_step: Optional[int] = None,
                            num_steps: int = DEFAULT_NUM_STEPS) -> np.ndarray:
    """Step sequence of ``RectifiedFlow.sample_loop`` (reference ``:92``):
    ``np.linspace(0, start_step, num=sample_steps)`` reversed."""
    if start_step is None:
        start_step = num_steps
    seq = np.linspace(0, start_step, num=sample_steps, endpoint=True,
                      dtype=np.int64)
    return seq[::-1].copy()


def euler_sample(
    velocity_fn: Callable[[jax.Array, jax.Array], jax.Array],
    z0: jax.Array,
    step_seq: Sequence[int],
    *,
    unroll: int = 1,
) -> jax.Array:
    """Euler-integrate the learned flow from ``z0`` along ``step_seq``.

    ``velocity_fn(z, timestep)`` returns the predicted velocity; the loop is a
    ``lax.scan`` over the (static-length) step sequence, with
    ``dt = 1/len(step_seq)`` — XLA compiles the whole trajectory into one
    program, and the carried sample buffer is reused in-place.
    """
    steps = jnp.asarray(np.asarray(step_seq), dtype=jnp.float32)
    dt = 1.0 / len(step_seq)
    batch = z0.shape[0]

    def body(z, step):
        t = jnp.full((batch,), step, dtype=jnp.float32)
        v = velocity_fn(z, t)
        return z + v * dt, None

    zf, _ = jax.lax.scan(body, z0, steps, unroll=unroll)
    return zf


def heun_sample(
    velocity_fn: Callable[[jax.Array, jax.Array], jax.Array],
    z0: jax.Array,
    step_seq: Sequence[int],
    *,
    unroll: int = 1,
) -> jax.Array:
    """Heun (2nd-order) integration of the learned flow — a capability
    upgrade over the reference's Euler-only sampling: two velocity
    evaluations per step but O(dt^2) local error, so ~half the steps reach
    the same ODE accuracy (tests/test_ops.py pins the convergence order).

    The predictor walks to the next step's time; the final step corrects
    toward step 0 (t=1).
    """
    steps = jnp.asarray(np.asarray(step_seq), dtype=jnp.float32)
    nxt = jnp.concatenate([steps[1:], jnp.zeros((1,), jnp.float32)])
    dt = 1.0 / len(step_seq)
    batch = z0.shape[0]

    def body(z, s):
        step, step_next = s
        v1 = velocity_fn(z, jnp.full((batch,), step, dtype=jnp.float32))
        ze = z + v1 * dt
        v2 = velocity_fn(ze, jnp.full((batch,), step_next,
                                      dtype=jnp.float32))
        return z + dt * 0.5 * (v1 + v2), None

    zf, _ = jax.lax.scan(body, z0, (steps, nxt), unroll=unroll)
    return zf
