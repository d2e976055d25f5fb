"""Diagonal-Gaussian KL regularization as pure functions.

Capability parity with the reference regularizer (reference:
``model/regularizers.py:27-90``): parameters are chunked into (mean, logvar)
on axis 1, logvar clamped to [-30, 20], reparameterized sample, and KL to
N(0, 1) summed over non-batch axes and averaged over the batch.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_params(cls, parameters: jax.Array, axis: int = 1) -> "DiagonalGaussian":
        mean, logvar = jnp.split(parameters, 2, axis=axis)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape,
                                                        self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, reduce_axes=(1, 2)) -> jax.Array:
        """KL(q || N(0,1)) summed over ``reduce_axes`` (reference ``:61-69``)."""
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar,
            axis=reduce_axes)

    def nll(self, sample: jax.Array, reduce_axes=(1, 2)) -> jax.Array:
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=reduce_axes)


def diagonal_gaussian_regularize(
    parameters: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    sample: bool = True,
    axis: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """(z, kl_loss): sample (or mode) + batch-mean KL, matching the reference
    ``DiagonalGaussianRegularizer.forward`` (``regularizers.py:35-44``)."""
    post = DiagonalGaussian.from_params(parameters, axis=axis)
    z = post.sample(key) if sample else post.mode()
    reduce_axes = tuple(range(1, parameters.ndim))
    kl = post.kl(reduce_axes=tuple(a if a < axis else a for a in reduce_axes))
    kl_loss = jnp.sum(kl) / kl.shape[0]
    return z, kl_loss
