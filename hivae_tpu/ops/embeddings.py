"""Sin-cos positional and timestep embeddings.

Formula-compatible with the embeddings the reference pulls from diffusers
(``diffusers.models.embeddings``): ``get_timestep_embedding`` (used via
``Timesteps(flip_sin_to_cos=True, freq_shift=0)``), ``get_2d_sincos_pos_embed``
and ``get_1d_sincos_pos_embed_from_grid`` (reference: ``model/transformer.py:29``).

Static position tables are built in numpy at module-construction time (they
are constants), so XLA sees them as literals and can fold the adds.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding(
    timesteps: jax.Array,
    embedding_dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
    scale: float = 1.0,
) -> jax.Array:
    """Sinusoidal timestep embedding matching diffusers ``Timesteps``.

    timesteps: (N,) float/int -> (N, embedding_dim).
    """
    half_dim = embedding_dim // 2
    exponent = -np.log(max_period) * np.arange(half_dim, dtype=np.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    freqs = jnp.asarray(np.exp(exponent))
    emb = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _sincos_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1-D sincos table from positions (diffusers
    ``get_1d_sincos_pos_embed_from_grid``): cat[sin(p*w), cos(p*w)]."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


@lru_cache(maxsize=64)
def get_1d_sincos_pos_embed(embed_dim: int, length: int) -> np.ndarray:
    """(length, embed_dim) float32 table."""
    return _sincos_from_grid(embed_dim, np.arange(length)).astype(np.float32)


@lru_cache(maxsize=64)
def get_3d_sincos_pos_embed(
    embed_dim: int,
    spatial_size: Tuple[int, int],
    temporal_size: int,
    spatial_interpolation_scale: float = 1.0,
    temporal_interpolation_scale: float = 1.0,
) -> np.ndarray:
    """(T, H*W, embed_dim) table matching diffusers ``get_3d_sincos_pos_embed``:
    first quarter of channels encodes time, the rest 2-D space."""
    assert embed_dim % 4 == 0
    w, h = spatial_size
    dim_spatial = 3 * embed_dim // 4
    dim_temporal = embed_dim // 4

    grid_h = np.arange(h, dtype=np.float64) / spatial_interpolation_scale
    grid_w = np.arange(w, dtype=np.float64) / spatial_interpolation_scale
    grid = np.meshgrid(grid_w, grid_h)
    grid = np.stack(grid, axis=0).reshape([2, 1, h, w])
    emb_a = _sincos_from_grid(dim_spatial // 2, grid[0])
    emb_b = _sincos_from_grid(dim_spatial // 2, grid[1])
    pos_spatial = np.concatenate([emb_a, emb_b], axis=1)  # (H*W, 3D/4)

    grid_t = np.arange(temporal_size, dtype=np.float64) / temporal_interpolation_scale
    pos_temporal = _sincos_from_grid(dim_temporal, grid_t)  # (T, D/4)

    pos_spatial = np.repeat(pos_spatial[np.newaxis], temporal_size, axis=0)
    pos_temporal = np.repeat(pos_temporal[:, np.newaxis], h * w, axis=1)
    return np.concatenate([pos_temporal, pos_spatial], axis=-1).astype(np.float32)


@lru_cache(maxsize=64)
def get_2d_sincos_pos_embed(embed_dim: int, grid_size: Tuple[int, int]) -> np.ndarray:
    """(h*w, embed_dim) table, row-major over (h, w); channel split and grid
    ordering match diffusers' ``get_2d_sincos_pos_embed`` exactly (including
    its quirk that the first channel half encodes the w coordinate)."""
    assert embed_dim % 2 == 0
    h, w = grid_size
    grid_h = np.arange(h, dtype=np.float64)
    grid_w = np.arange(w, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w varies fastest
    grid = np.stack(grid, axis=0).reshape([2, 1, h, w])
    emb_h = _sincos_from_grid(embed_dim // 2, grid[0])
    emb_w = _sincos_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)
