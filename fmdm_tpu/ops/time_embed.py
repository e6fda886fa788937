"""
Sinusoidal timestep embeddings.

Exact functional parity with the reference
(/root/reference/src/nn/ops/time_embedding.py:4-32), including the diffusers
semantics: half-dim exponent scaled by 1/max(half - freq_shift, 1),
sin||cos concat, optional flip to cos||sin, and odd-dim zero padding.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    max_period: int = 10000,
    *,
    flip_sin_to_cos: bool = True,
    freq_shift: int = 0,
) -> jax.Array:
    """timesteps: (N,) -> (N, dim) float32 positional embeddings."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / max(half - freq_shift, 1)
    args = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    embedding = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        embedding = jnp.concatenate([embedding[:, half:], embedding[:, :half]], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def run_self_tests() -> None:
    """Embedded self-test (reference test tier 1, SURVEY.md §4)."""
    import numpy as np

    t = jnp.array([0.0, 1.0, 500.0])
    for dim in (8, 9, 32):
        emb = timestep_embedding(t, dim)
        assert emb.shape == (3, dim)
        # t=0: sin=0, cos=1 -> after flip, first half all cos(0)=1
        np.testing.assert_allclose(np.asarray(emb[0, : dim // 2]), 1.0, atol=1e-6)
    no_flip = timestep_embedding(t, 8, flip_sin_to_cos=False)
    np.testing.assert_allclose(np.asarray(no_flip[0, :4]), 0.0, atol=1e-6)
