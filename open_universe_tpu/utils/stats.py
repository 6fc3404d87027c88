"""Ensemble signal median (reference utils/stats.py), vectorized for XLA.

For each sample position, find the ensemble member closest to the median
rank; the member that wins the most positions is returned whole.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def signal_median(signal: jax.Array) -> jax.Array:
    """signal: (ensemble, batch, ...) -> (batch, ...)."""
    shape = signal.shape
    n = shape[0]
    flat = signal.reshape(n, shape[1], -1)  # (E, B, S)

    sorted_idx = jnp.argsort(flat, axis=0)  # (E, B, S)
    min_pos = jnp.argmin(jnp.abs(sorted_idx - n / 2.0), axis=0)  # (B, S)
    # which member sits at the median rank for each (B, S)
    member = jnp.take_along_axis(sorted_idx, min_pos[None], axis=0)[0]  # (B, S)
    counts = jax.nn.one_hot(member, n, dtype=jnp.int32).sum(axis=1)  # (B, E)
    select = jnp.argmax(counts, axis=1)  # (B,)
    med = jnp.take_along_axis(flat, select[None, :, None], axis=0)[0]  # (B, S)
    return med.reshape(shape[1:])
