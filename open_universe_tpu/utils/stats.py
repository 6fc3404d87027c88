"""Ensemble signal median (reference utils/stats.py), vectorized for XLA.

For each sample position, find the ensemble member closest to the median
rank; the member that wins the most positions is returned whole.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def signal_median(signal: jax.Array) -> jax.Array:
    """signal: (ensemble, batch, ...) -> (batch, ...).

    Implements the algorithm the reference DOCUMENTS (stats.py docstring
    steps 1-5): per sample, the member holding the median rank; the member
    that is the per-sample median most often is returned whole.  The
    reference's torch code does not implement its own docstring — it argmins
    |original_member_index - n/2| over ranks, i.e. it tracks the rank
    trajectory of the FIXED member n//2 and then uses that modal rank as a
    member index (utils/stats.py:41-59).  Quirk intentionally fixed;
    both versions return some ensemble member."""
    shape = signal.shape
    n = shape[0]
    flat = signal.reshape(n, shape[1], -1)  # (E, B, S)

    sorted_idx = jnp.argsort(flat, axis=0)  # (E, B, S)
    # median rank: argmin_r |r - n/2| (ties break low, matching argmin)
    member = sorted_idx[n // 2]  # (B, S) per-sample median member
    counts = jax.nn.one_hot(member, n, dtype=jnp.int32).sum(axis=1)  # (B, E)
    select = jnp.argmax(counts, axis=1)  # (B,)
    med = jnp.take_along_axis(flat, select[None, :, None], axis=0)[0]  # (B, S)
    return med.reshape(shape[1:])
