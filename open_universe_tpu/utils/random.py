"""Randomness helpers (reference utils/random.py), JAX-native.

The reference's rejection-sampled center-truncated normal is replaced by
jax.random.truncated_normal — the exact same distribution, but with static
shapes (rejection loops don't compile)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm as _norm


def center_truncated_normal(key, area=0.95, minval=0.0, maxval=1.0, shape=(1,)):
    """Truncated normal centered at (min+max)/2 whose untruncated density has
    `area` mass inside [min, max]."""
    q = _norm.ppf(area + 0.5 * (1.0 - area))
    mean = 0.5 * (maxval + minval)
    std = 0.5 * (maxval - minval) / q
    lower = (minval - mean) / std
    upper = (maxval - mean) / std
    z = jax.random.truncated_normal(key, lower, upper, shape)
    return mean + std * z
