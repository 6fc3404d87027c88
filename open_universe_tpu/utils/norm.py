"""Batch amplitude normalization (reference utils/norm.py).

Waveforms are (B, T, C); statistics are taken over all non-batch axes.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _norm2(signal, eps=1e-5):
    # ddof=1: torch.Tensor.std applies Bessel's correction by default
    # (reference utils/norm.py:23) — at T samples the ratio to the biased
    # std is sqrt(T/(T-1)), a real 1/(2T)-level parity error if dropped
    return jnp.maximum(
        jnp.std(signal, axis=(1, 2), keepdims=True, ddof=1), eps)


def _norm_max(signal, eps=1e-5):
    m = jnp.max(jnp.abs(signal.reshape(signal.shape[0], -1)), axis=1)
    return jnp.maximum(m[:, None, None], eps)


def _compute_gain(signal, norm, level, eps=1e-5):
    if norm in (2, "2"):
        return level / _norm2(signal, eps)
    if norm == "max":
        return level / _norm_max(signal, eps)
    if norm == "2-max":
        return jnp.minimum(level / _norm2(signal, eps), 1.0 / _norm_max(signal, eps))
    raise NotImplementedError(f"norm {norm!r} not implemented")


def normalize_batch(batch: Sequence[Optional[jax.Array]], norm=2, level_db=0.0,
                    ref="noisy", eps=1e-5, zero_mean=True):
    """Normalize (mix, *targets) to a target level in dB.

    ref='noisy' scales targets with the mix gain; ref='both' normalizes each
    signal independently.  Returns (signals, mean, std) for denormalization
    of the *mix-referenced* scaling.
    """
    assert ref in ("noisy", "both")
    level = 10.0 ** (level_db / 20.0)
    mix, *others = batch

    if zero_mean:
        mean = jnp.mean(mix, axis=(1, 2), keepdims=True)
        mix = mix - mean
    else:
        mean = 0.0

    gain = _compute_gain(mix, norm, level, eps)
    mix = mix * gain

    out = [mix]
    for tgt in others:
        if tgt is not None:
            if ref == "both":
                if zero_mean:
                    tgt = tgt - jnp.mean(tgt, axis=(1, 2), keepdims=True)
                tgt = tgt * _compute_gain(tgt, norm, level, eps)
            else:
                tgt = (tgt - mean) * gain
        out.append(tgt)
    return out, mean, 1.0 / gain


def denormalize_batch(x, mean, std):
    return x * std + mean
