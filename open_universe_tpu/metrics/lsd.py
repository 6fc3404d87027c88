"""Log-spectral distance (reference metrics/lsd.py), pure JAX.

Uses window-normalized power spectrograms (torchaudio ``normalized='window'``
divides the STFT by ||window||_2) so values match the reference bit-for-bit
up to float error.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import hann_window
from ..ops.stft import stft as _stft


def _log_power_spec(x, n_fft, hop, win_length, window, eps, db):
    z = _stft(x, n_fft, hop, win_length=win_length, window=window, center=True)
    wnorm = jnp.sqrt(jnp.sum(window**2))
    p = (jnp.abs(z) / wnorm) ** 2
    if db:
        return 10.0 * jnp.log10(p + eps)
    return jnp.log(p + eps)


def log_spectral_distance(
    input: jax.Array,
    target: jax.Array,
    p: float = 2,
    db: bool = True,
    n_fft: int = 400,
    hop_length: int = 160,
    eps: float = 1e-7,
    win_length: Optional[int] = None,
    scale_invariant: bool = False,
) -> jax.Array:
    """LSD between input and target; shapes [..., T] -> [...]."""
    if win_length is None:
        win_length = n_fft
    window = hann_window(n_fft, dtype=input.dtype)

    if scale_invariant:
        scaling = jnp.sum(input * target, -1, keepdims=True) / (
            jnp.sum(input**2, -1, keepdims=True) + eps)
    else:
        scaling = 1.0

    si = _log_power_spec(input, n_fft, hop_length, win_length, window, eps, db)
    st = _log_power_spec(scaling * target, n_fft, hop_length, win_length,
                         window, eps, db)
    denom = (st.shape[-1] * st.shape[-2]) ** (1.0 / p)
    diff = jnp.abs(si - st) ** p
    return jnp.sum(diff, axis=(-2, -1)) ** (1.0 / p) / denom
