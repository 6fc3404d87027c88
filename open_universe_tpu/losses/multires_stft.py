"""Multi-resolution L1 time + STFT-magnitude loss (reference
losses/multires_stft.py, ESPnet-derived), pure JAX."""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.stft import stft as _stft


class MultiResL1SpecLoss:
    """L1 time-domain + multi-window STFT magnitude L1.

    total = w * L1_time + (1 - w) * mean_over_windows(L1_mag)
    Optionally scale-invariant (projects the estimate onto the target).
    Inputs: (B, T) or (B, T, C) waveforms (channels-last squeezed).
    """

    def __init__(self, window_sz: Sequence[int] = (512,),
                 hop_sz: Optional[Sequence[int]] = None, eps: float = 1e-8,
                 time_domain_weight: float = 0.5,
                 scale_invariant: bool = False):
        assert all(x % 2 == 0 for x in window_sz)
        self.window_sz = list(window_sz)
        self.hop_sz = list(hop_sz) if hop_sz is not None else [
            x // 2 for x in window_sz]
        self.eps = eps
        self.time_domain_weight = time_domain_weight
        self.scale_invariant = scale_invariant

    def __call__(self, estimate: jax.Array, target: jax.Array) -> jax.Array:
        if estimate.ndim == 3 and estimate.shape[-1] == 1:
            estimate = estimate[..., 0]
        if target.ndim == 3 and target.shape[-1] == 1:
            target = target[..., 0]
        estimate = estimate.astype(jnp.promote_types(estimate.dtype,
                                                     jnp.float32))
        target = target.astype(jnp.promote_types(target.dtype, jnp.float32))

        if self.scale_invariant:
            scaling = jnp.sum(estimate * target, -1, keepdims=True) / (
                jnp.sum(estimate**2, -1, keepdims=True) + self.eps)
        else:
            scaling = 1.0

        dims = tuple(range(1, target.ndim))
        time_loss = jnp.mean(jnp.abs(estimate * scaling - target), axis=dims)

        if not self.window_sz:
            return jnp.mean(time_loss)

        spec_loss = jnp.zeros_like(time_loss)
        for w, h in zip(self.window_sz, self.hop_sz):
            # torchaudio Spectrogram(center=True, pad_mode='constant', power=None)
            tm = jnp.abs(_stft(target, w, h, center=True, pad_mode="constant"))
            em = jnp.abs(_stft(estimate * scaling, w, h, center=True,
                               pad_mode="constant"))
            d = tuple(range(1, tm.ndim))
            spec_loss = spec_loss + jnp.mean(jnp.abs(em - tm), axis=d)

        total = (time_loss * self.time_domain_weight
                 + (1.0 - self.time_domain_weight) * spec_loss
                 / len(self.window_sz))
        return jnp.mean(total)
