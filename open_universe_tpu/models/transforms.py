"""Optional signal pre-conditioning transforms (reference layers/dyn_range_comp.py).

IdentityTransform (the default) and CompressedMagSTFT, which maps a waveform
to a magnitude-compressed complex spectrogram packed as real channels:
(B, T, 1) -> (B, frames, 2 * n_freq) in our channels-last layout.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..nn.module import Module, Params
from ..ops import hann_window, istft, stft


class IdentityTransform(Module):
    def init(self, key) -> Params:
        return {}

    def apply(self, params: Params, x: jax.Array, inv: bool = False) -> jax.Array:
        return x

    def inv(self, params: Params, x: jax.Array, length=None) -> jax.Array:
        return x


def _get_window(window_type: str, n: int) -> jax.Array:
    if window_type == "sqrthann":
        return jnp.sqrt(hann_window(n))
    if window_type == "hann":
        return hann_window(n)
    if window_type == "hamming":
        k = jnp.arange(n)
        return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * k / n)
    raise NotImplementedError(f"window {window_type!r} not implemented")


class CompressedMagSTFT(Module):
    def __init__(self, stft_kwargs: dict, spec_kwargs: dict, inv: bool = False):
        assert all(k in stft_kwargs for k in ("n_fft", "hop_length", "window_name"))
        assert all(k in spec_kwargs for k in
                   ("transform_type", "abs_exponent", "factor"))
        self.n_fft = stft_kwargs["n_fft"]
        self.hop = stft_kwargs["hop_length"]
        self.window = _get_window(stft_kwargs.get("window_name", "hann"), self.n_fft)
        self.spec_kwargs = dict(spec_kwargs)
        self._inv = inv

    def init(self, key) -> Params:
        return {}

    def _forward_transform(self, spec):
        tt = self.spec_kwargs["transform_type"]
        if tt == "exponent":
            e = self.spec_kwargs["abs_exponent"]
            if e != 1:
                mag = jnp.abs(spec)
                spec = (1e-7 + mag) ** (e - 1.0) * spec
            return spec * self.spec_kwargs["factor"]
        if tt == "log":
            sgn = spec / jnp.maximum(jnp.abs(spec), 1e-30)
            return jnp.log(1.0 + jnp.abs(spec)) * sgn * self.spec_kwargs["factor"]
        return spec

    def _backward_transform(self, spec):
        tt = self.spec_kwargs["transform_type"]
        if tt == "exponent":
            spec = spec / self.spec_kwargs["factor"]
            e = self.spec_kwargs["abs_exponent"]
            if e != 1:
                mag = jnp.abs(spec)
                spec = (1e-7 + mag) ** (1.0 / e - 1.0) * spec
            return spec
        if tt == "log":
            spec = spec / self.spec_kwargs["factor"]
            sgn = spec / jnp.maximum(jnp.abs(spec), 1e-30)
            return (jnp.exp(jnp.abs(spec)) - 1.0) * sgn
        return spec

    def _stft(self, sig):
        return stft(sig, self.n_fft, self.hop, window=self.window, center=True,
                    pad_mode="constant")

    def _istft(self, spec, length=None):
        return istft(spec, self.n_fft, self.hop, length=length, window=self.window,
                     center=True)

    def apply(self, params: Params, x: jax.Array, inv: bool = False,
              length: Optional[int] = None) -> jax.Array:
        if self._inv:
            inv = not inv
        if not inv:
            if x.shape[-1] != 1:
                raise ValueError("expects single-channel input (B, T, 1)")
            z = self._stft(x[..., 0])  # (B, frames, n_freq)
            z = self._forward_transform(z)
            return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)
        n_freq = x.shape[-1] // 2
        z = x[..., :n_freq] + 1j * x[..., n_freq:]
        z = self._backward_transform(z)
        y = self._istft(z, length=length)
        return y[..., None]

    def inv(self, params: Params, x: jax.Array, length=None) -> jax.Array:
        return self.apply(params, x, inv=True, length=length)


class CompressedMagSTFTPadded(CompressedMagSTFT):
    def __init__(self, stft_kwargs, spec_kwargs, pad_block=None, inv=False):
        super().__init__(stft_kwargs, spec_kwargs, inv=inv)
        if pad_block is not None:
            if pad_block % self.hop != 0:
                raise ValueError("pad_block must be a multiple of hop_length")
            self.pad_block = pad_block
        else:
            self.pad_block = 0

    def _pad(self, sig):
        if self.pad_block > 0:
            r = sig.shape[-1] % self.pad_block
            if r > 0:
                sig = jnp.pad(sig, [(0, 0)] * (sig.ndim - 1) + [(0, self.pad_block - r)])
        return sig[..., : -self.hop]

    def _stft(self, sig):
        # reference applies _pad twice (dyn_range_comp.py:199-200); reproduce
        sig = self._pad(self._pad(sig))
        return stft(sig, self.n_fft, self.hop, window=self.window, center=True,
                    pad_mode="constant")

    def _istft(self, spec, length=None):
        if length is None:
            length = spec.shape[-2] * self.hop
        return super()._istft(spec, length=length)
