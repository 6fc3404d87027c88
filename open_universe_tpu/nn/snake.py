"""Snake periodic activations with anti-aliased (2x resampled) application.

Reimplements the BigVGAN activation stack used by the reference
(networks/bigvgan/snake.py, alias_free_act.py): Snake/SnakeBeta with
per-channel trainable frequency (optionally log-scale), sandwiched between a
2x polyphase sinc upsample and downsample.  The resampling kernel follows
torchaudio's ``sinc_interp_hann`` design (lowpass_filter_width=6,
rolloff=0.99) so converted checkpoints behave identically.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module, Params

_LOWPASS_WIDTH = 6
_ROLLOFF = 0.99


@lru_cache(maxsize=8)
def _sinc_kernel_np(orig: int, new: int) -> tuple:
    """torchaudio _get_sinc_resample_kernel (hann window). Returns (kernel, width).

    kernel shape (new, taps) — one polyphase filter per output phase.
    """
    g = math.gcd(orig, new)
    orig, new = orig // g, new // g
    base_freq = min(orig, new) * _ROLLOFF
    width = math.ceil(_LOWPASS_WIDTH * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -_LOWPASS_WIDTH, _LOWPASS_WIDTH)
    window = np.cos(t * np.pi / _LOWPASS_WIDTH / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel.astype(np.float32), width, orig, new


def resample(x: jax.Array, orig: int, new: int) -> jax.Array:
    """Polyphase sinc resample along the time axis; x: (B, T, C).

    Perf note (v5e, batch 40, (40,32000,32) bf16 fwd+bwd through the
    up->act->down sandwich): this fold-channels-into-batch NCW form measures
    24.4 ms, a channels-last depthwise (grouped) conv 26.9 ms, and a dense
    conv with a diagonal channel-preserving kernel 30.8 ms — the op is
    layout/lane-starved at this batch in every conv formulation, so the
    simplest torch-matching one is kept.
    """
    kernel_np, width, orig, new = _sinc_kernel_np(orig, new)
    if orig == new:
        return x
    b, t, c = x.shape
    taps = kernel_np.shape[1]
    # fold channels into batch; filter operates per-channel identically
    xf = jnp.swapaxes(x, 1, 2).reshape(b * c, 1, t)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (width, width + orig)))
    w = jnp.asarray(kernel_np, x.dtype)[:, None, :]  # (new, 1, taps) OIW
    y = jax.lax.conv_general_dilated(
        xf, w, window_strides=(orig,), padding=((0, 0),),
        dimension_numbers=("NCW", "OIW", "NCW"),
    )  # (B*C, new, frames)
    y = jnp.swapaxes(y, 1, 2).reshape(b * c, -1)
    target = int(math.ceil(new * t / orig))
    y = y[:, :target]
    return jnp.swapaxes(y.reshape(b, c, target), 1, 2)


class Snake(Module):
    """snake(x) = x + sin^2(alpha x) / alpha   (per-channel alpha)."""

    def __init__(self, channels: int, alpha: float = 1.0, alpha_logscale: bool = False,
                 beta: bool = False):
        self.channels = channels
        self.alpha0 = alpha
        self.alpha_logscale = alpha_logscale
        self.with_beta = beta
        self.eps = 1e-9

    def init(self, key) -> Params:
        fill = 0.0 if self.alpha_logscale else self.alpha0
        p = {"alpha": jnp.full((self.channels,), fill, jnp.float32)}
        if self.with_beta:
            p["beta"] = jnp.full((self.channels,), fill, jnp.float32)
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        alpha = params["alpha"].astype(x.dtype)
        beta = params.get("beta", params["alpha"]).astype(x.dtype)
        if self.alpha_logscale:
            alpha = jnp.exp(alpha)
            beta = jnp.exp(beta)
        s = jnp.sin(x * alpha)
        return x + s * s / (beta + self.eps)


class Activation1d(Module):
    """up_ratio x upsample -> activation -> down_ratio x downsample."""

    def __init__(self, activation: Module, up_ratio: int = 2, down_ratio: int = 2):
        self.up_ratio = up_ratio
        self.down_ratio = down_ratio
        self.act = activation

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        y = resample(x, 1, self.up_ratio)
        y = self.act(params["act"], y)
        return resample(y, self.down_ratio, 1)


class AliasFreeSnake(Module):
    """2x-upsample -> snake -> 2x-downsample (BigVGAN Activation1d).

    Module nesting matches torch (AliasFreeSnake.act = Activation1d,
    Activation1d.act = Snake) so parameter names line up for checkpoints."""

    def __init__(self, channels: int, alpha: float = 1.0, alpha_logscale: bool = False,
                 beta: bool = False, up_ratio: int = 2, down_ratio: int = 2):
        self.act = Activation1d(
            Snake(channels, alpha=alpha, alpha_logscale=alpha_logscale, beta=beta),
            up_ratio=up_ratio, down_ratio=down_ratio)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        return self.act(params["act"], x)
