"""Diffusion time/sigma embeddings (reference sigma_block.py).

SigmaBlock: random Fourier features of log10(sigma) -> 3 PReLU-Linear layers.
SimpleTimeEmbedding: 2-parameter learned sinusoid (UNIVERSE++ default).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import Linear, PReLU
from .module import Module, Params


class LinearPReLU(Module):
    """prelu(linear(x)) with torch child names (lin, prelu)."""

    def __init__(self, in_features, out_features):
        self.prelu = PReLU()
        self.lin = Linear(in_features, out_features)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        return self.prelu(params["prelu"], self.lin(params["lin"], x))


class SigmaBlock(Module):
    """Random Fourier features of log10(sigma), UNIVERSE App. D.

    The frequency vector is a random *buffer* (drawn at init, not trained);
    it must be restored from checkpoints (sigma_block.freq in torch).
    """

    def __init__(self, n_rff: int = 32, n_dim: int = 256, scale: float = 16.0):
        self.n_rff = n_rff
        self.scale = scale
        self.layer1 = LinearPReLU(2 * n_rff, 4 * n_rff)
        self.layer2 = LinearPReLU(4 * n_rff, 8 * n_rff)
        self.layer3 = LinearPReLU(8 * n_rff, n_dim)

    def init(self, key) -> Params:
        kf, kr = jax.random.split(key)
        p = super().init(kr)
        p["freq"] = self.scale * jax.random.normal(kf, (self.n_rff,), jnp.float32)
        return p

    def buffer_names(self):
        return ["freq"]

    def apply(self, params: Params, log10_sigma: jax.Array) -> jax.Array:
        """log10_sigma: (B,) -> embedding (B, n_dim)."""
        freq = params["freq"].astype(log10_sigma.dtype)
        p = 2.0 * math.pi * freq[None, :] * log10_sigma[:, None]
        rff = jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1)
        g = self.layer1(params["layer1"], rff)
        g = self.layer2(params["layer2"], g)
        g = self.layer3(params["layer3"], g)
        return g


class SimpleTimeEmbedding(Module):
    """Sinusoid with learned continuous frequency (sigma_block.py:60-78)."""

    def __init__(self, n_dim: int = 256):
        self.n_dim = n_dim

    def init(self, key) -> Params:
        return {
            "weight": jnp.zeros((1, 1), jnp.float32),
            "bias": jnp.zeros((1, 1), jnp.float32),
        }

    def apply(self, params: Params, log10_sigma: jax.Array) -> jax.Array:
        time = jnp.arange(self.n_dim // 2, dtype=log10_sigma.dtype)
        w = params["weight"].astype(log10_sigma.dtype)
        b = params["bias"].astype(log10_sigma.dtype)
        f = 0.5 * jax.nn.sigmoid(w * log10_sigma[:, None] + b)
        p = 2.0 * math.pi * f * time
        return jnp.concatenate([jnp.sin(p), jnp.cos(p)], axis=-1)
