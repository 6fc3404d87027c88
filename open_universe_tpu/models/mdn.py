"""Mixture density network loss (reference networks/universe/mdn.py).

Gaussian-mixture NLL over per-timestep channels; the LayerNorm's affine
shape pins the training sequence length (a documented reference property —
the loss is train-time only and never used at inference).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..nn import LayerNorm, Module, PReLUConv
from ..nn.module import Params


def elu2(x, alpha=1.0, eps=1e-15):
    return jax.nn.elu(x, alpha) + 1.0 + eps


class MixtureDensityNetworkLoss(Module):
    def __init__(self, est_channels, tgt_channels, n_comp=3, eps=1e-5,
                 sampling_rate=24000, sample_len_s=3.0, sigma_eps=1e-5,
                 alpha_per_sample=False, reduction="mean"):
        if reduction not in ("mean", "sum", "none"):
            raise ValueError("reduction must be mean|sum|none")
        self.reduction = reduction
        self.alpha_per_sample = alpha_per_sample
        self.n_comp = n_comp
        self.tgt_channels = tgt_channels
        self.eps = eps
        self.sigma_eps = sigma_eps
        self.seq_len = int(sampling_rate * sample_len_s)
        self.layer_norm = LayerNorm((est_channels, self.seq_len))
        self.conv = PReLUConv(est_channels, 3 * n_comp * tgt_channels, 3,
                              padding="same")

    def apply(self, params: Params, est: jax.Array, tgt: jax.Array) -> jax.Array:
        """est: (B, T, C_est); tgt: (B, T, C_tgt) or (B, F, C) latent/mel.

        A 4-D tgt (B, C, F, M) — the with_noise_target 2-channel mel — is
        folded channel-major into (B, F, C*M), matching the reference's
        tgt.flatten(start_dim=1, end_dim=-2) on (B, C, M, F) (mdn.py:107-108).
        """
        if tgt.ndim == 4:
            b4, c4, f4, m4 = tgt.shape
            tgt = jnp.transpose(tgt, (0, 2, 1, 3)).reshape(b4, f4, c4 * m4)
        # LayerNorm affine is (C, T) in torch layout -> transpose around it
        e = jnp.swapaxes(est, 1, 2)  # (B, C, T)
        e = self.layer_norm(params["layer_norm"], e)
        e = jnp.swapaxes(e, 1, 2)
        e = self.conv(params["conv"], e)  # (B, T, 3*n_comp*tgt)

        b, t, _ = e.shape
        e = e.reshape(b, t, 3, self.n_comp, self.tgt_channels)
        # Bound the head: a diverged estimate (|mean| huge, sigma -> eps)
        # pushes the NLL to inf and its backward to NaN, which the
        # where-based loss skip in Universe.compute_losses cannot contain
        # (the NaN rides through the grad of the skipped branch).  The
        # reference instead isnan-checks eagerly per step
        # (universe.py:526-539) — no jit analog.  Targets are
        # unit-normalized, so +-1e4 is far outside the sane regime and the
        # clip is inactive in healthy training.
        mean = jnp.clip(e[:, :, 0], -1e4, 1e4)
        sigma = elu2(jnp.clip(e[:, :, 1], -1e4, 1e4), eps=self.sigma_eps)
        alpha = e[:, :, 2]  # (B, T, comp, tgt)

        if self.alpha_per_sample:
            alpha = jnp.mean(alpha, axis=3, keepdims=True)  # avg channels
        else:
            alpha = jnp.mean(alpha, axis=(1, 3), keepdims=True)  # avg chan+time
        alpha = jnp.maximum(alpha, -10.0)
        log_alpha = jax.nn.log_softmax(alpha, axis=2)

        tg = tgt[:, :, None, :]  # (B, T, 1, tgt)
        log_p = -0.5 * jnp.square((tg - mean) / sigma)
        log_p = log_p - jnp.log(math.sqrt(2.0 * math.pi) * sigma)
        log_p = log_p + log_alpha
        log_p = jnp.sum(log_p, axis=(1, 3))  # (B, comp)
        nll = -jax.nn.logsumexp(log_p, axis=-1) / (t * self.tgt_channels)

        if self.reduction == "mean":
            return jnp.mean(nll)
        if self.reduction == "sum":
            return jnp.sum(nll)
        return nll

    @staticmethod
    def sample(key, logit, mean, std, random=True):
        """Sample from the mixture; shapes as reference mdn.py:127-157.

        logit: (B, comp, T); mean/std: (B, comp, D, T) -> (B, D, T).
        """
        b, n_comp, d = mean.shape[:3]
        if random:
            k1, k2 = jax.random.split(key)
            idx = jax.random.categorical(
                k1, jnp.swapaxes(logit, 1, 2), axis=-1)  # (B, T)
            idx4 = jnp.broadcast_to(idx[:, None, None, :], (b, 1, d, idx.shape[-1]))
            z = jax.random.normal(k2, (b, 1, d, idx.shape[-1]), mean.dtype)
            out = z * jnp.take_along_axis(std, idx4, 1) + jnp.take_along_axis(
                mean, idx4, 1)
            return out[:, 0]
        idx = jnp.argmax(logit, axis=1)  # (B, T)
        idx4 = jnp.broadcast_to(idx[:, None, None, :], (b, 1, d, idx.shape[-1]))
        return jnp.take_along_axis(mean, idx4, 1)[:, 0]
