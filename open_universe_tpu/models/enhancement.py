"""Generic (non-diffusion) enhancement model wrapper
(reference networks/enhancement/base.py EnhancementBaseModel).

Trains any predictive waveform->waveform Module with a weighted multi-loss
dictionary; enhancement normalizes, applies the model, and denormalizes.
UniverseLoRA follows the same training surface (see universe_lora.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .. import utils
from ..nn.module import Module, Params


class EnhancementBaseModel(Module):
    def __init__(self, fs, normalization_norm=2, model: Optional[Module] = None,
                 losses: Optional[dict] = None, training: Optional[dict] = None,
                 validation: Optional[dict] = None, optimizer: Optional[dict] = None,
                 scheduler: Optional[dict] = None, grad_clipper: Optional[dict] = None,
                 normalization_kwargs: Optional[dict] = None):
        from ..configs.registry import instantiate

        self.fs = fs
        self.normalization_norm = normalization_norm
        self.normalization_kwargs = normalization_kwargs or {}
        self.train_kwargs = dict(training or {})
        self.val_kwargs = dict(validation or {})
        self.opt_kwargs = optimizer
        self.schedule_kwargs = scheduler
        self.grad_clip_kwargs = grad_clipper

        self.model = model if isinstance(model, Module) else instantiate(model)

        # weighted multi-loss config: {name: {weight, kwargs}} or single target
        self.losses_weights: Dict[str, float] = {}
        self.losses_func: Dict[str, Any] = {}
        loss_cfg = losses or {}
        if "_target_" in loss_cfg:
            self.losses_func["loss"] = instantiate(loss_cfg)
            self.losses_weights["loss"] = 1.0
        else:
            for name, cfg in loss_cfg.items():
                if cfg is None:  # <name>=null disables a configured loss
                    continue
                if isinstance(cfg, dict) and "_target_" in cfg:
                    self.losses_func[name] = instantiate(cfg)
                    self.losses_weights[name] = 1.0
                elif isinstance(cfg, dict):
                    self.losses_func[name] = instantiate(cfg.get("kwargs"))
                    self.losses_weights[name] = cfg.get("weight", 1.0)
                else:
                    self.losses_func[name] = cfg
                    self.losses_weights[name] = 1.0

    def model_param_keys(self):
        return ("model",)

    def normalize_batch(self, batch, norm=None):
        if norm is None:
            norm = self.normalization_norm
        return utils.normalize_batch(batch, norm=norm,
                                     **self.normalization_kwargs)

    def forward(self, params: Params, x: jax.Array) -> jax.Array:
        ret = self.model(params["model"], x)
        if isinstance(ret, (list, tuple)):
            ret = ret[0]
        if ret.shape[1] < x.shape[1]:
            ret = jnp.pad(ret, ((0, 0), (0, x.shape[1] - ret.shape[1]), (0, 0)))
        return ret

    def compute_losses(self, params: Params, enh, target):
        loss = jnp.zeros(())
        losses = {}
        for name, fn in self.losses_func.items():
            losses[name] = fn(enh, target)
            loss = loss + self.losses_weights[name] * losses[name]
        return loss, losses

    def training_losses(self, params: Params, key, mix, target):
        if self.train_kwargs.get("dynamic_mixing", False):
            noise = mix - target
            perm = jax.random.permutation(key, mix.shape[0])
            mix = target + noise[perm]
        (mix, target), *_ = self.normalize_batch((mix, target))
        enh = self.forward(params, mix)
        loss, losses = self.compute_losses(params, enh, target)
        metrics = {"train/main_loss": loss}
        metrics.update({f"train/{k}": v for k, v in losses.items()})
        return loss, metrics

    def validation_losses(self, params: Params, key, mix, target):
        """Validation losses (reference enhancement/base.py:382-407):
        normalized forward + compute_losses, without the train-only
        dynamic-mixing augmentation."""
        del key
        (mix, target), *_ = self.normalize_batch((mix, target))
        enh = self.forward(params, mix)
        loss, losses = self.compute_losses(params, enh, target)
        metrics = {"val/main_loss": loss}
        metrics.update({f"val/{k}": v for k, v in losses.items()})
        return loss, metrics

    def enhance(self, params: Params, mix, key=None, keep_rms: bool = False):
        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]
        mix_rms = jnp.sqrt(jnp.mean(mix**2, axis=(-2, -1), keepdims=True))
        (x, _), mean, std = utils.normalize_batch((mix, None))
        x = self.forward(params, x)
        x = utils.denormalize_batch(x, mean, std)
        if keep_rms:
            x_rms = jnp.sqrt(jnp.mean(x**2, axis=(-2, -1), keepdims=True))
            x = x * mix_rms / jnp.maximum(x_rms, 1e-5)
        scale = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        x = jnp.where(scale > 1.0, x / scale, x)
        if x_ndim == 1:
            return x[0, :, 0]
        if x_ndim == 2:
            return x[:, :, 0]
        return x
