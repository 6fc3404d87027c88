"""LoRA fine-tuning of a pretrained UNIVERSE(++) model
(reference networks/universe/lora.py).

Loads a checkpoint (EMA folded in, weight norm removed, loss modules dropped
— keeping MPD/MRD when the pretrained HiFi-GAN loss is reused), injects LoRA
adapters into the score/conditioner convs, freezes everything but the
adapters (+biases), and trains *through the unrolled sampler* with gradients
only in the last ``n_steps_backprop`` steps (jax.lax.stop_gradient replaces
torch.set_grad_enabled).  Optional partial diffusion starts each sample at a
random time t.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from ..nn import lora as lora_lib
from ..nn.module import Module, Params
from .discriminators import feature_loss, generator_loss
from .universe import Universe, randn_sigma


class UniverseLoRA(Module):
    def __init__(
        self,
        model: Union[str, Universe],
        fs: int,
        losses: Optional[dict] = None,
        training: Optional[dict] = None,
        validation: Optional[dict] = None,
        optimizer: Optional[dict] = None,
        scheduler: Optional[dict] = None,
        grad_clipper: Optional[dict] = None,
        diffusion: Optional[dict] = None,
        n_steps_backprop: int = 1,
        use_lora: bool = True,
        use_lora_score: bool = True,
        use_lora_condition: bool = True,
        lora_rank: int = 16,
        lora_alpha: Optional[float] = None,
        lora_train_biases: bool = True,
        lora_train_names: Sequence[str] = (),
        use_hifigan_loss: bool = False,
        use_partial_diffusion: bool = False,
        partial_diffusion_random_steps: bool = False,
        weight_hifigan_loss: float = 1.0,
        base_params: Optional[Params] = None,
    ):
        if n_steps_backprop < 1:
            raise ValueError("n_steps_backprop should be at least 1")

        if isinstance(model, (str,)):
            from ..inference.model_loader import load_model

            model, base_params = load_model(model, load_ema=True, fold_wn=True)
        if fs != model.fs:
            raise ValueError("model fs must match the requested fs")

        self.model = model
        self.fs = fs
        self.n_steps_backprop = n_steps_backprop
        self.diff_kwargs = dict(diffusion or {"n_steps": 8, "epsilon": 1.3})
        self.use_hifigan_loss = use_hifigan_loss
        self.weight_hifigan_loss = weight_hifigan_loss
        self.use_partial_diffusion = use_partial_diffusion
        if partial_diffusion_random_steps:
            # the reference redraws n_steps ~ randint(2, n_steps+1) per call
            # (lora.py:239-242); a data-dependent step count cannot be traced
            # into one jitted train step — fail loudly rather than silently
            # training with a fixed count
            raise NotImplementedError(
                "partial_diffusion_random_steps is not supported in the "
                "jitted training path; train with a fixed diffusion.n_steps "
                "(or alternate n_steps between runs)")
        self.partial_diffusion_random_steps = partial_diffusion_random_steps
        self.train_kwargs = dict(training or {})
        self.val_kwargs = dict(validation or {})
        self.opt_kwargs = optimizer
        self.schedule_kwargs = scheduler
        self.grad_clip_kwargs = grad_clipper
        self.normalization_norm = model.normalization_norm
        self.normalization_kwargs = model.normalization_kwargs

        self.use_lora = use_lora
        self.use_lora_score = use_lora_score
        self.use_lora_condition = use_lora_condition
        self.lora_rank = lora_rank
        self.lora_alpha = lora_alpha
        self.lora_train_biases = lora_train_biases
        self.lora_train_names = list(lora_train_names)

        # configure the fine-tuning losses {name: {weight, kwargs}}
        self.losses_weights: Dict[str, float] = {}
        self.losses_func: Dict[str, Any] = {}
        from ..configs.registry import instantiate

        for name, cfg in (losses or {}).items():
            if cfg is None:
                # `model.losses.<name>=null` disables a configured loss (our
                # composer has no hydra `~key` deletion); useful to drop the
                # HF-gated phoneme loss offline
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

        self._base_params = self._fix_params(base_params) \
            if base_params is not None else None

    # ------------------------------------------------------------------
    def _fix_params(self, base_params: Params) -> Params:
        """Drop loss-module weights (keep MPD/MRD for the hifigan loss) and
        inject LoRA adapters (reference lora.py:141-158, 111-121)."""
        keep = set(self.model.model_param_keys()) | {"transform"}
        if self.use_hifigan_loss:
            keep |= {"loss_mpd", "loss_mrd"}
        params = {k: v for k, v in base_params.items() if k in keep}

        if self.use_lora:
            if self.use_lora_score:
                params["score_model"] = lora_lib.inject(
                    self.model.score_model, params["score_model"],
                    self.lora_rank, self.lora_alpha, key=jax.random.key(0))
            if self.use_lora_condition:
                params["condition_model"] = lora_lib.inject(
                    self.model.condition_model, params["condition_model"],
                    self.lora_rank, self.lora_alpha, key=jax.random.key(1))
        return params

    def init(self, key) -> Params:
        if self._base_params is None:
            base = self.model.init(key)
            self._base_params = self._fix_params(base)
        return {"model": self._base_params}

    def trainable_mask(self, params: Params) -> Params:
        return lora_lib.trainable_mask_lora(
            params, train_biases=self.lora_train_biases,
            train_names=self.lora_train_names)

    def model_param_keys(self):
        return ("model",)

    def normalize_batch(self, batch, norm=None):
        return self.model.normalize_batch(batch, norm=norm)

    def merge_lora(self, params: Params) -> Params:
        """Fold adapters into plain weights (for export / fast inference)."""
        p = dict(params["model"])
        if self.use_lora_score:
            p["score_model"] = lora_lib.remove(self.model.score_model,
                                               p["score_model"])
        if self.use_lora_condition:
            p["condition_model"] = lora_lib.remove(self.model.condition_model,
                                                   p["condition_model"])
        return p

    # ------------------------------------------------------------------
    def forward(self, params: Params, mix: jax.Array,
                key: Optional[jax.Array] = None,
                n_steps: Optional[int] = None, epsilon: Optional[float] = None,
                keep_rms: bool = False) -> jax.Array:
        """Unrolled sampler with gradient gating (reference lora.py:300-397)."""
        if key is None:
            key = jax.random.key(0)
        if epsilon is None:
            epsilon = self.diff_kwargs.get("epsilon", 1.3)
        if n_steps is None:
            n_steps = self.diff_kwargs.get("n_steps", 8)

        m = self.model
        mp = params["model"]
        tp = mp.get("transform", {})

        x_ndim = mix.ndim
        if x_ndim == 1:
            mix = mix[None, :, None]
        elif x_ndim == 2:
            mix = mix[:, :, None]

        if self.use_partial_diffusion:
            x = self._partial_diffusion(mp, mix, key, n_steps, epsilon)
        else:
            mix_rms = jnp.sqrt(jnp.mean(mix**2, axis=(-2, -1), keepdims=True))
            mix_len = mix.shape[1]
            mix_p, pad = m.pad(mix)
            (mix_n, _), *_ = m.normalize_batch((mix_p, None))
            mix_wav = mix_n
            mix_t = m.transform(tp, mix_n)

            delta_t = 1.0 / (n_steps - 1)
            gamma = (m.diff_kwargs["sigma_max"]
                     / m.diff_kwargs["sigma_min"]) ** (-delta_t)
            eta = 1.0 - gamma**epsilon
            beta = math.sqrt(1.0 - gamma ** (2.0 * (epsilon - 1.0)))

            time = jnp.linspace(0.0, 1.0, n_steps)[::-1]
            sigma = m.get_std_dev(time).astype(mix_t.dtype)
            bsz = mix_t.shape[0]

            cond, aux_signal, _ = m.condition_model(
                mp["condition_model"], mix_t, x_wav=mix_wav, train=True)

            key, k0 = jax.random.split(key)
            x = randn_sigma(k0, mix_t.shape, jnp.broadcast_to(sigma[0], (bsz,)))

            for n in range(n_steps - 1):
                key, ks = jax.random.split(key)
                s_now = jnp.broadcast_to(sigma[n], (bsz,))
                score = m.score(mp, x, s_now, cond)
                z = jax.random.normal(ks, x.shape, x.dtype) * sigma[n + 1]
                x = x + sigma[n] ** 2 * eta * score + beta * z
                if n < n_steps - self.n_steps_backprop:
                    x = jax.lax.stop_gradient(x)

            s_last = jnp.broadcast_to(sigma[-1], (bsz,))
            score = m.score(mp, x, s_last, cond)
            # the final score eval always carries gradients: __init__ rejects
            # n_steps_backprop < 1 (reference lora.py asserts the same)
            x = x + sigma[-1] ** 2 * score

            x = m.transform(tp, x, inv=True)
            x = m.unpad(x, pad)
            if x.shape[1] < mix_len:
                x = jnp.pad(x, ((0, 0), (0, mix_len - x.shape[1]), (0, 0)))
            if keep_rms:
                x_rms = jnp.sqrt(jnp.mean(x**2, axis=(-2, -1), keepdims=True))
                x = x * mix_rms / jnp.maximum(x_rms, 1e-5)
            scale = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            x = jnp.where(scale > 1.0, x / scale, x)

        if x_ndim == 1:
            x = x[0, :, 0]
        elif x_ndim == 2:
            x = x[:, :, 0]
        return x

    def _partial_diffusion(self, mp, mix, key, n_steps, epsilon):
        """Per-sample random start time (reference lora.py:231-298)."""
        m = self.model
        tp = mp.get("transform", {})
        k_t, k_x, key = jax.random.split(key, 3)
        bsz = mix.shape[0]

        t_final = jax.random.uniform(k_t, (bsz,))
        delta_t = (1.0 - t_final) / (n_steps - 1)
        (mix_n, _), *_ = m.normalize_batch((mix, None))
        mix_wav = mix_n
        mix_t = m.transform(tp, mix_n)

        ratio = m.diff_kwargs["sigma_max"] / m.diff_kwargs["sigma_min"]
        gamma = ratio ** (-delta_t)
        eta = 1.0 - gamma**epsilon
        beta = jnp.sqrt(1.0 - gamma ** (2.0 * (epsilon - 1.0)))

        time = jnp.ones((bsz,))
        sigma = m.get_std_dev(time)
        cond, *_ = m.condition_model(mp["condition_model"], mix_t,
                                     x_wav=mix_wav, train=True)
        x = randn_sigma(k_x, mix_t.shape, sigma)

        for n in range(n_steps - 1):
            key, ks = jax.random.split(key)
            score = m.score(mp, x, sigma, cond)
            time = time - delta_t
            sigma_next = m.get_std_dev(time)
            z = randn_sigma(ks, x.shape, sigma_next)
            x = (x + (sigma**2 * eta)[:, None, None] * score
                 + beta[:, None, None] * z)
            sigma = sigma_next
            # same gate as the non-partial path above: gradients flow through
            # exactly the last n_steps_backprop score evaluations (reference
            # lora.py:273 set_grad_enabled(n >= n_steps - n_steps_backprop))
            if n < n_steps - self.n_steps_backprop:
                x = jax.lax.stop_gradient(x)

        score = m.score(mp, x, sigma, cond)
        x = x + (sigma**2)[:, None, None] * score
        return m.transform(tp, x, inv=True)

    # ------------------------------------------------------------------
    def hifi_gan_loss(self, params: Params, y_est, target):
        mp = params["model"]
        y_df_r, y_df_g, f_f_r, f_f_g = self.model.loss_mpd(
            mp["loss_mpd"], target, y_est)
        loss_fm_f = feature_loss(f_f_r, f_f_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        y_ds_r, y_ds_g, f_s_r, f_s_g = self.model.loss_mrd(
            mp["loss_mrd"], target, y_est)
        loss_fm_s = feature_loss(f_s_r, f_s_g)
        loss_gen_s, _ = generator_loss(y_ds_g)
        return loss_gen_f, loss_gen_s, loss_fm_f, loss_fm_s

    def compute_losses(self, params: Params, enh, target):
        loss = jnp.zeros(())
        losses = {}
        for name, fn in self.losses_func.items():
            losses[name] = fn(enh, target)
            loss = loss + self.losses_weights[name] * losses[name]
        if self.use_hifigan_loss:
            e = enh[:, :, None] if enh.ndim == 2 else enh
            t = target[:, :, None] if target.ndim == 2 else target
            gf, gs, ff, fs_ = self.hifi_gan_loss(params, e, t)
            loss = loss + self.weight_hifigan_loss * (gf + gs + ff + fs_)
            losses.update({"mpd": gf, "mrd": gs, "mpd_fm": ff, "mrd_fm": fs_})
        return loss, losses

    def training_losses(self, params: Params, key, mix, target):
        k_fwd, _ = jax.random.split(key)
        (mix, target), *_ = self.normalize_batch((mix, target))
        n_steps = self.diff_kwargs.get("n_steps", 8)
        enh = self.forward(params, mix[:, :, 0], key=k_fwd, n_steps=n_steps)
        loss, losses = self.compute_losses(params, enh, target[:, :, 0])
        metrics = {"train/main_loss": loss}
        metrics.update({f"train/{k}": v for k, v in losses.items()})
        return loss, metrics

    def validation_losses(self, params: Params, key, mix, target):
        """Validation = the training objective on the val batch (the
        reference inherits EnhancementBaseModel.validation_step,
        base.py:382-407: normalized forward + compute_losses)."""
        loss, metrics = self.training_losses(params, key, mix, target)
        return loss, {k.replace("train/", "val/", 1): v
                      for k, v in metrics.items()}

    def enhance(self, params: Params, mix, key=None, **kwargs):
        return self.model.enhance(params["model"], mix, key=key, **kwargs)
