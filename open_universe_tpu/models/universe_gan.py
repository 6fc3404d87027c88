"""UNIVERSE++ : adversarially trained UNIVERSE (reference universe_gan.py).

Replaces the MDN losses with MPD+MRD discriminators, an L1 mel loss, an
optional warmed-up auxiliary loss, and a snake-activated 1x1 "signal
decoupling" conv that turns conditioner features into a waveform.

The two-optimizer Lightning choreography becomes three pure functions used
by the training loop (open_universe_tpu/train/gan.py):

  generator_forward   -- one forward of score+conditioner nets
  discriminator_loss  -- LSGAN disc loss on (target, stop_grad(y_est))
  generator_loss      -- score MSE + 45*mel L1 + aux + gen/fm losses

The reference updates the discriminator *before* computing the generator's
adversarial terms, so the generator sees the just-updated discriminator; the
training loop reproduces that ordering with a jax.vjp pullback (a single
generator forward per step, like torch).

Reference quirk fixed (not copied): the torch version registers the MRD
parameters twice in the discriminator optimizer and never optimizes the MPD
(universe_gan.py:415-417); here both discriminators are trained.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.blocks import PReLUConv
from ..nn.module import Params
from ..utils.params import at_least_f32
from .discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from .universe import Universe


class UniverseGAN(Universe):
    def init_losses(self):
        lk = self.losses_kwargs
        self.loss_mpd = MultiPeriodDiscriminator(
            lk.get("multi_period_discriminator", {}))
        self.loss_mrd = MultiResolutionDiscriminator(
            lk.get("multi_resolution_discriminator", {}))

        if lk.get("use_signal_decoupling", False):
            self.signal_decoupling_layer = PReLUConv(
                self.n_channels, 1, 3, padding="same",
                act_type=lk.get("signal_decoupling_act", None))
        else:
            self.signal_decoupling_layer = None

        self.disc_freeze_step = lk.get("disc_freeze_step", 0)
        self.loss_aux = lk.get("aux_loss_module", None)  # optional Module/callable

    def model_param_keys(self):
        keys = ["score_model", "condition_model"]
        if self.signal_decoupling_layer is not None:
            keys.append("signal_decoupling_layer")
        return tuple(keys)

    def optimized_param_keys(self):
        """Generator sub-trees the optimizer actually updates.

        Reference quirk PRESERVED: ``configure_optimizers`` collects only
        score+condition parameters (universe_gan.py:388), so the
        signal_decoupling_layer is applied in the forward but never
        optimized — it stays at init forever (the published checkpoints
        were trained that way).  EMA still shadows it (``model_parameters``
        includes it, universe_gan.py:136-143); the EMA of a constant is the
        constant, so shadow ordering and values both match.
        """
        return ("score_model", "condition_model")

    def disc_param_keys(self):
        return ("loss_mpd", "loss_mrd")

    def aux_to_wav(self, params: Params, y_aux):
        if self.signal_decoupling_layer is not None:
            return self.signal_decoupling_layer(
                params["signal_decoupling_layer"], y_aux)
        return y_aux

    # --------------------------------------------------------------- GAN parts
    def generator_forward(self, params: Params, key, mix, target,
                          target_original, pr_cum=None, bins=None):
        """One forward pass of the generator nets.

        Inputs are already normalized.  Returns everything the GAN losses
        need; gradients flow to generator params only.  With
        training.compute_dtype=bf16 the networks run in bfloat16 (losses and
        parameters stay float32 — mixed precision).
        """
        dt = self._train_dtype()
        if dt is not None:
            keys = [k for k in self.model_param_keys() if k in params]
            params = {**params,
                      **{k: self._cast_tree(params[k], dt) for k in keys}}
            mix = mix.astype(dt)
            target = target.astype(dt)
        k_sigma, k_noise = jax.random.split(key)
        tp = params.get("transform", {})
        mix_t = self.transform(tp, mix)
        target_t = self.transform(tp, target)

        sigma, time = self.sample_sigma(
            k_sigma, mix.shape[0], self.train_kwargs["time_sampling"], 0.0, 1.0,
            pr_cum=pr_cum, bins=bins)
        z = jax.random.normal(k_noise, target_t.shape, target_t.dtype)
        # keep sigma in the network compute dtype through x_t and the score
        # net: an f32 sigma would promote x_t -- and with it the whole score
        # U-Net -- to f32 even under compute_dtype=bf16 (the loss-side sigma
        # stays f32 via the astype(jnp.float32) on the outputs below)
        sigma_c = sigma.astype(target_t.dtype)
        x_t = target_t + sigma_c[:, None, None] * z

        remat = self.train_kwargs.get("remat", False)
        cond_fn = (jax.checkpoint(self._cond_train)
                   if remat else self._cond_train)
        score_fn = jax.checkpoint(self.score) if remat else self.score

        cond, y_est, _ = cond_fn(params["condition_model"], mix_t, mix_t)
        if self.detach_cond:
            cond = [jax.lax.stop_gradient(c) for c in cond]

        score = score_fn(params, x_t, sigma_c, cond)

        if self.signal_decoupling_layer is not None:
            y_est = self.signal_decoupling_layer(
                params["signal_decoupling_layer"], y_est)
        y_est = self.transform(tp, y_est, inv=True)

        mel_y_est = self.condition_model.input_mel.compute_mel_spec(y_est)
        mel_target = self.condition_model.input_mel.compute_mel_spec(
            target_original)

        return {
            "y_est": at_least_f32(y_est),
            "score": at_least_f32(score),
            "sigma": at_least_f32(sigma),
            "z": at_least_f32(z),
            "mel_y_est": at_least_f32(mel_y_est),
            "mel_target": at_least_f32(mel_target),
            "time": at_least_f32(time),
        }

    def discriminator_losses(self, disc_params: Params, y_est, target_original):
        """LSGAN discriminator loss; caller stop-gradients y_est."""
        dt = self._train_dtype()
        if dt is not None:
            disc_params = self._cast_tree(disc_params, dt)
            y_est = y_est.astype(dt)
            target_original = target_original.astype(dt)
        y_df_r, y_df_g, _, _ = self.loss_mpd(
            disc_params["loss_mpd"], target_original, y_est)
        loss_f, _, _ = discriminator_loss(
            [at_least_f32(y) for y in y_df_r],
            [at_least_f32(y) for y in y_df_g])
        y_ds_r, y_ds_g, _, _ = self.loss_mrd(
            disc_params["loss_mrd"], target_original, y_est)
        loss_s, _, _ = discriminator_loss(
            [at_least_f32(y) for y in y_ds_r],
            [at_least_f32(y) for y in y_ds_g])
        loss = loss_f + loss_s
        return loss, {"train/loss_disc": loss, "train/loss_mpd": loss_f,
                      "train/loss_mrd": loss_s}

    def generator_losses(self, disc_params: Params, gen_out: Dict[str, Any],
                         target_original, step, adversarial_on,
                         aux_loss_weight: Optional[jax.Array] = None,
                         adversarial: bool = True):
        """Score MSE + weighted mel L1 + aux + adversarial/feature terms.

        adversarial_on: traced bool (step >= disc_freeze_step).
        aux_loss_weight: traced warmup weight in [0, 1] or None when no aux.
        adversarial: STATIC flag — False omits the MPD/MRD forwards entirely
        (the disc-freeze-phase step function; a traced adversarial_on=False
        alone would still pay the full discriminator compute and gate the
        result to zero).
        """
        w = self.losses_kwargs.get("weights", {})
        sigma = gen_out["sigma"]
        l_score = jnp.mean(
            jnp.square(sigma[:, None, None] * gen_out["score"] + gen_out["z"]))
        loss_mel = jnp.mean(jnp.abs(gen_out["mel_y_est"] - gen_out["mel_target"]))

        if self.loss_aux is not None and aux_loss_weight is not None:
            loss_aux = aux_loss_weight * self.loss_aux(
                gen_out["y_est"], target_original)
        else:
            loss_aux = jnp.zeros((), l_score.dtype)

        if adversarial:
            y_est = gen_out["y_est"]
            dt = self._train_dtype()
            if dt is not None:
                disc_params = self._cast_tree(disc_params, dt)
                y_est = y_est.astype(dt)
                target_original = target_original.astype(dt)

            def _f32(seq):
                return [jax.tree_util.tree_map(at_least_f32, s) for s in seq]

            y_df_r, y_df_g, fmap_f_r, fmap_f_g = self.loss_mpd(
                disc_params["loss_mpd"], target_original, y_est)
            loss_fm_f = feature_loss(_f32(fmap_f_r), _f32(fmap_f_g))
            loss_gen_f, _ = generator_loss(_f32(y_df_g))

            y_ds_r, y_ds_g, fmap_s_r, fmap_s_g = self.loss_mrd(
                disc_params["loss_mrd"], target_original, y_est)
            loss_fm_s = feature_loss(_f32(fmap_s_r), _f32(fmap_s_g))
            loss_gen_s, _ = generator_loss(_f32(y_ds_g))
        else:
            zero = jnp.zeros((), l_score.dtype)
            loss_fm_f = loss_gen_f = loss_fm_s = loss_gen_s = zero

        loss = (l_score * w.get("score", 1.0)
                + loss_mel * w.get("mel_l1", 45.0)
                + loss_aux * w.get("aux", 1.0))
        adv = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f
        loss = loss + jnp.where(adversarial_on, adv, 0.0)

        metrics = {
            "train/loss_gen": loss, "train/score": l_score,
            "train/signal_mel": loss_mel, "train/signal_aux": loss_aux,
            "train/mrd_fm": loss_fm_s, "train/mpd_fm": loss_fm_f,
            "train/mrd_gen": loss_gen_s, "train/mpd_gen": loss_gen_f,
            "train/time_mean": jnp.mean(gen_out["time"]),
        }
        return loss, metrics
