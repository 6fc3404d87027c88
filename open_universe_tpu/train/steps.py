"""Jitted training steps (score-only and GAN).

Both steps are pure (state, batch, key) -> (state, metrics) functions meant
to be jit/pjit-compiled over a data-parallel mesh: the batch is sharded on
the 'dp' axis, parameters are replicated, and XLA inserts the gradient
all-reduce (psum over ICI) automatically — this replaces the reference's
Lightning DDP machinery (SURVEY.md §2.b).

The GAN step reproduces the reference ordering (universe_gan.py:151-302):
the discriminator updates first on stop-gradient(y_est); the generator's
adversarial terms are then evaluated against the *updated* discriminator.  A
jax.vjp pullback keeps this at one generator forward per step.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.universe import Universe
from ..models.universe_gan import UniverseGAN
from .ema import ema_init, ema_update
from .optim import clip_subtree_by_norm, global_norm


def init_train_state(model: Universe, params, tx, clipper=None,
                     disc_tx=None) -> Dict[str, Any]:
    ema_decay = model.train_kwargs.get("ema_decay", 0.0)
    gen_keys = list(model.model_param_keys())
    state = {
        "params": params,
        "opt_state": tx.init({k: params[k] for k in gen_keys})
        if disc_tx is not None else tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }
    if disc_tx is not None:
        disc_keys = list(model.disc_param_keys())
        state["disc_opt_state"] = disc_tx.init({k: params[k] for k in disc_keys})
    if clipper is not None:
        state["clip"] = clipper.init()
    if ema_decay > 0.0:
        state["ema"] = ema_init(params, model.model_param_keys())
    return state


def _guard_non_finite(ok, new_state, old_state, metrics):
    """Failure containment (training.nan_guard): when ``ok`` is False the
    whole update is dropped — parameters, optimizer, EMA and clip state roll
    back to ``old_state`` (step still advances so schedules/logging move on)
    and ``train/update_skipped`` is set.  The reference's equivalent is
    ``torch.autograd.set_detect_anomaly`` + breakpoints (train.py:56,
    universe_gan.py:347-352); a production TPU run can't drop into a
    debugger, so a skipped step is the recoverable analog."""
    rolled = jax.tree_util.tree_map(
        lambda n, o: jnp.where(ok, n, o), dict(new_state, step=old_state["step"]),
        old_state)
    rolled["step"] = new_state["step"]
    metrics["train/update_skipped"] = 1.0 - ok.astype(jnp.float32)
    return rolled, metrics


def make_train_step(model: Universe, tx, clipper=None):
    """Score-matching training step (plain UNIVERSE, universe.py:544-586)."""
    import inspect

    ema_decay = model.train_kwargs.get("ema_decay", 0.0)
    nan_guard = model.train_kwargs.get("nan_guard", False)
    # only the diffusion Universe supports adaptive time sampling;
    # UniverseLoRA / EnhancementBaseModel take no pr_cum/bins
    adaptive_ok = "pr_cum" in inspect.signature(
        model.training_losses).parameters

    def train_step(state, batch, key, adaptive=None):
        params = state["params"]
        pr_cum = None if adaptive is None else adaptive["pr_cum"]
        bins = None if adaptive is None else adaptive["bins"]

        def loss_fn(p):
            if not adaptive_ok:
                return model.training_losses(p, key, batch["noisy"],
                                             batch["clean"])
            return model.training_losses(p, key, batch["noisy"], batch["clean"],
                                         pr_cum=pr_cum, bins=bins)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        if clipper is not None:
            grads, clip_state, gnorm, clip_norm = clipper(grads, state["clip"])
            metrics["grad/norm"] = gnorm
            metrics["grad/clipped_norm"] = jnp.minimum(gnorm, clip_norm)
        else:
            clip_state = state.get("clip")
            metrics["grad/norm"] = global_norm(grads)

        updates, opt_state = tx.update(grads, state["opt_state"], params)
        params = optax.apply_updates(params, updates)

        new_state = dict(state)
        new_state["params"] = params
        new_state["opt_state"] = opt_state
        new_state["step"] = state["step"] + 1
        if clipper is not None:
            new_state["clip"] = clip_state
        if ema_decay > 0.0:
            new_state["ema"] = ema_update(state["ema"], params, ema_decay)
        if nan_guard:
            ok = jnp.isfinite(loss) & jnp.isfinite(metrics["grad/norm"])
            new_state, metrics = _guard_non_finite(ok, new_state, state,
                                                   metrics)
        return new_state, metrics

    return train_step


def make_gan_train_step(model: UniverseGAN, tx_gen, tx_disc,
                        grad_clip_vals: Optional[dict] = None,
                        disc_frozen: bool = False):
    """UNIVERSE++ adversarial step (two optimizers, reference ordering).

    disc_frozen: STATIC variant for the warmup phase (step <
    losses.disc_freeze_step) — skips the MPD/MRD forwards, backward and
    optimizer update entirely instead of computing them and where-gating
    the result away (the disc convs are the compute floor of the full
    step).  The Trainer picks between the two compiled functions from the
    host-side step counter."""
    ema_decay = model.train_kwargs.get("ema_decay", 0.0)
    nan_guard = model.train_kwargs.get("nan_guard", False)
    gen_keys = list(model.model_param_keys())
    disc_keys = list(model.disc_param_keys())
    freeze_step = model.disc_freeze_step
    aux_schedule = model.losses_kwargs.get("aux_loss_schedule", {})
    aux_start = aux_schedule.get("start_step", 0)
    aux_warmup = aux_schedule.get("warmup_steps", 0)
    clip_vals = grad_clip_vals or {}

    def train_step(state, batch, key, adaptive=None):
        params = state["params"]
        step = state["step"]
        pr_cum = None if adaptive is None else adaptive["pr_cum"]
        bins = None if adaptive is None else adaptive["bins"]
        k_mix, k_fwd = jax.random.split(key)

        mix, target = batch["noisy"], batch["clean"]
        target_original = batch.get("clean_original", target)
        if model.train_kwargs.get("dynamic_mixing", False):
            noise = mix - target
            perm = jax.random.permutation(k_mix, mix.shape[0])
            mix = target + noise[perm]

        (mix, target, target_original), *_ = model.normalize_batch(
            (mix, target, target_original))

        gen_params = {k: params[k] for k in gen_keys}
        other = {k: v for k, v in params.items() if k not in gen_keys}

        def gfwd(gp):
            return model.generator_forward({**other, **gp}, k_fwd, mix, target,
                                           target_original,
                                           pr_cum=pr_cum, bins=bins)

        gen_out, gen_vjp = jax.vjp(gfwd, gen_params)

        # ---------------- discriminator update (on detached y_est) ----------
        disc_params = {k: params[k] for k in disc_keys}
        if disc_frozen:
            zero = jnp.zeros(())
            l_disc, d_metrics = zero, {}
            gnorm_mpd = gnorm_mrd = zero
            disc_params_new = disc_params
            disc_opt_new = state["disc_opt_state"]
            adv_on = False
        else:
            y_sg = jax.lax.stop_gradient(gen_out["y_est"])

            def dloss(dp):
                return model.discriminator_losses(dp, y_sg, target_original)

            (l_disc, d_metrics), d_grads = jax.value_and_grad(
                dloss, has_aux=True)(disc_params)

            d_grads, gnorm_mpd = clip_subtree_by_norm(
                d_grads, ["loss_mpd"], clip_vals.get("mpd", 1000.0))
            d_grads, gnorm_mrd = clip_subtree_by_norm(
                d_grads, ["loss_mrd"], clip_vals.get("mrd", 1000.0))

            d_updates, disc_opt_new = tx_disc.update(
                d_grads, state["disc_opt_state"], disc_params)
            disc_params_new = optax.apply_updates(disc_params, d_updates)
            if freeze_step > 0:
                # freeze gate: keep old params/opt-state until freeze_step.
                # Statically skipped when freeze_step == 0 (the flagship
                # config): adv_on is then always true and the per-leaf
                # where-trees over the disc params AND optimizer state are
                # pure compile-time weight.
                adv_on = step >= freeze_step
                disc_params_new = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(adv_on, new, old),
                    disc_params_new, disc_params)
                disc_opt_new = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(adv_on, new, old),
                    disc_opt_new, state["disc_opt_state"])
            else:
                adv_on = True

        # ---------------- generator update (vs updated discriminator) -------
        if aux_warmup > 0:
            aux_w = jnp.clip((step - aux_start) / aux_warmup, 0.0, 1.0)
        else:
            aux_w = jnp.where(step >= aux_start, 1.0, 0.0)

        def gloss(go):
            return model.generator_losses(
                jax.lax.stop_gradient(disc_params_new), go, target_original,
                step, adv_on, aux_loss_weight=aux_w,
                adversarial=not disc_frozen)

        (l_gen, g_metrics), g_out_grads = jax.value_and_grad(
            gloss, has_aux=True)(gen_out)
        (g_grads,) = gen_vjp(g_out_grads)

        g_grads, gnorm_score = clip_subtree_by_norm(
            g_grads, ["score_model"], clip_vals.get("score", 1000.0))
        cond_like = [k for k in gen_keys if k != "score_model"]
        g_grads, gnorm_cond = clip_subtree_by_norm(
            g_grads, cond_like, clip_vals.get("cond", 1000.0))

        g_updates, gen_opt_new = tx_gen.update(
            g_grads, state["opt_state"], gen_params)
        gen_params_new = optax.apply_updates(gen_params, g_updates)

        new_params = dict(params)
        new_params.update(gen_params_new)
        new_params.update(disc_params_new)

        new_state = dict(state)
        new_state["params"] = new_params
        new_state["opt_state"] = gen_opt_new
        new_state["disc_opt_state"] = disc_opt_new
        new_state["step"] = step + 1
        if ema_decay > 0.0:
            new_state["ema"] = ema_update(state["ema"], new_params, ema_decay)

        metrics = {**d_metrics, **g_metrics,
                   "grad/score": gnorm_score, "grad/cond": gnorm_cond,
                   "grad/mpd": gnorm_mpd, "grad/mrd": gnorm_mrd}
        if nan_guard:
            ok = (jnp.isfinite(l_disc) & jnp.isfinite(l_gen)
                  & jnp.isfinite(gnorm_score) & jnp.isfinite(gnorm_cond)
                  & jnp.isfinite(gnorm_mpd) & jnp.isfinite(gnorm_mrd))
            new_state, metrics = _guard_non_finite(ok, new_state, state,
                                                   metrics)
        return new_state, metrics

    return train_step
