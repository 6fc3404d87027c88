"""Optimizers, LR schedules, gradient clipping.

Reproduces the reference's training recipe with optax:
  * LinearWarmupCosineAnnealingLR (reference utils/schedulers.py:25-97):
    linear warmup eta_min -> base over T_warmup, flat until T_cosine, cosine
    to eta_min at T_max.
  * AdamW with name-based weight-decay exclusion (universe.py:746-772).
  * FixedClipper / AutoClipper (utils/autoclip_module.py) — the AutoClip
    percentile uses a fixed-size ring buffer of gradient-norm history so it
    stays jittable (the reference keeps an unbounded Python list).
"""
from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def linear_warmup_cosine_annealing(base_lr: float, t_warmup: int, t_cosine: int,
                                   t_max: int, eta_min: float = 0.0):
    """optax schedule matching LinearWarmupCosineAnnealingLR."""

    def schedule(step):
        # Clamp past T_max: the reference's torch recursion (inherited
        # CosineAnnealingLR, schedulers.py:79-97) OSCILLATES beyond T_max,
        # but that region is outside its own asserted contract
        # (T_warmup < T_cosine < T_max and Lightning stops at max_steps);
        # holding eta_min is the sane behavior for runs extended past the
        # schedule horizon.
        step = jnp.minimum(jnp.asarray(step, jnp.float32), float(t_max))
        warm = eta_min + (base_lr - eta_min) * step / max(t_warmup, 1)
        denom = max(t_max - t_cosine, 1)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos((step - t_cosine) * math.pi / denom))
        lr = jnp.where(step <= t_warmup, warm,
                       jnp.where(step <= t_cosine, base_lr, cos))
        return lr

    return schedule


def gan_scheduler_units(step: int, freeze_step: int = 0) -> int:
    """Scheduler units consumed by the GAN trainer at train step `step`.

    The reference steps BOTH LR schedulers once per optimization step
    (universe_gan.py:301-302), so with the discriminator active each train
    step advances the shared schedule by 2 units; during the disc-freeze
    phase (universe_gan.py:221) only the post-generator step happens (1
    unit).  Trainer._build_schedule evaluates the generator LR at
    ``sched(min(i, F) + 2*max(i - F, 0) [+1])`` — this helper is the inverse
    planning map: given a target TRAIN step, it returns the scheduler-unit
    horizon (T_warmup / T_cosine / T_max) that makes the schedule event land
    there.  Use it to derive horizons instead of hand-multiplying by 2
    (the r4c/r4d soaks hand-converted and started their cosine 12.5k train
    steps late — notes/soak_r4c).
    """
    if freeze_step <= 0:
        return 2 * step
    if step <= freeze_step:
        return step
    return freeze_step + 2 * (step - freeze_step)


def wd_mask_from_exclude(params, exclude: Sequence[str]):
    """True where weight decay applies; excludes paths containing any keyword.

    Mirrors the reference's name-based exclusion (default: ['prelu', 'bias']);
    our PReLU slope leaves live under a 'prelu' subtree and biases are named
    'bias', so torch name semantics carry over.
    """

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + "." + k) for k, v in tree.items()}
        return not any(kw in path for kw in exclude)

    return walk(params, "")


def adamw(learning_rate, betas=(0.8, 0.99), weight_decay=0.01,
          weight_decay_exclude=("prelu", "bias"), params=None,
          trainable_mask=None):
    """AdamW with weight-decay masking and optional frozen (buffer) leaves."""
    txs = [
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
    ]
    if weight_decay and params is not None:
        mask = wd_mask_from_exclude(params, list(weight_decay_exclude))
        txs.append(optax.add_decayed_weights(weight_decay, mask=mask))
    elif weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    tx = optax.chain(*txs)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree_util.tree_map(
                lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


class FixedClipper:
    def __init__(self, max_norm: float):
        self.max_norm = max_norm

    def init(self):
        return ()

    def __call__(self, grads, state):
        gnorm = global_norm(grads)
        scale = jnp.minimum(1.0, self.max_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        return grads, state, gnorm, jnp.asarray(self.max_norm, jnp.float32)


class AutoClipper:
    """AutoClip (Seetharaman et al. 2020) with a ring-buffer history."""

    def __init__(self, p: float, history_size: int = 10000):
        self.p = p / 100.0
        self.history_size = history_size

    def init(self):
        return {
            "history": jnp.full((self.history_size,), jnp.inf, jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def __call__(self, grads, state):
        gnorm = global_norm(grads)
        idx = state["count"] % self.history_size
        history = state["history"].at[idx].set(gnorm)
        count = state["count"] + 1
        n = jnp.minimum(count, self.history_size)
        # percentile over the filled part: sort (inf padding goes last)
        srt = jnp.sort(history)
        rank = jnp.clip((self.p * n).astype(jnp.int32), 0, n - 1)
        clip_norm = srt[rank]
        scale = jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        return grads, {"history": history, "count": count}, gnorm, clip_norm


def make_clipper(cfg: Optional[dict]):
    if cfg is None:
        return None
    if "max_norm" in cfg:
        return FixedClipper(cfg["max_norm"])
    if "p" in cfg:
        return AutoClipper(cfg["p"], cfg.get("history_size", 10000))
    raise ValueError(f"unknown clipper config {cfg}")


def clip_subtree_by_norm(grads: Dict[str, Any], keys: Sequence[str],
                         max_norm: float):
    """Clip the grads of the given top-level subtrees to max_norm (like
    torch.nn.utils.clip_grad_norm_ per submodule in universe_gan.py:222-297)."""
    sub = {k: grads[k] for k in keys if k in grads}
    gnorm = global_norm(sub)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-12))
    out = dict(grads)
    for k in keys:
        if k in out:
            out[k] = jax.tree_util.tree_map(lambda g: g * scale, out[k])
    return out, gnorm
