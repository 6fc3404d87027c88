"""Exponential moving average of model parameters.

Replaces torch_ema's store/copy_to/restore dance (reference universe.py:
841-865) with a second pytree: evaluation simply *uses* the EMA tree.
Matches torch_ema's update rule with use_num_updates=True:
    decay_t = min(decay, (1 + t) / (10 + t))
    shadow  = shadow - (1 - decay_t) * (shadow - param)
Only the model sub-trees (score/conditioner/decoupling) are tracked; loss
modules are excluded, like the reference's model_parameters().
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def ema_init(params: Dict[str, Any], keys: Sequence[str]):
    shadow = {k: jax.tree_util.tree_map(jnp.copy, params[k]) for k in keys
              if k in params}
    return {"shadow": shadow, "num_updates": jnp.zeros((), jnp.int32)}


def ema_update(ema_state, params, decay: float):
    t = ema_state["num_updates"] + 1
    d = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - d) * (s - p),
        ema_state["shadow"],
        {k: params[k] for k in ema_state["shadow"]},
    )
    return {"shadow": shadow, "num_updates": t}


def ema_apply(params, ema_state):
    """Return params with the EMA shadow swapped in (for evaluation)."""
    out = dict(params)
    out.update(ema_state["shadow"])
    return out
