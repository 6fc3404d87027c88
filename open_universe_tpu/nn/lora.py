"""LoRA as a parameter-tree transform (reference lora/ package).

Instead of monkey-patching modules (torch), injection restructures the
*parameter pytree*: a lora'd conv node becomes

    {"conv": {original leaves...}, "lora_weight_a": (dim0, r),
     "lora_weight_b": (r, rest)}          # torch LoraConv1d naming/layout

and a lora'd Linear nests under "linear" with lora_linear_a/b leaves,
mirroring the reference's per-type state-dict naming exactly
(lora/lora.py: LoraConv1d .conv/lora_weight_*, LoraLinear
.linear/lora_linear_*) so fine-tuned checkpoints roundtrip.

and the leaf module computes W_eff = W + (alpha/r) * reshape(A @ B) at apply
time (merged-apply; no extra convolutions).  ``remove`` folds the adapters
back into plain weights.  Freezing is a boolean mask pytree for
optax.multi_transform — the functional analog of requires_grad=False.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .layers import Conv1d, ConvTranspose1d, Linear
from .module import Module

LORA_TYPES = (Conv1d, ConvTranspose1d, Linear)


def adapter_names(mod) -> tuple:
    """(nest_key, a_key, b_key) matching the reference state-dict naming:
    Linear wraps the base module under ``.linear`` with ``lora_linear_*``
    leaves (reference lora/lora.py:218-229); convs wrap under ``.conv`` with
    ``lora_weight_*`` (lora.py:54-68)."""
    if isinstance(mod, Linear):
        return "linear", "lora_linear_a", "lora_linear_b"
    return "conv", "lora_weight_a", "lora_weight_b"


def _torch_dims(mod) -> tuple:
    """(dim0, rest) of the torch-layout weight for the adapter shapes."""
    if isinstance(mod, Conv1d):
        return mod.out_channels, (mod.in_channels // mod.groups) * mod.kernel_size
    if isinstance(mod, ConvTranspose1d):
        return mod.in_channels, mod.out_channels * mod.kernel_size
    if isinstance(mod, Linear):
        return mod.out_features, mod.in_features
    raise TypeError(type(mod))


def lora_delta(mod, params: Dict[str, Any]) -> jax.Array:
    """The (alpha/r) * A @ B update in OUR weight layout."""
    _, a_key, b_key = adapter_names(mod)
    a = params[a_key]
    b = params[b_key]
    rank = a.shape[1]
    scale = mod.lora_alpha / rank
    w = (a @ b) * scale  # (dim0, rest) in torch layout
    if isinstance(mod, Conv1d):
        w = w.reshape(mod.out_channels, mod.in_channels // mod.groups,
                      mod.kernel_size)
        return jnp.transpose(w, (2, 1, 0))
    if isinstance(mod, ConvTranspose1d):
        w = w.reshape(mod.in_channels, mod.out_channels, mod.kernel_size)
        return jnp.transpose(w, (2, 0, 1))[::-1]
    return w.T  # Linear


def inject(module: Module, params: Dict[str, Any], rank: int,
           alpha: Optional[float] = None, key: Optional[jax.Array] = None):
    """Add LoRA adapters to every supported leaf under `module`.

    Mutates the module objects (setting .lora_alpha) and returns the new
    params tree.  Layers whose dims are smaller than the rank are skipped,
    like the reference (lora/utils.py:47-69 via ValueError).
    """
    if key is None:
        key = jax.random.key(0)

    def walk(mod, node, key):
        if isinstance(mod, LORA_TYPES):
            d0, rest = _torch_dims(mod)
            # reference requires rank <= min(out, in) (lora.py:60-63)
            cin = (mod.in_channels // getattr(mod, "groups", 1)
                   if not isinstance(mod, Linear) else mod.in_features)
            cout = (mod.out_channels if not isinstance(mod, Linear)
                    else mod.out_features)
            if min(cin, cout) < rank:
                return node
            mod.lora_alpha = float(alpha) if alpha is not None else float(rank)
            nest, a_key, b_key = adapter_names(mod)
            # init conventions differ per type in the reference: convs zero
            # A / normal B (lora.py:65-68), Linear normal A / zero B
            # (lora.py:228-229); either way A@B starts at zero
            if isinstance(mod, Linear):
                a = jax.random.normal(key, (d0, rank), jnp.float32)
                b = jnp.zeros((rank, rest), jnp.float32)
            else:
                a = jnp.zeros((d0, rank), jnp.float32)
                b = jax.random.normal(key, (rank, rest), jnp.float32)
            return {nest: node, a_key: a, b_key: b}
        out = dict(node) if isinstance(node, dict) else node
        for name, child in mod.children.items():
            if hasattr(child, "named_items"):  # ModuleList/Dict
                for i, m in child.named_items():
                    if m is None or name not in out or i not in out[name]:
                        continue
                    key, sub = jax.random.split(key)
                    out[name] = dict(out[name])
                    out[name][i] = walk(m, out[name][i], sub)
            elif name in out:
                key, sub = jax.random.split(key)
                out[name] = walk(child, out[name], sub)
        return out

    return walk(module, params, key)


def remove(module: Module, params: Dict[str, Any]):
    """Fold LoRA updates into the base weights and flatten the tree back."""

    def walk(mod, node):
        if isinstance(mod, LORA_TYPES) and isinstance(node, dict) \
                and adapter_names(mod)[1] in node:
            inner = dict(node[adapter_names(mod)[0]])
            delta = lora_delta(mod, node)
            wkey = "weight_v" if "weight_v" in inner else "weight"
            if wkey == "weight_v":
                raise ValueError("remove weight norm before folding LoRA")
            inner["weight"] = inner["weight"] + delta
            if hasattr(mod, "lora_alpha"):
                del mod.lora_alpha
            return inner
        if not isinstance(node, dict):
            return node
        out = {}
        for name, sub in node.items():
            child = mod.children.get(name)
            if child is None:
                out[name] = sub
                continue
            if hasattr(child, "named_items"):
                out[name] = {i: walk(m, sub[i]) for i, m in child.named_items()
                             if m is not None and i in sub}
            else:
                out[name] = walk(child, sub)
        return out

    return walk(module, params)


def trainable_mask_lora(params: Dict[str, Any], train_biases: bool = True,
                        train_names: Optional[Sequence[str]] = None):
    """Mask pytree: True for lora_* leaves, biases (optional), and any path
    containing one of train_names (lora/utils.py:92-120)."""
    train_names = list(train_names or [])

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + "." + k) for k, v in node.items()}
        leaf = path.rsplit(".", 1)[-1]
        return ("lora_" in leaf
                or any(s in path for s in train_names)
                or (train_biases and "bias" in leaf))

    return walk(params, "")
