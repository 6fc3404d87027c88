"""PyTorch checkpoint -> JAX parameter pytree conversion.

Ingests the reference's published Lightning checkpoints (HF hub layout
``weights.ckpt`` + ``config.yaml``, cf. reference
inference_utils/model_loader.py:62-137).  Our module tree mirrors the torch
module tree by name, so conversion is a name-preserving walk with a fixed
per-layer-type layout transform:

    Conv1d           (Cout, Cin/g, K)   -> (K, Cin/g, Cout)
    ConvTranspose1d  (Cin, Cout, K)     -> flip_K((K, Cin, Cout))
    Conv2d           (Cout, Cin, KH,KW) -> (KH, KW, Cin, Cout)
    Linear / GRU mats                   -> transposed
    weight_g                            -> squeezed to (dim0,)

EMA shadow parameters are stored by the reference as a *list* ordered by
``model_parameters()`` (universe.py:130-133) — registration order of
score_model then condition_model (then signal_decoupling_layer), parameters
only.  We reconstruct that order from the state_dict key order minus buffer
keys (torch serializes each module's parameters before its buffers).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..nn.layers import GRU, Conv1d, Conv2d, ConvTranspose1d, LayerNorm, Linear, PReLU
from ..nn.module import Module
from ..nn.snake import Snake
from ..nn.sigma import SimpleTimeEmbedding

# torch buffer keys that we recompute on the fly (never loaded)
_BUFFER_PATTERNS = (
    re.compile(r"\.low_pass_filter\.weights$"),
    re.compile(r"\.aa\.weights$"),
    re.compile(r"\.mel_spec\."),           # torchaudio MelSpectrogram buffers
    re.compile(r"\.upsample\.kernel$"),    # torchaudio Resample buffers
    re.compile(r"\.downsample\.kernel$"),
    re.compile(r"(^|\.)stft_window$"),
    re.compile(r"st_convs\.\d+\.0\.weights$"),  # Sequential(AA, conv) buffer
)

_SIGMA_FREQ = re.compile(r"sigma_block\.freq$")


def is_buffer_key(key: str) -> bool:
    if _SIGMA_FREQ.search(key):
        return True  # buffer, but one we DO load (random at init)
    return any(p.search(key) for p in _BUFFER_PATTERNS)


def is_skipped_buffer(key: str) -> bool:
    return any(p.search(key) for p in _BUFFER_PATTERNS)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def convert_leaf(module: Module, leaf: str, value: np.ndarray) -> np.ndarray:
    """Transform one torch tensor into our layout for the given leaf module."""
    v = _np(value)
    if isinstance(module, Conv1d):
        if leaf in ("weight", "weight_v"):
            return v.transpose(2, 1, 0)
        if leaf == "weight_g":
            return v.reshape(-1)
        return v
    if isinstance(module, ConvTranspose1d):
        if leaf in ("weight", "weight_v"):
            return np.ascontiguousarray(v.transpose(2, 0, 1)[::-1])
        if leaf == "weight_g":
            return v.reshape(-1)
        return v
    if isinstance(module, Conv2d):
        if leaf in ("weight", "weight_v"):
            return v.transpose(2, 3, 1, 0)
        if leaf == "weight_g":
            return v.reshape(-1)
        return v
    if isinstance(module, Linear):
        if leaf in ("weight", "weight_v"):
            return v.T
        if leaf == "weight_g":
            return v.reshape(-1)
        return v
    if isinstance(module, GRU):
        if leaf.startswith("weight"):
            return v.T
        return v
    # PReLU, Snake, LayerNorm, SimpleTimeEmbedding, manual biases, freq buffer
    return v


def _module_index(model: Module) -> Dict[str, Module]:
    return dict(model.named_modules())


_EDM_PREFIX = re.compile(r"(^|\.)_edm_model\.")


def normalize_key(key: str) -> str:
    """Map reference naming variants onto our tree (the `_edm_model.`
    segment of EDM-wrapped checkpoints lands on our `score_model` subtree —
    at the root for plain Universe checkpoints AND nested, e.g. a reference
    UniverseLoRA's ``model._edm_model.*``; module paths otherwise mirror the
    torch state_dict names one-to-one)."""
    key = _EDM_PREFIX.sub(r"\1score_model.", key)
    return key


def _lookup_module(index: Dict[str, Any], mod_path: str):
    """Find the module owning ``mod_path``, resolving the LoRA nesting: the
    reference wraps layers so the original module's params live under
    ``<path>.conv`` (LoraConv1d/LoraConvTranspose1d) or ``<path>.linear``
    (LoraLinear), while our tree keeps them on the parent module."""
    module = index.get(mod_path)
    if module is None:
        for nest in (".conv", ".linear"):
            if mod_path.endswith(nest):
                parent = index.get(mod_path[: -len(nest)])
                from ..nn.lora import LORA_TYPES

                if isinstance(parent, LORA_TYPES):
                    return parent
    return module


def convert_state_dict(model: Module, state_dict: Dict[str, Any],
                       strict: bool = False):
    """Returns (params, skipped_keys); skipped_keys are recomputed buffers
    (or, with strict=False, keys with no module in our tree)."""
    index = _module_index(model)
    params: Dict[str, Any] = {}
    skipped: List[str] = []

    for key, value in state_dict.items():
        key_n = normalize_key(key)
        if is_skipped_buffer(key_n):
            skipped.append(key)
            continue
        mod_path, _, leaf = key_n.rpartition(".")
        module = _lookup_module(index, mod_path)
        if module is None:
            skipped.append(key)
            if strict:
                raise KeyError(f"no module at {mod_path!r} for key {key!r}")
            continue
        arr = convert_leaf(module, leaf, value)
        node = params
        for part in mod_path.split("."):
            node = node.setdefault(part, {})
        node[leaf] = np.asarray(arr, np.float32)

    return params, skipped


def ordered_param_names(state_dict: Dict[str, Any],
                        submodules: Sequence[str]) -> List[str]:
    """Parameter names in model_parameters() order (universe.py:130-133)."""
    names: List[str] = []
    for sub in submodules:
        prefix = sub + "."
        for key in state_dict:
            if key.startswith(prefix) and not is_buffer_key(key):
                names.append(key)
    return names


def apply_ema_shadow(model: Module, params: Dict[str, Any],
                     state_dict: Dict[str, Any], shadow_params: Sequence[Any],
                     submodules: Sequence[str]):
    """Overwrite params with the EMA shadow list from a torch_ema checkpoint."""
    names = ordered_param_names(state_dict, submodules)
    if len(names) != len(shadow_params):
        raise ValueError(
            f"EMA shadow has {len(shadow_params)} tensors but found "
            f"{len(names)} parameters in {submodules}")
    index = _module_index(model)
    for key, value in zip(names, shadow_params):
        key_n = normalize_key(key)
        mod_path, _, leaf = key_n.rpartition(".")
        module = _lookup_module(index, mod_path)  # incl. LoRA .conv/.linear
        if module is None:
            raise KeyError(f"no module at {mod_path!r} for EMA key {key!r}")
        arr = convert_leaf(module, leaf, value)
        node = params
        for part in mod_path.split("."):
            node = node.setdefault(part, {})
        node[leaf] = np.asarray(arr, np.float32)
    return params


def fold_weight_norm(model: Module, params: Dict[str, Any]):
    """Fold (weight_g, weight_v) -> weight in-place (inference-time opt).

    Folded leaves stay jax arrays (device-resident) — a numpy leaf in the
    param tree is re-uploaded host->device on every jitted call, which on a
    tunneled TPU costs ~2 s/step.  Layers detect folding from the params
    (absence of weight_v), so the module objects are not mutated and one
    model instance can serve folded and unfolded trees."""
    import jax.numpy as jnp

    for path, mod in model.named_modules():
        if not getattr(mod, "weight_norm", False):
            continue
        node = params
        ok = True
        for part in path.split("."):
            if part not in node:
                ok = False
                break
            node = node[part]
        if not ok or "weight_v" not in node:
            continue
        w = mod.weight({k: jnp.asarray(v) for k, v in node.items()
                        if k.startswith("weight")})
        node["weight"] = w
        del node["weight_v"], node["weight_g"]
    return params


def to_torch_leaf(module: Module, leaf: str, value: np.ndarray) -> np.ndarray:
    """Inverse of convert_leaf: our layout -> torch layout."""
    v = np.asarray(value)
    if isinstance(module, Conv1d):
        if leaf in ("weight", "weight_v"):
            return v.transpose(2, 1, 0)
        if leaf == "weight_g":
            return v.reshape(-1, 1, 1)
        return v
    if isinstance(module, ConvTranspose1d):
        if leaf in ("weight", "weight_v"):
            return np.ascontiguousarray(v[::-1].transpose(1, 2, 0))
        if leaf == "weight_g":
            return v.reshape(-1, 1, 1)
        return v
    if isinstance(module, Conv2d):
        if leaf in ("weight", "weight_v"):
            return v.transpose(3, 2, 0, 1)
        if leaf == "weight_g":
            return v.reshape(-1, 1, 1, 1)
        return v
    if isinstance(module, Linear):
        if leaf in ("weight", "weight_v"):
            return v.T
        if leaf == "weight_g":
            return v.reshape(-1, 1)
        return v
    if isinstance(module, GRU):
        if leaf.startswith("weight"):
            return v.T
        return v
    return v


def to_torch_state_dict(model: Module, params: Dict[str, Any],
                        edm: bool = False) -> Dict[str, np.ndarray]:
    """Export our params as a reference-compatible torch state_dict
    (numpy arrays; caller wraps in torch tensors).  With edm=True the score
    model is exported under the reference's ``_edm_model.`` prefix."""
    index = _module_index(model)
    out: Dict[str, np.ndarray] = {}

    def walk(node, path):
        for k, v in node.items():
            sub = f"{path}.{k}" if path else k
            if isinstance(v, dict):
                walk(v, sub)
            else:
                mod_path, _, leaf = sub.rpartition(".")
                module = index.get(mod_path)
                for nest in (".conv", ".linear"):
                    if module is None and mod_path.endswith(nest):
                        from ..nn.lora import LORA_TYPES

                        parent = index.get(mod_path[: -len(nest)])
                        if isinstance(parent, LORA_TYPES):
                            module = parent
                key = sub
                if edm and key.startswith("score_model."):
                    key = "_edm_model." + key[len("score_model."):]
                out[key] = to_torch_leaf(module, leaf, np.asarray(v))

    walk(params, "")
    return out
