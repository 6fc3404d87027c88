"""Parameter-tree and array utilities (reference utils/torch_utils.py).

The reference counts parameters of ``nn.Module``s and moves tensors between
devices; here the equivalents operate on parameter pytrees and jax arrays.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_parameters(params) -> int:
    """Total number of scalar parameters in a pytree
    (reference utils/torch_utils.py:24-28)."""
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(params))


def count_parameters_per_level(params, max_level: int = 2) -> Dict[str, int]:
    """Parameter counts grouped by dotted sub-tree prefix up to ``max_level``
    (reference utils/torch_utils.py:31-43); key "" is the grand total."""
    counts: Dict[str, int] = defaultdict(int)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
        c = int(np.prod(leaf.shape))
        counts[""] += c
        for idx in range(max_level):
            if idx >= len(names):
                break
            counts[".".join(str(n) for n in names[: idx + 1])] += c
    return dict(counts)


def pad_dim_right(a: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast ``a`` over the trailing dimensions of ``x``
    (reference utils/torch_utils.py:70-75)."""
    if a.shape != x.shape[: a.ndim]:
        raise ValueError("All left dimensions of a and x should be matching")
    return a[(...,) + (None,) * (x.ndim - a.ndim)]


def to_device(data: Any, device: str = "cpu", to_numpy: bool = False) -> Any:
    """Recursively move arrays host<->device (reference utils/torch_utils.py:46-67).

    device: "cpu" fetches to host; anything else puts onto the default jax
    device.  ``to_numpy`` additionally converts to numpy arrays.
    """
    if to_numpy and device != "cpu":
        raise ValueError("to_numpy and an accelerator device are not compatible")
    if isinstance(data, (list, tuple)):
        return type(data)(to_device(d, device, to_numpy) for d in data)
    if isinstance(data, dict):
        return {k: to_device(v, device, to_numpy) for k, v in data.items()}
    if isinstance(data, (jax.Array, np.ndarray)):
        if device == "cpu":
            out = jax.device_get(data)
            return np.asarray(out) if to_numpy else out
        return jax.device_put(jnp.asarray(data))
    return data


def at_least_f32(x: jax.Array) -> jax.Array:
    """Promote to float32 unless the input is already wider.

    The mixed-precision boundaries on the training path ("losses stay f32
    while networks run bf16") are expressed with this instead of a hard
    ``astype(float32)`` so that a float64 run (the golden train-dynamics
    parity test runs both frameworks in f64 to separate semantic drift from
    f32 noise) keeps its precision end to end.
    """
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
