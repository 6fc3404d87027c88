"""Minimal functional module framework.

Modules are *static* Python objects holding configuration; parameters live in
a separate pytree (nested dicts of jax arrays) created by ``Module.init(key)``
and passed explicitly to ``Module.apply`` (aliased ``__call__``).  This keeps
every forward a pure function — the idiomatic JAX shape for jit/pjit — while
the attribute names deliberately mirror the PyTorch reference's module tree
(e.g. ``params["conv1"]["conv"]["weight"]``) so published torch checkpoints
map onto our parameter pytrees by a pure name-preserving walk
(see open_universe_tpu/inference/torch_convert.py).

Design notes vs torch.nn.Module:
  * no mutable state, no hooks; RNG keys are threaded explicitly
  * buffers (non-trainable leaves like the SigmaBlock's random Fourier
    frequencies) live in the same tree, flagged via ``buffer_names`` so
    optimizers/EMA can mask them out
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


class Module:
    """Base class. Subclasses register children by attribute assignment."""

    def __setattr__(self, name, value):
        if isinstance(value, (Module, ModuleList, ModuleDict)):
            self.__dict__.setdefault("_children", {})[name] = value
        object.__setattr__(self, name, value)

    @property
    def children(self) -> Dict[str, Any]:
        return self.__dict__.get("_children", {})

    # ---- parameters -----------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        """Default: recursively init children. Leaves override."""
        params: Params = {}
        kids = self.children
        if kids:
            keys = jax.random.split(key, len(kids))
            for k, (name, child) in zip(keys, kids.items()):
                p = child.init(k)
                if p:
                    params[name] = p
        return params

    def apply(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)

    # ---- introspection ---------------------------------------------------
    def buffer_names(self) -> List[str]:
        """Leaf names (relative to this module) that are non-trainable."""
        return []

    def named_modules(self, prefix: str = "") -> Iterator[Tuple[str, "Module"]]:
        yield prefix, self
        for name, child in self.children.items():
            sub = f"{prefix}.{name}" if prefix else name
            if isinstance(child, (ModuleList, ModuleDict)):
                for i, m in child.named_items():
                    if m is None:
                        continue
                    yield from m.named_modules(f"{sub}.{i}")
            else:
                yield from child.named_modules(sub)


class ModuleList:
    def __init__(self, mods: Optional[List[Optional[Module]]] = None):
        self.mods: List[Optional[Module]] = list(mods) if mods else []

    def append(self, m: Optional[Module]):
        self.mods.append(m)

    def __iter__(self):
        return iter(self.mods)

    def __len__(self):
        return len(self.mods)

    def __getitem__(self, i):
        return self.mods[i]

    def named_items(self):
        return ((str(i), m) for i, m in enumerate(self.mods))

    def init(self, key: jax.Array) -> Params:
        params: Params = {}
        if not self.mods:
            return params
        keys = jax.random.split(key, len(self.mods))
        for i, (k, m) in enumerate(zip(keys, self.mods)):
            if m is None:
                continue
            p = m.init(k)
            if p:
                params[str(i)] = p
        return params


class ModuleDict:
    def __init__(self, mods: Optional[Dict[str, Module]] = None):
        self.mods: Dict[str, Module] = dict(mods) if mods else {}

    def __getitem__(self, k):
        return self.mods[k]

    def __setitem__(self, k, v):
        self.mods[k] = v

    def items(self):
        return self.mods.items()

    def named_items(self):
        return self.mods.items()

    def init(self, key: jax.Array) -> Params:
        params: Params = {}
        if not self.mods:
            return params
        keys = jax.random.split(key, len(self.mods))
        for k, (name, m) in zip(keys, self.mods.items()):
            p = m.init(k)
            if p:
                params[name] = p
        return params


def count_parameters(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def buffer_mask(module: Module, params: Params) -> Params:
    """Pytree of bools: True where the leaf is TRAINABLE (not a buffer)."""
    buf_paths = set()
    for prefix, mod in module.named_modules():
        for bn in mod.buffer_names():
            buf_paths.add(f"{prefix}.{bn}" if prefix else bn)

    def walk(p, prefix):
        if isinstance(p, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k) for k, v in p.items()}
        return prefix not in buf_paths

    return walk(params, "")
