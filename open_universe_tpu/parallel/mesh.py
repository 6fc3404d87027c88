"""Device mesh and sharding helpers.

Data parallelism is the reference's only strategy (Lightning DDP over NCCL,
SURVEY.md §2.b); here it becomes a jax.sharding.Mesh with a 'dp' axis: the
batch is sharded over 'dp', parameters are replicated, and GSPMD emits the
gradient psum over ICI.  A 'tp' axis is reserved for tensor-sharded variants
(channel sharding of the widest conv/GRU layers).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              axis_names: Tuple[str, str] = ("dp", "tp")) -> Mesh:
    devices = jax.devices()
    if dp is None:
        dp = len(devices) // tp
    if dp * tp > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def param_sharding(mesh: Mesh, leaf, min_last: int = 128) -> NamedSharding:
    """Tensor-parallel placement rule for one parameter/optimizer leaf.

    Wide matrices/kernels (last axis = output channels >= ``min_last`` and
    divisible by the tp size) are sharded over 'tp'; everything else is
    replicated.  GSPMD then inserts the activation collectives.  The same
    rule covers optimizer moments and EMA shadows since they share the
    parameter shapes."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("tp", 1)
    if (tp > 1 and hasattr(leaf, "ndim") and leaf.ndim >= 2
            and leaf.shape[-1] >= min_last and leaf.shape[-1] % tp == 0):
        return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + ["tp"])))
    return NamedSharding(mesh, P())


def _tp_excluded(path) -> bool:
    """Leaves that must stay replicated even when wide.

    LayerNorm-style elementwise (C, T) affine weights trigger an XLA GSPMD
    backward miscompilation when sharded on their last axis: the gradient of
    a DOWNSTREAM (fully replicated!) conv kernel comes back scaled by the dp
    axis size (measured 4x on a dp=4 x tp=2 CPU mesh, finite-difference
    verified; minimal repro = layernorm(w sharded on T) -> conv -> mixture
    NLL, jax 0.9.0).  Sharding an elementwise multiplier buys nothing
    anyway — it saves no FLOPs and no interesting memory — so exclude it."""
    return any(getattr(k, "key", None) == "layer_norm" for k in path)


def shard_params(mesh: Mesh, tree, min_last: int = 128):
    """Place a parameter-shaped pytree: tp-shard wide matmul/conv leaves,
    replicate the rest.  With tp=1 this is exactly ``replicate``."""

    def place(path, x):
        if _tp_excluded(path):
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, param_sharding(mesh, x, min_last))

    return jax.tree_util.tree_map_with_path(place, tree)


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should load (multi-host input)."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n != 0:
        # a silent remainder would mean one sample of every global batch is
        # never loaded by any host (and the assembled batch misses the
        # jitted step's traced shape)
        raise ValueError(
            f"global batch {global_batch} must be divisible by the "
            f"process count {n}")
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
