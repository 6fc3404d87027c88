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


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should load (multi-host input)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
