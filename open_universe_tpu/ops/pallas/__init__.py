"""Pallas TPU kernels for the hot compute paths.

Kernels are used automatically on the TPU backend for eligible inference
configurations; `enable(False)` forces the pure-XLA path, `enable(True,
interpret=True)` runs the kernels in interpreter mode (CPU testing).
"""
import jax

_STATE = {"enabled": None, "interpret": False, "allow_repack": False}


def enable(flag: bool = True, interpret: bool = False, allow_repack: bool = False):
    _STATE["enabled"] = flag
    _STATE["interpret"] = interpret
    _STATE["allow_repack"] = allow_repack


def enabled() -> bool:
    """OFF by default — measured verdict on v5e at inference batch sizes:
    XLA lane-packs these convs by BATCH (layout {0,2,1}, B in the 128-lane
    dim) and fuses the PReLU/FiLM/residual epilogues into its conv fusions
    at ~630 GB/s effective, while the Mosaic grid pipeline sustains ~350
    GB/s here — so the fused chain's 2-3x traffic reduction nets out to a
    loss in-graph (e.g. 1180 -> 985 audio-s/s when auto-enabled in the
    enhance scan).  The kernels are numerically verified at all channel
    widths, including lane-packed rows and non-divisible tails; enable
    explicitly for small-batch regimes where batch-lanes packing starves
    (B < ~32) or for experiments.  A batch-in-lanes kernel variant is the
    open perf item."""
    if _STATE["enabled"] is not None:
        return _STATE["enabled"]
    return False


class inference_scope:
    """Trace-time context: marks the enclosed computation as inference-only,
    letting VJP-less kernels engage (used by Universe.enhance)."""

    def __enter__(self):
        _STATE["inference_depth"] = _STATE.get("inference_depth", 0) + 1
        return self

    def __exit__(self, *exc):
        _STATE["inference_depth"] -= 1
        return False


def interpret() -> bool:
    return _STATE["interpret"]


def allow_repack() -> bool:
    return _STATE["allow_repack"]
