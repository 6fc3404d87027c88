"""Pallas TPU kernels for the hot compute paths.

Kernels are used automatically on the TPU backend for eligible inference
configurations; `enable(False)` forces the pure-XLA path, `enable(True,
interpret=True)` runs the kernels in interpreter mode (CPU testing).
"""
import jax

_STATE = {"enabled": None, "interpret": False}


def enable(flag: bool = True, interpret: bool = False):
    _STATE["enabled"] = flag
    _STATE["interpret"] = interpret


def enabled() -> bool:
    # Off by default: the fused ConvBlock kernel is numerically verified on
    # TPU but not yet faster than XLA end-to-end (the manual-DMA halo path
    # serializes DMA against compute and the pack/unpack pads add traversals).
    # A pipelined redesign (double-buffered halo windows) is planned; enable
    # explicitly to experiment.
    if _STATE["enabled"] is not None:
        return _STATE["enabled"]
    return False


def interpret() -> bool:
    return _STATE["interpret"]
