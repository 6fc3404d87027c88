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
    # TPU (f32 + bf16, all channel widths) but measured ~2x slower than XLA's
    # own fusion of the conv chain at these shapes, even with zero-copy lane
    # packing — the per-tile halo DMA is not overlapped with compute and
    # XLA's conv emitter is strong at C>=32 NWC convs.  Kept as a verified
    # building block; enable explicitly to experiment.
    if _STATE["enabled"] is not None:
        return _STATE["enabled"]
    return False


def interpret() -> bool:
    return _STATE["interpret"]
