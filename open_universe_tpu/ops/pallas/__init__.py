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
    """On by default inside inference scopes on the TPU backend (the fused
    ConvBlock kernel has no custom VJP, so training paths never see it
    unless explicitly enabled); `enable(True/False)` overrides globally.

    The kernel engages only where it beats XLA: C in [128, 256], where the
    lane layout is already MXU-native (measured 1.65x at C=128, 1.14x at
    C=256 vs XLA on v5e, B=128).  For C < 128 the required (B,T,C) ->
    (B,T/P,PC) lane packing is a physical relayout (~2.8 ms per tensor at
    B=128, T=32k) that eats the kernel's win; those levels need the packed-
    layout execution mode (`allow_repack=True` forces them anyway for
    experiments)."""
    if _STATE["enabled"] is not None:
        return _STATE["enabled"]
    if not _STATE.get("inference_depth", 0):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
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
