"""1-D convolution primitives for TPU (channels-last layout).

All ops use the (batch, time, channels) layout, which maps the channel
dimension onto the TPU lane dimension so XLA can tile the implicit GEMMs
onto the MXU.  Semantics (output lengths, transposed-conv length formula,
grouping) match ``torch.nn.Conv1d`` / ``torch.nn.ConvTranspose1d`` so that
checkpoints published for the PyTorch reference implementation
(cf. /root/reference/open_universe/networks/universe/blocks.py) can be
ingested directly after a layout transpose.

Weight layouts:
    conv1d:            (K, Cin // groups, Cout)
    conv_transpose1d:  (K, Cin, Cout)    (already flipped/transposed at load)
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Padding = Union[str, int, Tuple[int, int]]

_DIMNUMS = ("NWC", "WIO", "NWC")


def _norm_padding(padding: Padding, kernel_size: int, dilation: int = 1):
    if isinstance(padding, str):
        if padding == "same":
            eff = dilation * (kernel_size - 1)
            return (eff // 2, eff - eff // 2)
        if padding == "valid":
            return (0, 0)
        raise ValueError(f"unknown padding {padding!r}")
    if isinstance(padding, int):
        return (padding, padding)
    return tuple(padding)


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: Padding = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    """torch.nn.Conv1d semantics; x: (B, T, Cin), w: (K, Cin//groups, Cout)."""
    pad = _norm_padding(padding, w.shape[0], dilation)
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=(pad,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
        # NOTE: no preferred_element_type here — its conv transpose rule
        # produces mixed-dtype convs under autodiff in this JAX version; the
        # TPU MXU accumulates bf16 convolutions in f32 natively anyway.
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jax.Array:
    """torch.nn.ConvTranspose1d semantics.

    x: (B, T, Cin); w: (K, Cin, Cout) stored pre-flipped so that the op is a
    plain fractionally-strided convolution:
        out_len = (T - 1) * stride - 2 * padding + K + output_padding
    The converter maps a torch weight (Cin, Cout, K) to our layout with
    ``w_ours = torch_w.transpose(2, 0, 1)[::-1]`` (flip along K).
    """
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,),
        padding=((lo, hi),),
        lhs_dilation=(stride,),
        dimension_numbers=_DIMNUMS,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv1d_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Apply the same 1-D FIR filter to every channel, 'same' padding.

    x: (B, T, C); kernel: (K,) shared across channels.  Used for the binomial
    anti-aliasing low-pass (blocks.py:119-130 in the reference).
    """
    c = x.shape[-1]
    k = kernel.shape[0]
    w = jnp.broadcast_to(kernel.astype(x.dtype)[:, None, None], (k, 1, c))
    pad = ((k - 1) // 2, k - 1 - (k - 1) // 2)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=(pad,),
        dimension_numbers=_DIMNUMS,
        feature_group_count=c,
    )


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = 1, centered: bool = False):
    """Pad `axis` so its size is a multiple of `multiple` (static shapes).

    Returns (padded, pad_amount).  With centered=True the padding is split
    pad//2 / pad - pad//2 like Universe.pad (universe.py:219-223); note the
    reference always pads by at least 1 sample when already a multiple
    (pad = tot - T % tot yields tot), which we reproduce for parity.
    """
    size = x.shape[axis]
    pad = multiple - size % multiple
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (pad // 2, pad - pad // 2) if centered else (0, pad)
    return jnp.pad(x, cfg), pad


def linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None) -> jax.Array:
    """Dense layer; w: (In, Out) (torch Linear weight transposed at load)."""
    y = jnp.dot(x, w.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
