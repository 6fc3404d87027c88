"""Packed-time ("lane-packed") execution for low-channel 1-D conv stacks.

The UNIVERSE networks spend most of their time at shallow levels where
C in {32, 64} — on TPU those channel counts use a quarter/half of the 128
MXU/VPU lanes and force XLA to move huge (B, T, C) activations through HBM
for every op.  The packed representation stores P = 128 // C consecutive
samples in the lane dimension:

    x_rows: (B, T / P, P * C),   lane (p, c) = sample t*P + p, channel c

which is bit-identical memory layout to the (B, T, C) array (the reshape is
free only when producing/consuming ops already use the packed form — a
standalone reshape is a physical relayout costing ~2.8 ms per 262 MB tensor
on v5e).  In packed form every conv becomes an NWC conv over rows with
full-width lanes:

  * 'same' k-tap convs -> block-Toeplitz row convs (see
    ops/pallas/conv_block.py, which fuses whole ConvBlock chains);
  * strided rate-change convs (k, stride s, pad) -> row convs with stride
    m = s*P_out/P_in (pure per-row matmuls when m == 1);
  * transposed rate-change convs -> row transposed-convs with row stride
    m' = s*P_in/P_out;
  * binomial anti-aliasing low-passes fold into the adjacent rate-change
    conv's taps (LPF before a strided conv / after a transposed conv
    compose into a single longer kernel), so they cost nothing.

All builders take weights in this repo's layouts (conv1d: (K, Cin, Cout);
conv_transpose1d: (K, Cin, Cout) stored K-flipped, see ops/conv.py) and
return XLA ops — differentiable, CPU-compatible; the Pallas fused chain is
an optional accelerator on top.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DIMNUMS = ("NWC", "WIO", "NWC")


def pack_factor(c: int, lanes: int = 128) -> int:
    return max(1, lanes // c)


def pack_rows(x: jax.Array, p: int) -> jax.Array:
    """(B, T, C) -> (B, T/P, P*C). A physical relayout when C*itemsize is
    lane-sized; cheap only at network entry/exit where tensors are small."""
    b, t, c = x.shape
    if p == 1:
        return x
    assert t % p == 0, f"T={t} not divisible by pack factor {p}"
    return x.reshape(b, t // p, p * c)


def unpack_rows(x: jax.Array, p: int, c: int) -> jax.Array:
    b, r, pc = x.shape
    if p == 1:
        return x
    assert pc == p * c
    return x.reshape(b, r * p, c)


# ---------------------------------------------------------------------------
# Static selection tensors (numpy, cached) mapping sample taps to row taps
# ---------------------------------------------------------------------------

@lru_cache(maxsize=64)
def _down_selection(k: int, s: int, pad: int, p_in: int, p_out: int
                    ) -> Tuple[np.ndarray, int, int, int]:
    """Selection S[tau, q, p1, p2] for a strided conv in packed space.

    y[P2*r2 + p2] = sum_tau x[s*(P2*r2 + p2) + tau - pad] @ w[tau]
    with in-row stride m = s*P2/P1; returns (S, m, row_pad_left,
    row_kernel_rows)."""
    assert (s * p_out) % p_in == 0, "incompatible pack factors for down conv"
    m = (s * p_out) // p_in
    offs = [s * p2 + tau - pad for p2 in range(p_out) for tau in range(k)]
    qmin = min(o // p_in for o in offs)
    qmax = max(o // p_in for o in offs)
    kr = qmax - qmin + 1
    sel = np.zeros((k, kr, p_in, p_out), np.float32)
    for p2 in range(p_out):
        for tau in range(k):
            o = s * p2 + tau - pad
            sel[tau, o // p_in - qmin, o % p_in, p2] = 1.0
    return sel, m, -qmin, kr


@lru_cache(maxsize=64)
def _up_selection(k: int, s: int, pad: int, p_in: int, p_out: int
                  ) -> Tuple[np.ndarray, int, int, int]:
    """Selection S[tau_flipped, q, p1, p2] for a transposed conv in packed
    space; weights are this repo's pre-flipped layout (our_w[tau] =
    torch_K[k-1-tau]).

    y[g] = sum_{t,kappa: g = s*t + kappa - pad} x[t] @ torch_K[kappa]
    with out-row stride m' = s*P1/P2; returns (S, m', row_pad_left_of_conv,
    row_kernel_rows)."""
    assert (s * p_in) % p_out == 0, "incompatible pack factors for up conv"
    m = (s * p_in) // p_out
    offs = [s * p1 + kap - pad for p1 in range(p_in) for kap in range(k)]
    qmin = min(o // p_out for o in offs)
    qmax = max(o // p_out for o in offs)
    kr = qmax - qmin + 1
    sel = np.zeros((k, kr, p_in, p_out), np.float32)
    for p1 in range(p_in):
        for kap in range(k):
            o = s * p1 + kap - pad
            # our_w index for torch_K[kappa] is k-1-kappa
            sel[k - 1 - kap, o // p_out - qmin, p1, o % p_out] = 1.0
    return sel, m, qmax, kr


def _expand(sel: np.ndarray, w: jax.Array) -> jax.Array:
    """(k, kr, P1, P2) selection x (k, C1, C2) weights ->
    (kr, P1*C1, P2*C2) packed row kernel."""
    out = jnp.einsum("tqab,tio->qaibo", jnp.asarray(sel, w.dtype), w)
    kr, p1, c1, p2, c2 = out.shape
    return out.reshape(kr, p1 * c1, p2 * c2)


def _compose_lowpass_before(w: jax.Array, f: jax.Array) -> Tuple[jax.Array, int]:
    """conv(w, stride s, pad) applied to (f (*) x) with 'same' LPF of odd
    length kf == conv with kernel k+kf-1 and pad increased by (kf-1)//2."""
    k = w.shape[0]
    kf = f.shape[0]
    out = jnp.zeros((k + kf - 1,) + w.shape[1:], w.dtype)
    for j in range(kf):
        out = out.at[j:j + k].add(f[j].astype(w.dtype) * w)
    return out, (kf - 1) // 2


def _compose_lowpass_after_transposed(w: jax.Array, f: jax.Array
                                      ) -> Tuple[jax.Array, int]:
    """f (*) conv_transpose(x, w, stride s, pad) == transposed conv with
    kernel k+kf-1 and pad increased by (kf-1)//2 (w in our flipped layout;
    composition is done in torch orientation then flipped back)."""
    k = w.shape[0]
    kf = f.shape[0]
    torch_k = w[::-1]
    out = jnp.zeros((k + kf - 1,) + w.shape[1:], w.dtype)
    for j in range(kf):
        out = out.at[j:j + k].add(f[kf - 1 - j].astype(w.dtype) * torch_k)
    return out[::-1], (kf - 1) // 2


def packed_strided_conv(
    x_rows: jax.Array, w: jax.Array, b: Optional[jax.Array],
    stride: int, pad: int, p_in: int, p_out: int,
    aa_filter: Optional[jax.Array] = None,
) -> jax.Array:
    """Strided conv (torch Conv1d semantics) on packed rows.

    x_rows: (B, R1, P1*C1); w: (K, C1, C2); returns (B, R2, P2*C2) with
    R2 = T2/P2, T2 = (T1 + 2*pad - K)//stride + 1 (must divide exactly).
    aa_filter: optional binomial low-pass applied (conceptually) to the
    samples before the conv — folded into the taps here.  The fold is exact
    only at pad=0 (all call sites, nn/blocks.py): with pad>0 the folded
    kernel reads zero-padding where the unfused LPF would read 'same'-padded
    zeros at a different offset, so the (kf-1)//2 boundary outputs differ."""
    if aa_filter is not None:
        assert pad == 0, "aa_filter folding is only exact at pad=0"
        w, extra = _compose_lowpass_before(w, aa_filter)
        pad = pad + extra
    k, c1, c2 = w.shape
    sel, m, pl, kr = _down_selection(k, stride, pad, p_in, p_out)
    wp = _expand(sel, w)
    bpack = None if b is None else jnp.tile(b, p_out)
    r1 = x_rows.shape[1]
    t1 = r1 * p_in
    t2 = (t1 + 2 * pad - k) // stride + 1
    assert t2 % p_out == 0, "output length must divide the output pack factor"
    r2 = t2 // p_out
    pr = m * (r2 - 1) + (kr - 1 - pl) - (r1 - 1)
    y = jax.lax.conv_general_dilated(
        x_rows, wp.astype(x_rows.dtype), window_strides=(m,),
        padding=((pl, max(pr, 0)),), dimension_numbers=_DIMNUMS)
    y = y[:, :r2]
    if bpack is not None:
        y = y + bpack.astype(y.dtype)
    return y


def packed_transposed_conv(
    x_rows: jax.Array, w: jax.Array, b: Optional[jax.Array],
    stride: int, pad: int, p_in: int, p_out: int,
    aa_filter: Optional[jax.Array] = None,
) -> jax.Array:
    """Transposed conv (torch ConvTranspose1d semantics, our flipped weight
    layout) on packed rows; x_rows (B, R1, P1*C1) -> (B, R2, P2*C2) with
    T2 = (T1-1)*stride - 2*pad + K.  aa_filter: optional low-pass applied
    after the transposed conv — folded into the taps.  Exact only at pad=0
    (all call sites): with pad>0 the real op crops before the LPF while the
    fold low-passes before the crop, so the boundary outputs differ."""
    if aa_filter is not None:
        assert pad == 0, "aa_filter folding is only exact at pad=0"
        w, extra = _compose_lowpass_after_transposed(w, aa_filter)
        pad = pad + extra
    k, c1, c2 = w.shape
    sel, m, qmax, kr = _up_selection(k, stride, pad, p_in, p_out)
    wp = _expand(sel, w)
    # out[m*r1 + q] += x[r1] @ Wq  ==  lhs-dilated conv with kernel flipped
    wp = wp[::-1]
    bpack = None if b is None else jnp.tile(b, p_out)
    r1 = x_rows.shape[1]
    t1 = r1 * p_in
    t2 = (t1 - 1) * stride - 2 * pad + k
    assert t2 % p_out == 0, "output length must divide the output pack factor"
    r2 = t2 // p_out
    pl = qmax
    pr = (r2 - 1) + (kr - 1) - pl - m * (r1 - 1)
    y = jax.lax.conv_general_dilated(
        x_rows, wp.astype(x_rows.dtype), window_strides=(1,),
        padding=((pl, max(pr, 0)),), lhs_dilation=(m,),
        dimension_numbers=_DIMNUMS)
    y = y[:, :r2]
    if bpack is not None:
        y = y + bpack.astype(y.dtype)
    return y


def packed_same_conv(x_rows: jax.Array, w: jax.Array, b: Optional[jax.Array],
                     p: int) -> jax.Array:
    """'same'-padded stride-1 conv C->C on packed rows (XLA path; the Pallas
    fused chain covers the ConvBlock case)."""
    k = w.shape[0]
    return packed_strided_conv(x_rows, w, b, stride=1, pad=k // 2,
                               p_in=p, p_out=p)


def packed_pointwise_conv(x_rows: jax.Array, w: jax.Array,
                          b: Optional[jax.Array], p: int) -> jax.Array:
    """1x1 conv C1->C2 on packed rows (block-diagonal single matmul)."""
    return packed_strided_conv(x_rows, w, b, stride=1, pad=0,
                               p_in=p, p_out=p)


def packed_prelu(x_rows: jax.Array, slope: jax.Array, p: int) -> jax.Array:
    """PReLU on packed rows; slope (1,) scalar or (C,) per-channel."""
    if slope.shape[-1] > 1:
        slope = jnp.tile(slope, p)
    return jnp.where(x_rows >= 0, x_rows,
                     (slope.astype(x_rows.dtype) * x_rows))


def packed_film(x_rows: jax.Array, y: jax.Array, p: int) -> jax.Array:
    """FiLM on packed rows; y: (B, 2C) -> gamma/beta tiled across phases."""
    c2 = y.shape[-1]
    c = c2 // 2
    gamma = jnp.tile(y[..., None, :c], (1, 1, p))
    beta = jnp.tile(y[..., None, c:], (1, 1, p))
    return gamma * x_rows + beta
