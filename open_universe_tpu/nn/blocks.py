"""UNIVERSE building blocks (TPU layout: batch, time, channels).

Behavior matches the reference implementation
(/root/reference/open_universe/networks/universe/blocks.py): the
PReLU->lowpass->strided-conv unit, the UNIVERSE paper's ConvBlock (App. D)
with FiLM noise conditioning and residual/condition outputs, and the binomial
anti-aliasing filters.  The design differs where TPU idioms demand: data is
channels-last, modules are pure functions over parameter pytrees, and all
length bookkeeping happens on static shapes at trace time.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import conv as ops_conv
from .layers import Conv1d, ConvTranspose1d, Linear, PReLU
from .module import Module, Params
from .snake import AliasFreeSnake

SQRT_HALF = 1.0 / math.sqrt(2.0)


def film(x: jax.Array, y: jax.Array) -> jax.Array:
    """Feature-wise linear modulation; x: (B,T,C), y: (B,2C) -> gamma*x+beta."""
    c = x.shape[-1]
    if y.shape[-1] != 2 * c:
        raise ValueError("FiLM conditioning must have 2x the feature channels")
    gamma = y[..., None, :c]
    beta = y[..., None, c:]
    return gamma * x + beta


@lru_cache(maxsize=32)
def _binomial_filter_np(kernel_size: int) -> np.ndarray:
    """Pascal-row binomial filter normalized to unit RMS (blocks.py:62-68)."""
    row = np.array(
        [math.comb(kernel_size - 1, i) for i in range(kernel_size)], np.float64
    )
    row = row / np.sqrt(np.mean(row**2))
    row = row / np.sqrt(np.mean(row**2))
    return row.astype(np.float32)


def binomial_filter(kernel_size: int) -> jax.Array:
    return jnp.asarray(_binomial_filter_np(kernel_size))


class BinomialAntiAlias(Module):
    """Depthwise 'same' binomial low-pass; constant (buffer-only) module."""

    def __init__(self, kernel_size: int):
        self.kernel_size = kernel_size

    def init(self, key) -> Params:
        return {}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        return ops_conv.depthwise_conv1d_same(x, binomial_filter(self.kernel_size))


class LinearProj(Module):
    """1x1-conv projection of the condition added to the input (blocks.py:91-101)."""

    def __init__(self, in_dim, out_dim=None, weight_norm=False):
        out_dim = in_dim if out_dim is None else out_dim
        self.proj = Conv1d(in_dim, out_dim, 1, weight_norm=weight_norm)

    def apply(self, params: Params, x: jax.Array, c: jax.Array) -> jax.Array:
        return (self.proj(params["proj"], c) + x) * SQRT_HALF


class PReLUConv(Module):
    """activation -> [binomial low-pass] -> (transposed) conv [+ manual bias].

    Mirrors PReLU_Conv (blocks.py:133-227): with antialiasing the conv bias is
    disabled and a separate bias is added after the low-pass; for downsampling
    the low-pass precedes the conv, for upsampling it follows.
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 bias=True, use_transpose=False, act_type="prelu",
                 weight_norm=False, antialiasing=False):
        self.stride = stride
        self.use_transpose = use_transpose
        self.antialiasing = antialiasing
        self.manual_bias = bias and antialiasing
        self.out_channels = out_channels

        conv_bias = bias and not antialiasing
        if use_transpose:
            self.conv = ConvTranspose1d(in_channels, out_channels, kernel_size,
                                        stride=stride, padding=padding,
                                        bias=conv_bias, weight_norm=weight_norm)
        else:
            self.conv = Conv1d(in_channels, out_channels, kernel_size,
                               stride=stride, padding=padding,
                               bias=conv_bias, weight_norm=weight_norm)

        if antialiasing:
            self.low_pass_filter = BinomialAntiAlias(2 * kernel_size + 1)

        self.act_type = act_type
        if act_type == "snake":
            self.prelu = AliasFreeSnake(in_channels, alpha_logscale=True)
        elif act_type == "snakebeta":
            self.prelu = AliasFreeSnake(in_channels, alpha_logscale=True, beta=True)
        elif act_type == "prelu":
            self.prelu = PReLU()
        elif act_type in ("none", None):
            self.prelu = None
        else:
            raise ValueError("'act_type' should be one of prelu|snake|snakebeta|none")

    def init(self, key) -> Params:
        p = super().init(key)
        if self.manual_bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        if not self.use_transpose and self.stride > 1:
            r = x.shape[1] % self.stride
            if r != 0:
                x = jnp.pad(x, ((0, 0), (0, self.stride - r), (0, 0)))

        if self.prelu is not None:
            x = self.prelu(params["prelu"], x)

        if self.antialiasing and not self.use_transpose:
            x = self.low_pass_filter({}, x)

        x = self.conv(params["conv"], x)

        if self.antialiasing and self.use_transpose:
            x = self.low_pass_filter({}, x)

        if self.manual_bias:
            x = x + params["bias"].astype(x.dtype)

        return x


class ConvBlock(Module):
    """UNIVERSE ConvBlock (paper App. D; reference blocks.py:230-412).

    rate-change conv (up/down/none) + three same-padding convs (k=5,3,3),
    FiLM noise conditioning, optional per-stage signal conditioning, and
    residual/condition outputs.  Down blocks return the features *before*
    downsampling as the skip residual.
    """

    def __init__(self, n_channels, rate_change=None, rate_change_dir="none",
                 act_type="prelu", antialiasing=False, weight_norm=False,
                 signal_cond_type=None):
        if rate_change_dir not in ("up", "down", "none"):
            raise ValueError("rate_change_dir must be up|down|none")
        if rate_change_dir in ("up", "down") and rate_change is None:
            raise ValueError("rate_change required for up/down blocks")

        self.rate = rate_change
        self.rate_change_dir = rate_change_dir

        if rate_change_dir == "down":
            self.in_channels, self.out_channels = n_channels, 2 * n_channels
            self.rate_change_conv = PReLUConv(
                n_channels, 2 * n_channels, rate_change, stride=rate_change,
                weight_norm=weight_norm, antialiasing=antialiasing)
        elif rate_change_dir == "up":
            self.in_channels, self.out_channels = 2 * n_channels, n_channels
            self.rate_change_conv = PReLUConv(
                2 * n_channels, n_channels, rate_change, stride=rate_change,
                use_transpose=True, weight_norm=weight_norm,
                antialiasing=antialiasing)
        else:
            self.in_channels = self.out_channels = n_channels
            self.rate_change_conv = None

        self.conv1 = PReLUConv(n_channels, n_channels, 5, padding="same",
                               act_type=act_type, weight_norm=weight_norm)
        self.conv2 = PReLUConv(n_channels, n_channels, 3, padding="same",
                               act_type=act_type, weight_norm=weight_norm)
        self.conv3 = PReLUConv(n_channels, n_channels, 3, padding="same",
                               act_type=act_type, weight_norm=weight_norm)

        if signal_cond_type == "linear":
            self.signal_cond_proj = LinearProj(n_channels, weight_norm=weight_norm)
        elif signal_cond_type in ("none", None):
            self.signal_cond_proj = None
        else:
            raise ValueError("signal_cond_type must be linear|none")

    def _fused_eligible(self, params: Params, h: jax.Array) -> bool:
        """The Pallas fused conv chain applies to the plain-PReLU inference
        configuration: folded weights (no weight-norm/LoRA leaves), single-
        parameter PReLU slopes, additive signal conditioning, and a time axis
        long enough to amortize the tile halo."""
        from ..ops import pallas as pallas_config

        if not pallas_config.enabled():
            return False
        if self.signal_cond_proj is not None:
            return False
        # C >= 128 (pack factor 1): the (B,T,C)->(B,T/P,PC) lane packing is
        # the identity, so the fused kernel's ~1.2-1.6x win is not eaten by
        # physical relayout copies (~2.8 ms each at B=128,T=32k on v5e).
        # C < 128 needs the packed-layout execution mode to pay off.
        if pallas_config.allow_repack():
            if h.shape[1] < 1024 or h.shape[2] > 256:
                return False
        elif not 128 <= h.shape[2] <= 256 or h.shape[1] < 256:
            return False
        for name in ("conv1", "conv2", "conv3"):
            conv = getattr(self, name)
            if conv.act_type != "prelu":
                return False
            node = params[name]
            if "weight" not in node.get("conv", {}):
                return False  # weight-normed or LoRA-wrapped
            if node["prelu"]["weight"].shape != (1,):
                return False
        return True

    def apply(
        self,
        params: Params,
        h: jax.Array,
        noise_cond: Optional[jax.Array] = None,
        input_cond: Optional[jax.Array] = None,
        res: Optional[jax.Array] = None,
        length: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Returns (next-stage h, skip residual, condition output)."""
        if self.rate_change_dir == "up":
            if length is not None and self.rate * h.shape[1] < length:
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 0)))
            h = self.rate_change_conv(params["rate_change_conv"], h)
            if length is not None:
                if h.shape[1] > length:
                    h = h[:, :length]
                elif h.shape[1] < length:
                    h = jnp.pad(h, ((0, 0), (0, length - h.shape[1]), (0, 0)))

        if res is not None:
            if self.rate_change_dir == "down":
                raise ValueError("residual input not allowed for down blocks")
            h = (h + res) * SQRT_HALF

        fused = None
        if self._fused_eligible(params, h):
            from ..ops.pallas.conv_block import fused_conv_chain

            fused = fused_conv_chain(
                h,
                params["conv1"]["conv"]["weight"],
                params["conv1"]["conv"]["bias"],
                params["conv1"]["prelu"]["weight"],
                params["conv2"]["conv"]["weight"],
                params["conv2"]["conv"]["bias"],
                params["conv2"]["prelu"]["weight"],
                params["conv3"]["conv"]["weight"],
                params["conv3"]["conv"]["bias"],
                params["conv3"]["prelu"]["weight"],
                noise_cond=noise_cond,
                input_cond=input_cond,
            )
        if fused is not None:
            v_out, cond_out = fused
        else:
            cond_out = self.conv1(params["conv1"], h)
            if input_cond is not None:
                if self.signal_cond_proj is None:
                    c = (cond_out + input_cond) * SQRT_HALF
                else:
                    c = self.signal_cond_proj(params["signal_cond_proj"],
                                              cond_out, input_cond)
            else:
                c = cond_out

            if noise_cond is not None:
                c = film(c, noise_cond)
            c = self.conv2(params["conv2"], c)
            c = self.conv3(params["conv3"], c)

            v_out = (h + c) * SQRT_HALF

        if self.rate_change_dir == "down":
            r = h.shape[1] % self.rate
            v_pad = (
                jnp.pad(v_out, ((0, 0), (0, self.rate - r), (0, 0)))
                if r != 0 else v_out
            )
            h_out = self.rate_change_conv(params["rate_change_conv"], v_pad)
            return h_out, v_out, cond_out
        return v_out, v_out, cond_out

    # ------------------------------------------------------------------
    # Packed (lane-packed rows) execution — see ops/packed.py.  Tensors are
    # (B, T/P, P*C) with P = pack_factor(C); identical math, ~half the HBM
    # traffic at shallow levels once the Pallas fused chain engages.
    # ------------------------------------------------------------------

    def _packed_rate_conv(self, params: Params, x_rows: jax.Array) -> jax.Array:
        from ..ops import packed as pk

        rc = self.rate_change_conv
        node = params["rate_change_conv"]
        p_in = pk.pack_factor(self.in_channels)
        p_out = pk.pack_factor(self.out_channels)
        x_rows = pk.packed_prelu(x_rows, node["prelu"]["weight"], p_in)
        w = rc.conv.weight(node["conv"])
        aa = binomial_filter(2 * self.rate + 1) if rc.antialiasing else None
        conv_bias = node["conv"].get("bias")
        if rc.use_transpose:
            y = pk.packed_transposed_conv(x_rows, w, conv_bias, self.rate, 0,
                                          p_in, p_out, aa_filter=aa)
        else:
            y = pk.packed_strided_conv(x_rows, w, conv_bias, self.rate, 0,
                                       p_in, p_out, aa_filter=aa)
        if rc.manual_bias:
            y = y + jnp.tile(node["bias"], p_out).astype(y.dtype)
        return y

    def _packed_chain(self, params: Params, h: jax.Array, p: int,
                      noise_cond, input_cond):
        from ..ops import packed as pk
        from ..ops import pallas as pallas_config

        c = self.out_channels if self.rate_change_dir != "down" \
            else self.in_channels
        nodes = [params[n] for n in ("conv1", "conv2", "conv3")]
        weights = [getattr(self, n).conv.weight(node["conv"])
                   for n, node in zip(("conv1", "conv2", "conv3"), nodes)]
        biases = [node["conv"].get("bias") for node in nodes]
        slopes = [node["prelu"]["weight"] for node in nodes]

        if (pallas_config.enabled() and self.signal_cond_proj is None
                and all(getattr(self, n).act_type == "prelu"
                        for n in ("conv1", "conv2", "conv3"))
                and all(s.shape == (1,) for s in slopes)):
            from ..ops.pallas.conv_block import fused_conv_chain_rows

            fused = fused_conv_chain_rows(
                h, p, c,
                weights[0], biases[0], slopes[0],
                weights[1], biases[1], slopes[1],
                weights[2], biases[2], slopes[2],
                noise_cond=noise_cond, input_cond_rows=input_cond)
            if fused is not None:
                return fused

        cond_out = pk.packed_same_conv(
            pk.packed_prelu(h, slopes[0], p), weights[0], biases[0], p)
        if input_cond is not None:
            if self.signal_cond_proj is not None:
                raise NotImplementedError(
                    "packed path supports additive signal conditioning only")
            cc = (cond_out + input_cond) * SQRT_HALF
        else:
            cc = cond_out
        if noise_cond is not None:
            cc = pk.packed_film(cc, noise_cond, p)
        cc = pk.packed_same_conv(
            pk.packed_prelu(cc, slopes[1], p), weights[1], biases[1], p)
        cc = pk.packed_same_conv(
            pk.packed_prelu(cc, slopes[2], p), weights[2], biases[2], p)
        return (h + cc) * SQRT_HALF, cond_out

    def apply_packed(
        self,
        params: Params,
        h: jax.Array,
        noise_cond: Optional[jax.Array] = None,
        input_cond: Optional[jax.Array] = None,
        res: Optional[jax.Array] = None,
        length: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """apply() on lane-packed rows; all array args/returns are packed
        with the pack factor implied by their channel count.  Requires exact
        level lengths (no stride-remainder or length-repair padding), which
        holds whenever T is a multiple of the total downsampling factor."""
        from ..ops import packed as pk

        if self.rate_change_dir == "up":
            if length is not None and self.rate * h.shape[1] * pk.pack_factor(
                    self.in_channels) != length:
                raise NotImplementedError(
                    "packed path requires exact up-sampled lengths")
            h = self._packed_rate_conv(params, h)

        p = pk.pack_factor(self.out_channels if self.rate_change_dir != "down"
                           else self.in_channels)

        if res is not None:
            if self.rate_change_dir == "down":
                raise ValueError("residual input not allowed for down blocks")
            h = (h + res) * SQRT_HALF

        v_out, cond_out = self._packed_chain(params, h, p,
                                             noise_cond, input_cond)

        if self.rate_change_dir == "down":
            assert (h.shape[1] * p) % self.rate == 0, \
                "packed path requires stride-aligned lengths"
            h_out = self._packed_rate_conv(params, v_out)
            return h_out, v_out, cond_out
        return v_out, v_out, cond_out
