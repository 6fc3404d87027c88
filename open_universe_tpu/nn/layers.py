"""Leaf layers: Conv1d, ConvTranspose1d, Linear, PReLU, GRU.

Parameter names/shapes mirror torch state_dicts after a fixed layout
transform (documented per-layer) so reference checkpoints convert by a name
walk.  Optional weight normalization reproduces
``torch.nn.utils.weight_norm(dim=0)`` semantics (used throughout the
UNIVERSE++ configuration, cf. reference blocks.py:36-43).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import conv as ops_conv
from .module import Module, Params


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _lora_inner(params):
    """LoRA-injected nodes nest the base leaves under 'conv' (convs) or
    'linear' (Linear), mirroring the reference naming (see nn/lora.py)."""
    if "lora_weight_a" in params:
        return params["conv"], True
    if "lora_linear_a" in params:
        return params["linear"], True
    return params, False


class Conv1d(Module):
    """Weight layout (K, Cin//groups, Cout) = torch (Cout, Cin//g, K).T(2,1,0).

    With weight_norm: weight_g (Cout,), weight_v like weight; the effective
    weight is g * v / ||v||, norm over (K, Cin) per output channel (torch
    weight_norm dim=0 on a (Cout, Cin, K) tensor).
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias=True, weight_norm=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.use_bias = bias
        self.weight_norm = weight_norm

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        w = _uniform(kw, (self.kernel_size, self.in_channels // self.groups,
                          self.out_channels), bound)
        p: Params = {}
        if self.weight_norm:
            p["weight_v"] = w
            p["weight_g"] = jnp.sqrt(jnp.sum(w * w, axis=(0, 1)))
        else:
            p["weight"] = w
        if self.use_bias:
            p["bias"] = _uniform(kb, (self.out_channels,), bound)
        return p

    def weight(self, params: Params) -> jax.Array:
        params, _ = _lora_inner(params)
        if self.weight_norm and "weight_v" in params:  # folded trees: weight
            v = params["weight_v"]
            g = params["weight_g"]
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
            w = g[None, None, :] * v / jnp.maximum(norm, 1e-12)
        else:
            w = params["weight"]
        return w

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        w = self.weight(params)
        if "lora_weight_a" in params:
            from .lora import lora_delta

            w = w + lora_delta(self, params)
        params, _ = _lora_inner(params)
        return ops_conv.conv1d(
            x, w, params.get("bias"),
            stride=self.stride, padding=self.padding,
            dilation=self.dilation, groups=self.groups,
        )


class ConvTranspose1d(Module):
    """Weight layout (K, Cin, Cout), stored K-flipped relative to torch's
    (Cin, Cout, K) so apply() is a plain fractionally-strided conv.

    torch weight_norm dim=0 normalizes per *input* channel here: norm over
    (K, Cout) for each Cin; weight_g has shape (Cin,).
    """

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, weight_norm=False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding
        self.use_bias = bias
        self.weight_norm = weight_norm

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        # torch quirk: fan_in for ConvTranspose uses size(1)*K = Cout*K
        fan_in = self.out_channels * self.kernel_size
        bound = 1.0 / math.sqrt(fan_in)
        w = _uniform(kw, (self.kernel_size, self.in_channels, self.out_channels), bound)
        p: Params = {}
        if self.weight_norm:
            p["weight_v"] = w
            p["weight_g"] = jnp.sqrt(jnp.sum(w * w, axis=(0, 2)))
        else:
            p["weight"] = w
        if self.use_bias:
            p["bias"] = _uniform(kb, (self.out_channels,), bound)
        return p

    def weight(self, params: Params) -> jax.Array:
        params, _ = _lora_inner(params)
        if self.weight_norm and "weight_v" in params:  # folded trees: weight
            v = params["weight_v"]
            g = params["weight_g"]
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True))
            return g[None, :, None] * v / jnp.maximum(norm, 1e-12)
        return params["weight"]

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        w = self.weight(params)
        if "lora_weight_a" in params:
            from .lora import lora_delta

            w = w + lora_delta(self, params)
        params, _ = _lora_inner(params)
        return ops_conv.conv_transpose1d(
            x, w, params.get("bias"),
            stride=self.stride, padding=self.padding,
        )


class Linear(Module):
    """Weight layout (In, Out) = torch (Out, In).T."""

    def __init__(self, in_features, out_features, bias=True, weight_norm=False):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.weight_norm = weight_norm

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_features)
        w = _uniform(kw, (self.in_features, self.out_features), bound)
        p: Params = {}
        if self.weight_norm:
            p["weight_v"] = w
            p["weight_g"] = jnp.sqrt(jnp.sum(w * w, axis=0))
        else:
            p["weight"] = w
        if self.use_bias:
            p["bias"] = _uniform(kb, (self.out_features,), bound)
        return p

    def weight(self, params: Params) -> jax.Array:
        params, _ = _lora_inner(params)
        if self.weight_norm and "weight_v" in params:  # folded trees: weight
            v = params["weight_v"]
            g = params["weight_g"]
            norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            return g[None, :] * v / jnp.maximum(norm, 1e-12)
        return params["weight"]

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        w = self.weight(params)
        if "lora_linear_a" in params:
            from .lora import lora_delta

            w = w + lora_delta(self, params)
        params, _ = _lora_inner(params)
        return ops_conv.linear(x, w, params.get("bias"))


class PReLU(Module):
    """torch.nn.PReLU: single shared slope by default, init 0.25."""

    def __init__(self, num_parameters: int = 1, init: float = 0.25):
        self.num_parameters = num_parameters
        self.init_val = init

    def init(self, key) -> Params:
        return {"weight": jnp.full((self.num_parameters,), self.init_val, jnp.float32)}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        a = params["weight"].astype(x.dtype)
        if self.num_parameters > 1:
            # per-channel slope; channels are the last axis in our layout
            a = a.reshape((1,) * (x.ndim - 1) + (self.num_parameters,))
        return jnp.where(x >= 0, x, a * x)


class GRU(Module):
    """Bidirectional multi-layer GRU matching torch.nn.GRU semantics.

    Parameter names follow torch (weight_ih_l{k}[ _reverse], ...) with
    matrices stored transposed: weight_ih (In, 3H), weight_hh (H, 3H); the
    gate order along 3H is torch's (r, z, n) with the n-gate hidden bias
    inside the reset product: n = tanh(Wx + b_in + r * (Uh + b_hn)).

    The input projection for the whole sequence is one large matmul (MXU);
    only the (B, H) x (H, 3H) recurrent matmul sits in the lax.scan.
    """

    def __init__(self, input_size, hidden_size, num_layers=1, bidirectional=True):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def _names(self):
        for layer in range(self.num_layers):
            for d in range(2 if self.bidirectional else 1):
                suffix = f"l{layer}" + ("_reverse" if d == 1 else "")
                yield layer, d, suffix

    def init(self, key) -> Params:
        h = self.hidden_size
        bound = 1.0 / math.sqrt(h)
        p: Params = {}
        n_dir = 2 if self.bidirectional else 1
        for layer, d, suffix in self._names():
            in_sz = self.input_size if layer == 0 else h * n_dir
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            p[f"weight_ih_{suffix}"] = _uniform(k1, (in_sz, 3 * h), bound)
            p[f"weight_hh_{suffix}"] = _uniform(k2, (h, 3 * h), bound)
            p[f"bias_ih_{suffix}"] = _uniform(k3, (3 * h,), bound)
            p[f"bias_hh_{suffix}"] = _uniform(k4, (3 * h,), bound)
        return p

    def _run_direction(self, params, x, suffix, reverse):
        b, t, _ = x.shape
        h = self.hidden_size
        w_ih = params[f"weight_ih_{suffix}"].astype(x.dtype)
        w_hh = params[f"weight_hh_{suffix}"].astype(x.dtype)
        b_ih = params[f"bias_ih_{suffix}"].astype(x.dtype)
        b_hh = params[f"bias_hh_{suffix}"].astype(x.dtype)

        gx = jnp.dot(x, w_ih, preferred_element_type=x.dtype) + b_ih  # (B,T,3H)
        gx = jnp.swapaxes(gx, 0, 1)  # (T,B,3H) scan over time

        def step(h_prev, gx_t):
            gh = jnp.dot(h_prev, w_hh, preferred_element_type=x.dtype) + b_hh
            xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
            hr, hz, hn = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            return h_new, h_new

        h0 = jnp.zeros((b, h), x.dtype)
        _, ys = jax.lax.scan(step, h0, gx, reverse=reverse)
        return jnp.swapaxes(ys, 0, 1)  # (B,T,H)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        """x: (B, T, In) -> (B, T, H * n_dir)."""
        out = x
        for layer in range(self.num_layers):
            ys = [self._run_direction(params, out, f"l{layer}", reverse=False)]
            if self.bidirectional:
                ys.append(
                    self._run_direction(params, out, f"l{layer}_reverse", reverse=True)
                )
            out = jnp.concatenate(ys, axis=-1) if len(ys) > 1 else ys[0]
        return out


class LayerNorm(Module):
    """torch.nn.LayerNorm over the trailing `shape` dims (elementwise affine)."""

    def __init__(self, shape, eps: float = 1e-5):
        self.shape = tuple(shape) if not isinstance(shape, int) else (shape,)
        self.eps = eps

    def init(self, key) -> Params:
        return {
            "weight": jnp.ones(self.shape, jnp.float32),
            "bias": jnp.zeros(self.shape, jnp.float32),
        }

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        axes = tuple(range(x.ndim - len(self.shape), x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        xn = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return xn * params["weight"].astype(x.dtype) + params["bias"].astype(x.dtype)


class Conv2d(Module):
    """2-D conv, NHWC layout; weight (KH, KW, Cin, Cout) = torch (Cout,Cin,KH,KW)
    transposed (2,3,1,0).  weight_norm normalizes per output channel.

    spectral_norm divides the weight by its largest singular value
    (torch.nn.utils.spectral_norm semantics, used by the reference BigVGAN
    discriminators when use_spectral_norm is set — reference
    networks/bigvgan/gan.py:27).  torch keeps a persistent power-iteration
    buffer advanced one step per training forward; here the estimate runs
    ``sn_power_iters`` fresh iterations from a fixed start vector on every
    call — state-free (pure param pytrees, jit-friendly) and converging to
    the same sigma (golden-tested vs torch in tests/test_nn_layers.py).
    Gradients flow through sigma's dependence on the weight; the power
    vectors are stop_gradient'ed exactly as torch's buffers are."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=(1, 1),
                 padding=(0, 0), bias=True, weight_norm=False,
                 spectral_norm=False, sn_power_iters=8):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if isinstance(stride, int):
            stride = (stride, stride)
        if isinstance(padding, int):
            padding = (padding, padding)
        if weight_norm and spectral_norm:
            raise ValueError("weight_norm and spectral_norm are exclusive")
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = tuple(kernel_size)
        self.stride = tuple(stride)
        self.padding = tuple(padding)
        self.use_bias = bias
        self.weight_norm = weight_norm
        self.spectral_norm = spectral_norm
        self.sn_power_iters = sn_power_iters

    def init(self, key) -> Params:
        kw, kb = jax.random.split(key)
        kh, kw_ = self.kernel_size
        fan_in = self.in_channels * kh * kw_
        bound = 1.0 / math.sqrt(fan_in)
        w = _uniform(kw, (kh, kw_, self.in_channels, self.out_channels), bound)
        p: Params = {}
        if self.weight_norm:
            p["weight_v"] = w
            p["weight_g"] = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2)))
        else:
            p["weight"] = w
        if self.use_bias:
            p["bias"] = _uniform(kb, (self.out_channels,), bound)
        return p

    def weight(self, params: Params) -> jax.Array:
        if self.weight_norm and "weight_v" in params:  # folded trees: weight
            v = params["weight_v"]
            g = params["weight_g"]
            norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
            return g[None, None, None, :] * v / jnp.maximum(norm, 1e-12)
        if self.spectral_norm:
            w = params["weight"]
            # singular values are invariant to the column permutation between
            # torch's (Cout, Cin*KH*KW) flattening and this (Cout, KH*KW*Cin)
            mat = w.reshape(-1, w.shape[-1]).T.astype(jnp.float32)
            u = jax.random.normal(jax.random.key(0), (mat.shape[0],),
                                  jnp.float32)
            for _ in range(self.sn_power_iters):
                v = mat.T @ u
                v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
                u = mat @ v
                u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
            u = jax.lax.stop_gradient(u)
            v = jax.lax.stop_gradient(v)
            sigma = u @ (mat @ v)
            return w / jnp.maximum(sigma, 1e-12).astype(w.dtype)
        return params["weight"]

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, self.weight(params).astype(x.dtype),
            window_strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in params:
            y = y + params["bias"].astype(y.dtype)
        return y
