"""UNIVERSE score network (conv U-Net over raw waveform, GRU bottleneck).

TPU-native re-design of the reference ScoreNetwork
(/root/reference/open_universe/networks/universe/score.py): channels-last
layout, pure-function apply over a parameter pytree, static length
bookkeeping.  Attribute/parameter names mirror the torch module tree for
checkpoint ingestion.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..nn import (
    GRU,
    Conv1d,
    ConvBlock,
    Linear,
    Module,
    ModuleList,
    PReLU,
    PReLUConv,
    SigmaBlock,
    SimpleTimeEmbedding,
)
from ..nn.module import Params


class ScoreEncoder(Module):
    def __init__(self, ds_factors, input_channels, noise_cond_dim,
                 with_gru_conv_sandwich=False, with_extra_conv_block=False,
                 act_type="prelu", use_weight_norm=False, seq_model="gru",
                 use_antialiasing=False):
        c = input_channels
        self.extra_conv_block = with_extra_conv_block
        self.ds_factors = list(ds_factors)

        self.ds_modules = ModuleList([
            ConvBlock(c * 2**i, r, "down", act_type=act_type,
                      weight_norm=use_weight_norm, antialiasing=use_antialiasing)
            for i, r in enumerate(ds_factors)
        ])
        self.cond_proj = ModuleList([
            Linear(noise_cond_dim, c * 2 ** (i + 1), weight_norm=use_weight_norm)
            for i in range(len(ds_factors))
        ])

        oc = input_channels * 2 ** len(ds_factors)
        if with_extra_conv_block:
            self.ds_modules.append(
                ConvBlock(oc, act_type=act_type, weight_norm=use_weight_norm))
            self.cond_proj.append(
                Linear(noise_cond_dim, 2 * oc, weight_norm=use_weight_norm))

        self.seq_model = seq_model
        if seq_model == "gru":
            self.gru = GRU(oc, oc // 2, num_layers=1, bidirectional=True)
            self.gru_conv_sandwich = with_gru_conv_sandwich
            if with_gru_conv_sandwich:
                self.conv_block1 = ConvBlock(oc, act_type=act_type,
                                             weight_norm=use_weight_norm)
                self.conv_block2 = ConvBlock(oc, act_type=act_type,
                                             weight_norm=use_weight_norm)
        elif seq_model == "none":
            self.gru_conv_sandwich = False
        else:
            raise ValueError("seq_model must be gru|none")

    def apply(self, params: Params, x: jax.Array, noise_cond: jax.Array,
              packed: bool = False):
        from ..ops.packed import pack_factor

        residuals: List[jax.Array] = []
        lengths: List[int] = []
        for i, (ds, lin) in enumerate(zip(self.ds_modules, self.cond_proj)):
            nc = lin(params["cond_proj"][str(i)], noise_cond)
            node = params["ds_modules"][str(i)]
            if packed:
                lengths.append(x.shape[1] * pack_factor(ds.in_channels))
                x, res, _ = ds.apply_packed(node, x, noise_cond=nc)
            else:
                lengths.append(x.shape[1])
                x, res, _ = ds(node, x, noise_cond=nc)
            residuals.append(res)

        if self.seq_model == "gru":
            # bottleneck channels >= 128: pack factor 1, arrays identical
            if self.gru_conv_sandwich:
                x, *_ = self.conv_block1(params["conv_block1"], x)
            x = self.gru(params["gru"], x)
            if self.gru_conv_sandwich:
                x, *_ = self.conv_block2(params["conv_block2"], x)

        return x, residuals[::-1], lengths[::-1]


class ScoreDecoder(Module):
    def __init__(self, up_factors, input_channels, noise_cond_dim,
                 with_extra_conv_block=False, act_type="prelu",
                 use_weight_norm=False, use_antialiasing=False):
        self.extra_conv_block = with_extra_conv_block
        n_channels = [input_channels * 2 ** (len(up_factors) - i - 1)
                      for i in range(len(up_factors))]

        self.up_modules = ModuleList()
        self.noise_cond_proj = ModuleList()
        self.signal_cond_proj = ModuleList()

        if with_extra_conv_block:
            oc = input_channels * 2 ** len(up_factors)
            self.up_modules.append(
                ConvBlock(oc, act_type=act_type, weight_norm=use_weight_norm))
            self.noise_cond_proj.append(
                Linear(noise_cond_dim, 2 * oc, weight_norm=use_weight_norm))
            self.signal_cond_proj.append(
                Conv1d(oc, oc, 1, weight_norm=use_weight_norm))

        for c, r in zip(n_channels, up_factors):
            self.up_modules.append(
                ConvBlock(c, r, "up", act_type=act_type,
                          weight_norm=use_weight_norm,
                          antialiasing=use_antialiasing))
            self.noise_cond_proj.append(
                Linear(noise_cond_dim, 2 * c, weight_norm=use_weight_norm))
            self.signal_cond_proj.append(
                Conv1d(c, c, 1, weight_norm=use_weight_norm))

    def apply(self, params: Params, x: jax.Array, noise_cond: jax.Array,
              input_cond: Sequence[jax.Array], residuals: Sequence[jax.Array],
              lengths: Sequence[int], packed: bool = False) -> jax.Array:
        from ..ops.packed import pack_factor, packed_pointwise_conv

        for i, (up, cond, res, length) in enumerate(
            zip(self.up_modules, input_cond, residuals, lengths)
        ):
            nc = self.noise_cond_proj[i](params["noise_cond_proj"][str(i)], noise_cond)
            scp = self.signal_cond_proj[i]
            node = params["signal_cond_proj"][str(i)]
            if packed:
                sc = packed_pointwise_conv(cond, scp.weight(node),
                                           node.get("bias"),
                                           pack_factor(up.out_channels))
                x, *_ = up.apply_packed(params["up_modules"][str(i)], x,
                                        noise_cond=nc, input_cond=sc,
                                        res=res, length=length)
            else:
                sc = scp(node, cond)
                x, *_ = up(params["up_modules"][str(i)], x, noise_cond=nc,
                           input_cond=sc, res=res, length=length)
        return x


class ScoreNetwork(Module):
    """Full score network s(x_t, sigma | conditioning)."""

    def __init__(self, fb_kernel_size=3, rate_factors=(2, 4, 4, 5), n_channels=32,
                 n_rff=32, noise_cond_dim=512, encoder_gru_conv_sandwich=False,
                 extra_conv_block=False, encoder_act_type="prelu",
                 decoder_act_type="prelu", precoding=None, input_channels=1,
                 output_channels=1, use_weight_norm=False, seq_model="gru",
                 use_antialiasing=False, time_embedding=None):
        if time_embedding == "simple":
            self.sigma_block = SimpleTimeEmbedding(n_dim=noise_cond_dim)
        else:
            self.sigma_block = SigmaBlock(n_rff, noise_cond_dim)

        self.input_channels = input_channels
        self.output_channels = output_channels
        self.rate_factors = list(rate_factors)
        self.n_channels = n_channels

        self.input_conv = Conv1d(input_channels, n_channels, fb_kernel_size,
                                 padding="same")
        self.encoder = ScoreEncoder(
            ds_factors=rate_factors, input_channels=n_channels,
            noise_cond_dim=noise_cond_dim,
            with_gru_conv_sandwich=encoder_gru_conv_sandwich,
            with_extra_conv_block=extra_conv_block,
            act_type=encoder_act_type, use_weight_norm=use_weight_norm,
            seq_model=seq_model, use_antialiasing=use_antialiasing)
        self.decoder = ScoreDecoder(
            up_factors=rate_factors[::-1], input_channels=n_channels,
            noise_cond_dim=noise_cond_dim,
            with_extra_conv_block=extra_conv_block,
            act_type=decoder_act_type, use_weight_norm=use_weight_norm,
            use_antialiasing=use_antialiasing)
        self.prelu = PReLU()
        self.output_conv = PReLUConv(n_channels, output_channels, fb_kernel_size,
                                     padding="same", weight_norm=use_weight_norm)
        self.precoding = precoding  # optional transform module (dyn_range_comp)

    def packed_eligible(self, t: int) -> bool:
        """Can apply() run in lane-packed mode for input length t?  Requires
        exact level lengths, prelu activations, additive-only in-block signal
        conditioning, and no precoding (the packed ops cover exactly the
        published UNIVERSE/UNIVERSE++ architectures)."""
        from ..ops.packed import pack_factor

        if self.precoding is not None or self.input_channels != 1:
            return False
        if self.output_conv.act_type != "prelu":
            return False
        t_level, c = t, self.n_channels
        for r in self.rate_factors:
            if t_level % pack_factor(c) != 0 or t_level % r != 0:
                return False
            # rate-change convs require stride*pack(out) % pack(in) == 0
            # (ops/packed.py _down/_up_selection); always true for the
            # published channel ladders, not for arbitrary tiny configs
            if (r * pack_factor(c * 2)) % pack_factor(c) != 0:
                return False
            t_level //= r
            c *= 2
        if pack_factor(c) != 1:
            # the bottleneck must be unpacked: the encoder GRU consumes the
            # deepest level's rows directly, so a pack factor > 1 there
            # would feed (P*C)-wide rows into C-wide GRU weights
            return False
        for blocks in (self.encoder.ds_modules, self.decoder.up_modules):
            for blk in blocks:
                if not isinstance(blk, ConvBlock):
                    return False
                if blk.signal_cond_proj is not None:
                    return False
                for cn in ("conv1", "conv2", "conv3"):
                    if getattr(blk, cn).act_type != "prelu":
                        return False
        return True

    def apply(self, params: Params, x: jax.Array, sigma: jax.Array,
              cond: Sequence[jax.Array], packed: bool = False) -> jax.Array:
        """x: (B, T, C), sigma: (B,), cond: per-stage tensors (coarse->fine).

        packed=True runs the shallow levels in lane-packed rows (see
        ops/packed.py); `cond` must then be packed per level (as produced by
        ConditionerNetwork.apply(..., packed=True))."""
        n_samples = x.shape[1]

        if self.precoding is not None:
            x = self.precoding(params.get("precoding", {}), x)

        g = self.sigma_block(params["sigma_block"], jnp.log10(sigma))
        if packed:
            from ..ops.packed import (
                pack_factor, pack_rows, packed_prelu, packed_strided_conv,
                unpack_rows,
            )

            p0 = pack_factor(self.n_channels)
            node = params["input_conv"]
            w_in = self.input_conv.weight(node)
            x = packed_strided_conv(pack_rows(x, p0), w_in,
                                    node.get("bias"), 1, w_in.shape[0] // 2,
                                    p0, p0)
            h, residuals, lengths = self.encoder(params["encoder"], x, g,
                                                 packed=True)
            s = self.decoder(params["decoder"], h, g, cond, residuals,
                             lengths, packed=True)
            s = packed_prelu(s, params["prelu"]["weight"], p0)
            onode = params["output_conv"]
            s = packed_prelu(s, onode["prelu"]["weight"], p0)
            w_out = self.output_conv.conv.weight(onode["conv"])
            s = packed_strided_conv(s, w_out, onode["conv"].get("bias"),
                                    1, w_out.shape[0] // 2, p0, p0)
            s = unpack_rows(s, p0, self.output_channels)
        else:
            x = self.input_conv(params["input_conv"], x)
            h, residuals, lengths = self.encoder(params["encoder"], x, g)
            s = self.decoder(params["decoder"], h, g, cond, residuals, lengths)
            s = self.prelu(params["prelu"], s)
            s = self.output_conv(params["output_conv"], s)

        if self.precoding is not None and hasattr(self.precoding, "inv"):
            s = self.precoding.inv(params.get("precoding", {}), s)

        if s.shape[1] < n_samples:
            s = jnp.pad(s, ((0, 0), (0, n_samples - s.shape[1]), (0, 0)))
        return s
