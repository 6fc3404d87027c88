"""UNIVERSE conditioner network.

Re-design of the reference ConditionerNetwork
(/root/reference/open_universe/networks/universe/condition.py): a parallel
U-Net over the noisy waveform producing per-scale conditioning tensors, an
auxiliary clean-signal estimate, and the bottleneck latent; a mel-spectrogram
adapter is summed into the bottleneck together with per-level strided
shortcut convolutions.

Faithfully reproduced reference quirks (documented, load-bearing for
published checkpoints):
  * MelAdapter builds its mel filterbank as if the sample rate were 24 kHz
    regardless of the true audio rate (condition.py:76);
  * the encoder's anti-aliasing is hardcoded off (condition.py:333).
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import (
    GRU,
    BinomialAntiAlias,
    Conv1d,
    ConvBlock,
    Module,
    ModuleList,
    PReLUConv,
)
from ..nn.module import Params
from ..ops import mel_filterbank, spectrogram
from ..utils.params import at_least_f32


def _st_conv_rates(ds_factors) -> List[int]:
    rates = [ds_factors[-1]]
    for r in ds_factors[-2::-1]:
        rates.append(rates[-1] * r)
    return rates[::-1]


class StConv(Module):
    """Anti-alias + strided conv shortcut (torch: Sequential(AA, PReLU_Conv),
    so the conv's parameters live under child name '1')."""

    def __init__(self, in_ch, out_ch, rate, weight_norm=False):
        self.aa = BinomialAntiAlias(rate * 2 + 1)
        conv = PReLUConv(in_ch, out_ch, rate, stride=rate,
                         weight_norm=weight_norm)
        setattr(self, "1", conv)

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        x = self.aa({}, x)
        return getattr(self, "1")(params["1"], x)


def _make_st_conv(in_ch, out_ch, rate, weight_norm=False, antialiasing=False):
    if antialiasing:
        return StConv(in_ch, out_ch, rate, weight_norm=weight_norm)
    return PReLUConv(in_ch, out_ch, rate, stride=rate, weight_norm=weight_norm)


class MelAdapter(Module):
    """Mel front-end injected at the conditioner bottleneck.

    n_fft = oversample * ds_factor, hop = ds_factor, center=False with
    (n_fft - hop)/2 symmetric padding so the frame rate exactly matches the
    U-Net latent rate.
    """

    CLAIMED_SAMPLE_RATE = 24000  # reference quirk: hardcoded (condition.py:76)

    def __init__(self, n_mels, output_channels, ds_factor, oversample=2,
                 weight_norm=False):
        self.n_mels = n_mels
        self.ds_factor = ds_factor
        self.n_fft = oversample * ds_factor
        pad_tot = self.n_fft - ds_factor
        self.pad_left, self.pad_right = pad_tot // 2, pad_tot - pad_tot // 2
        self.conv = Conv1d(n_mels, output_channels, 3, padding="same",
                           weight_norm=weight_norm)
        self.conv_block = ConvBlock(output_channels, weight_norm=weight_norm)

    def compute_mel_spec(self, x: jax.Array) -> jax.Array:
        """x: (B, T, C) waveform -> (B, frames, n_mels) for C == 1, else
        (B, C, frames, n_mels).

        Each channel is mel'd and frame-energy-normalized independently —
        the reference's torchaudio transform batches the channel dim the
        same way (condition.py:92-107), and the with_noise_target latent
        loss feeds a 2-channel target through here (universe.py:511-516).
        """
        b, t, c = x.shape
        dtype = x.dtype
        # the STFT itself always runs in fp32 (XLA FFT precision)
        xw = at_least_f32(jnp.swapaxes(x, 1, 2).reshape(b * c, t))
        r = xw.shape[-1] % self.ds_factor
        pad = self.ds_factor - r if r != 0 else 0
        xw = jnp.pad(xw, ((0, 0), (self.pad_left, pad + self.pad_right)))
        spec = spectrogram(xw, self.n_fft, self.ds_factor, power=2.0)  # (BC,F,freq)
        fb = mel_filterbank(self.n_fft // 2 + 1, self.n_mels,
                            self.CLAIMED_SAMPLE_RATE)
        mel = jnp.matmul(
            spec, fb,
            preferred_element_type=jnp.promote_types(spec.dtype, jnp.float32),
        )  # (BC,F,mels)
        # unit average frame energy per channel (condition.py:105-106)
        norm = jnp.sqrt(jnp.mean(jnp.sum(mel * mel, axis=-1, keepdims=True),
                                 axis=-2, keepdims=True))
        mel = (mel / jnp.maximum(norm, 1e-5)).astype(dtype)
        if c == 1:
            return mel
        return mel.reshape(b, c, *mel.shape[1:])

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        m = self.compute_mel_spec(x)
        m = self.conv(params["conv"], m)
        m, *_ = self.conv_block(params["conv_block"], m)
        return m


class ConditionerEncoder(Module):
    def __init__(self, ds_factors, input_channels, with_gru_residual=False,
                 with_extra_conv_block=False, act_type="prelu",
                 use_weight_norm=False, seq_model="gru", use_antialiasing=False):
        self.with_gru_residual = with_gru_residual
        self.extra_conv_block = with_extra_conv_block
        c = input_channels

        self.ds_modules = ModuleList([
            ConvBlock(c * 2**i, r, "down", act_type=act_type,
                      weight_norm=use_weight_norm, antialiasing=use_antialiasing)
            for i, r in enumerate(ds_factors)
        ])

        rates = _st_conv_rates(ds_factors)
        num_layers = len(ds_factors) - 1
        oc = input_channels * 2 ** len(ds_factors)
        self.st_convs = ModuleList([
            _make_st_conv(c * 2**i, oc, rates[i], weight_norm=use_weight_norm,
                          antialiasing=use_antialiasing)
            if i < num_layers else None
            for i in range(len(ds_factors))
        ])

        if with_extra_conv_block:
            self.ds_modules.append(
                ConvBlock(oc, act_type=act_type, weight_norm=use_weight_norm))
            self.st_convs.append(None)

        if seq_model != "gru":
            raise ValueError("seq_model must be gru")
        self.gru = GRU(oc, oc // 2, num_layers=2, bidirectional=True)
        self.conv_block1 = ConvBlock(oc, act_type=act_type,
                                     weight_norm=use_weight_norm)
        self.conv_block2 = ConvBlock(oc, act_type=act_type,
                                     weight_norm=use_weight_norm)

    def apply(self, params: Params, x: jax.Array, x_mel: jax.Array,
              packed: bool = False):
        from ..ops import packed as pk

        outputs = []
        lengths = []
        for i, ds in enumerate(self.ds_modules):
            node = params["ds_modules"][str(i)]
            if packed:
                p_in = pk.pack_factor(ds.in_channels)
                lengths.append(x.shape[1] * p_in)
                x, res, _ = ds.apply_packed(node, x)
            else:
                lengths.append(x.shape[1])
                x, res, _ = ds(node, x)
            if self.st_convs[i] is not None:
                st = self.st_convs[i]
                snode = params["st_convs"][str(i)]
                if packed:
                    # PReLUConv(C_i -> oc, k=rate, stride=rate): the output
                    # lives at the bottleneck (pack factor 1)
                    p_in = pk.pack_factor(ds.in_channels)
                    h = pk.packed_prelu(res, snode["prelu"]["weight"], p_in)
                    w = st.conv.weight(snode["conv"])
                    outputs.append(pk.packed_strided_conv(
                        h, w, snode["conv"].get("bias"), st.stride, 0,
                        p_in, 1))
                else:
                    outputs.append(st(snode, res))
        outputs.append(x)

        out = x_mel
        for o in outputs:
            out = out + o
        out = out * (1.0 / math.sqrt(len(outputs) + 1))

        out, *_ = self.conv_block1(params["conv_block1"], out)
        if self.with_gru_residual:
            res = out
        out = self.gru(params["gru"], out)
        if self.with_gru_residual:
            out = (out + res) * (1.0 / math.sqrt(2.0))
        out, *_ = self.conv_block2(params["conv_block2"], out)

        return out, lengths[::-1]


class ConditionerDecoder(Module):
    def __init__(self, up_factors, input_channels, with_extra_conv_block=False,
                 act_type="prelu", use_weight_norm=False, use_antialiasing=False):
        self.extra_conv_block = with_extra_conv_block
        n_channels = [input_channels * 2 ** (len(up_factors) - i - 1)
                      for i in range(len(up_factors))]
        self.input_conv_block = ConvBlock(n_channels[0] * 2, act_type=act_type,
                                          weight_norm=use_weight_norm)
        ups = [
            ConvBlock(c, r, "up", act_type=act_type, weight_norm=use_weight_norm,
                      antialiasing=use_antialiasing)
            for c, r in zip(n_channels, up_factors)
        ]
        if with_extra_conv_block:
            ups = [ConvBlock(2 * n_channels[0], act_type=act_type,
                             weight_norm=use_weight_norm)] + ups
        self.up_modules = ModuleList(ups)

    def apply(self, params: Params, x: jax.Array, lengths, packed: bool = False):
        conditions = []
        if packed:
            x, *_ = self.input_conv_block.apply_packed(
                params["input_conv_block"], x)
            for i, (up, length) in enumerate(zip(self.up_modules, lengths)):
                x, _, cond = up.apply_packed(params["up_modules"][str(i)], x,
                                             length=length)
                conditions.append(cond)
        else:
            x, *_ = self.input_conv_block(params["input_conv_block"], x)
            for i, (up, length) in enumerate(zip(self.up_modules, lengths)):
                x, _, cond = up(params["up_modules"][str(i)], x, length=length)
                conditions.append(cond)
        return x, conditions


class ConditionerNetwork(Module):
    def __init__(self, fb_kernel_size=3, rate_factors=(2, 4, 4, 5), n_channels=32,
                 n_mels=80, n_mel_oversample=4, encoder_gru_residual=False,
                 extra_conv_block=False, encoder_act_type="prelu",
                 decoder_act_type="prelu", precoding=None, input_channels=1,
                 output_channels=None, use_weight_norm=False, seq_model="gru",
                 use_antialiasing=False):
        self.n_mels = n_mels
        self.input_channels = input_channels
        self.rate_factors = list(rate_factors)
        self.n_channels = n_channels

        self.input_conv = Conv1d(input_channels, n_channels, fb_kernel_size,
                                 padding="same", weight_norm=use_weight_norm)
        if output_channels is not None:
            self.output_conv = Conv1d(n_channels, output_channels, fb_kernel_size,
                                      padding="same", weight_norm=use_weight_norm)
        else:
            self.output_conv = None

        total_ds = math.prod(rate_factors)
        total_channels = 2 ** len(rate_factors) * n_channels
        self.input_mel = MelAdapter(n_mels, total_channels,
                                    total_ds * input_channels, n_mel_oversample,
                                    weight_norm=use_weight_norm)

        self.encoder = ConditionerEncoder(
            rate_factors, n_channels, with_gru_residual=encoder_gru_residual,
            with_extra_conv_block=extra_conv_block, act_type=encoder_act_type,
            use_weight_norm=use_weight_norm, seq_model=seq_model,
            use_antialiasing=False)  # reference quirk: encoder AA forced off
        self.decoder = ConditionerDecoder(
            rate_factors[::-1], n_channels, with_extra_conv_block=extra_conv_block,
            act_type=decoder_act_type, use_weight_norm=use_weight_norm,
            use_antialiasing=use_antialiasing)
        self.precoding = precoding

    def packed_eligible(self, t: int) -> bool:
        """Packed-mode support: see ScoreNetwork.packed_eligible.  The
        conditioner additionally requires plain (non-anti-aliased) shortcut
        convs — always true for the published configs, whose encoder
        anti-aliasing is hardcoded off (reference condition.py:333)."""
        from ..ops.packed import pack_factor

        if self.precoding is not None or self.input_channels != 1:
            return False
        t_level, c = t, self.n_channels
        for r in self.rate_factors:
            if t_level % pack_factor(c) != 0 or t_level % r != 0:
                return False
            # rate-change pack compatibility (see ScoreNetwork)
            if (r * pack_factor(c * 2)) % pack_factor(c) != 0:
                return False
            t_level //= r
            c *= 2
        if pack_factor(c) != 1:
            # bottleneck must be unpacked: the mel-adapter output and the
            # shortcut-conv sums join the deepest level as plain (B, T, C)
            return False
        # shortcut convs: stride is the cumulative remaining downsampling
        st_rates = _st_conv_rates(self.rate_factors)
        oc = self.n_channels * 2 ** len(self.rate_factors)
        for i in range(len(self.rate_factors) - 1):
            ci = self.n_channels * 2 ** i
            if (st_rates[i] * pack_factor(oc)) % pack_factor(ci) != 0:
                return False
        for st in self.encoder.st_convs:
            if st is not None and not isinstance(st, PReLUConv):
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

    def apply(self, params: Params, x: jax.Array,
              x_wav: Optional[jax.Array] = None, train: bool = False,
              packed: bool = False):
        """x: (B, T, C) -> conditions [, y_hat (B,T,n_channels), latent h].

        packed=True: the per-level `conditions` are returned lane-packed
        (matching ScoreNetwork.apply(..., packed=True)); y_hat and h are
        unpacked as usual."""
        n_samples = x.shape[1]
        if x_wav is None:
            x_wav = x

        x_mel = self.input_mel(params["input_mel"], x_wav)

        if self.precoding is not None:
            x = self.precoding(params.get("precoding", {}), x)

        if packed:
            from ..ops.packed import (
                pack_factor, pack_rows, packed_strided_conv, unpack_rows,
            )

            p0 = pack_factor(self.n_channels)
            node = params["input_conv"]
            w_in = self.input_conv.weight(node)
            x = packed_strided_conv(pack_rows(x, p0), w_in,
                                    node.get("bias"), 1, w_in.shape[0] // 2,
                                    p0, p0)
            h, lengths = self.encoder(params["encoder"], x, x_mel, packed=True)
            y_hat, conditions = self.decoder(params["decoder"], h, lengths,
                                             packed=True)
            if self.output_conv is not None:
                onode = params["output_conv"]
                w_out = self.output_conv.weight(onode)
                y_hat = packed_strided_conv(y_hat, w_out, onode.get("bias"),
                                            1, w_out.shape[0] // 2, p0, p0)
                y_hat = unpack_rows(y_hat, p0, w_out.shape[-1])
            else:
                y_hat = unpack_rows(y_hat, p0, self.n_channels)
        else:
            x = self.input_conv(params["input_conv"], x)
            h, lengths = self.encoder(params["encoder"], x, x_mel)
            y_hat, conditions = self.decoder(params["decoder"], h, lengths)

            if self.output_conv is not None:
                y_hat = self.output_conv(params["output_conv"], y_hat)

        if self.precoding is not None and hasattr(self.precoding, "inv"):
            y_hat = self.precoding.inv(params.get("precoding", {}), y_hat)

        if y_hat.shape[1] < n_samples:
            y_hat = jnp.pad(y_hat, ((0, 0), (0, n_samples - y_hat.shape[1]), (0, 0)))

        if train:
            return conditions, y_hat, h
        return conditions
