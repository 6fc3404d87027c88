"""STFT / mel-spectrogram front-end for TPU.

Matches ``torch.stft`` / ``torchaudio.transforms.MelSpectrogram`` semantics
(periodic Hann window, one-sided rFFT, power spectrum, HTK mel scale with
``norm=None``) so the conditioner's MelAdapter
(/root/reference/open_universe/networks/universe/condition.py:68-114) and the
MRD discriminator spectrograms (networks/bigvgan/gan.py:227-253) can be
reproduced bit-for-bit up to float error.

Framing is done without gathers whenever ``n_fft % hop == 0`` (stack of
shifted strided views), falling back to a take-based gather otherwise; the
FFT itself uses XLA's native rFFT.  Everything is (batch..., time) on input
and returns (batch..., frames, freqs) — frames on the sublane axis, freqs on
the lane axis, the natural layout for the downstream mel matmul on the MXU.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window, identical to torch.hann_window(n)."""
    # cos-based form is exact for the periodic window
    k = np.arange(n)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    return jnp.asarray(w, dtype=dtype)


def frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """Split the last axis into overlapping frames.

    x: (..., T) -> (..., n_frames, frame_length) with
    n_frames = (T - frame_length) // hop + 1 (torch.stft center=False).
    """
    t = x.shape[-1]
    n_frames = (t - frame_length) // hop + 1
    if n_frames <= 0:
        raise ValueError(f"signal too short: T={t} < frame_length={frame_length}")
    # Gather-free for ANY (frame_length, hop): frame with the length rounded
    # up to a multiple of hop (a stack of `ratio` shifted hop-block slices),
    # then drop the surplus tail columns.  A take-based gather here costs a
    # scatter-add in the backward pass (~12 ms/step for the MRD discriminator
    # spectrograms at batch 40 on v5e); slices/concats transpose to
    # pad-and-add instead.
    ratio = -(-frame_length // hop)
    n_blocks_needed = n_frames - 1 + ratio
    usable = n_blocks_needed * hop
    if usable > t:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, usable - t)]
        x = jnp.pad(x, cfg)
    blocks = x[..., :usable].reshape(x.shape[:-1] + (n_blocks_needed, hop))
    parts = [blocks[..., i : i + n_frames, :] for i in range(ratio)]
    out = jnp.concatenate(parts, axis=-1)
    if ratio * hop != frame_length:
        out = out[..., :frame_length]
    return out


def stft(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    center: bool = False,
    pad_mode: str = "reflect",
) -> jax.Array:
    """One-sided complex STFT with torch.stft conventions.

    x: (..., T) -> complex (..., n_frames, n_fft // 2 + 1).
    A window shorter than n_fft is zero-padded centered, as in torch.
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, dtype=x.dtype)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, cfg, mode=pad_mode)
    frames = frame(x, n_fft, hop)
    frames = frames * window.astype(x.dtype)
    return jnp.fft.rfft(frames, axis=-1)


def spectrogram(
    x: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    power: float = 2.0,
    center: bool = False,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Magnitude (power=1) or power (power=2) spectrogram."""
    z = stft(x, n_fft, hop, win_length=win_length, center=center, pad_mode=pad_mode)
    re, im = jnp.real(z), jnp.imag(z)
    p2 = re * re + im * im
    if power == 2.0:
        return p2
    if power == 1.0:
        return jnp.sqrt(jnp.maximum(p2, 0.0))
    return jnp.power(jnp.maximum(p2, 1e-30), power / 2.0)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@lru_cache(maxsize=32)
def _mel_fbank_np(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk').

    Returns (n_freqs, n_mels) float32.  NOTE: the reference MelAdapter
    constructs its MelSpectrogram with a hardcoded sample_rate=24000
    (condition.py:76) regardless of the true audio rate; callers replicate
    that quirk by passing the *claimed* sample rate here.
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> jax.Array:
    if f_max is None:
        f_max = float(sample_rate // 2)
    return jnp.asarray(_mel_fbank_np(n_freqs, float(f_min), float(f_max), n_mels, sample_rate))


def mel_spectrogram(
    x: jax.Array,
    sample_rate: int,
    n_fft: int,
    hop: int,
    n_mels: int,
    center: bool = False,
    power: float = 2.0,
) -> jax.Array:
    """torchaudio.transforms.MelSpectrogram with default settings.

    x: (..., T) -> (..., n_mels, n_frames)  (torch channel-ordering so the
    caller can treat mel bins as channels).
    """
    spec = spectrogram(x, n_fft, hop, power=power, center=center)  # (..., F, nfreq)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate).astype(x.dtype)
    mel = jnp.matmul(spec, fb, preferred_element_type=spec.dtype)  # (..., F, n_mels)
    return jnp.swapaxes(mel, -1, -2)


def istft(
    z: jax.Array,
    n_fft: int,
    hop: int,
    length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    center: bool = True,
) -> jax.Array:
    """Inverse STFT (overlap-add with squared-window normalization).

    z: (..., n_frames, n_fft // 2 + 1) complex -> (..., T).
    Matches torch.istft for the Hann window / center=True case.
    """
    if window is None:
        window = hann_window(n_fft)
    frames = jnp.fft.irfft(z, n=n_fft, axis=-1)
    frames = frames * window
    n_frames = frames.shape[-2]
    t_full = n_fft + hop * (n_frames - 1)

    # overlap-add via transposed conv trick: scatter each frame at i*hop
    lead = frames.shape[:-2]
    f2 = frames.reshape((-1, n_frames, n_fft))
    out = jnp.zeros((f2.shape[0], t_full), f2.dtype)
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]).reshape(-1)
    out = out.at[:, jnp.asarray(idx)].add(f2.reshape(f2.shape[0], -1))

    wsq = jnp.zeros((t_full,), window.dtype)
    wsq = wsq.at[jnp.asarray(idx)].add(
        jnp.broadcast_to((window * window)[None, :], (n_frames, n_fft)).reshape(-1)
    )
    out = out / jnp.maximum(wsq, 1e-11)[None, :]
    # torch.istft semantics: with center=True the left n_fft//2 pad is always
    # removed; the right edge is cut by `length` when given (serving samples
    # from the raw overlap-add tail past the symmetric trim point), else by
    # the symmetric n_fft//2 trim.  Zero-pad if length exceeds the buffer.
    if center:
        out = out[:, n_fft // 2 :]
    if length is not None:
        if out.shape[-1] >= length:
            out = out[:, :length]
        else:
            out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
    elif center:
        out = out[:, : t_full - 2 * (n_fft // 2)]
    return out.reshape(lead + (out.shape[-1],))
