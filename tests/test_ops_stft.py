"""Golden-parity tests: JAX STFT/mel vs torch.stft + torchaudio formulas."""
import math

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from open_universe_tpu.ops import (
    hann_window,
    istft,
    mel_filterbank,
    mel_spectrogram,
    spectrogram,
    stft,
)


def test_hann_window_matches_torch():
    for n in (16, 640, 1024):
        np.testing.assert_allclose(
            np.asarray(hann_window(n)), torch.hann_window(n).numpy(), atol=1e-6
        )


@pytest.mark.parametrize("n_fft,hop,win", [(640, 160, 640), (1024, 120, 600), (512, 50, 240), (256, 100, 256)])
def test_stft_matches_torch(rng, n_fft, hop, win):
    t = 4000
    x = rng.standard_normal((3, t)).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        return_complex=True,
    ).numpy()  # (B, F, frames)
    z = stft(jnp.asarray(x), n_fft, hop, win_length=win, center=False)
    z = np.asarray(z).transpose(0, 2, 1)
    np.testing.assert_allclose(z.real, ref.real, atol=2e-3)
    np.testing.assert_allclose(z.imag, ref.imag, atol=2e-3)


def test_stft_center_reflect(rng):
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=320, hop_length=160,
        window=torch.hann_window(320), center=True, return_complex=True,
    ).numpy()
    z = np.asarray(stft(jnp.asarray(x), 320, 160, center=True)).transpose(0, 2, 1)
    np.testing.assert_allclose(z.real, ref.real, atol=1e-3)
    np.testing.assert_allclose(z.imag, ref.imag, atol=1e-3)


def test_mel_filterbank_matches_torchaudio_formula():
    # Independent reimplementation of torchaudio.functional.melscale_fbanks
    # (HTK scale, norm=None) used as the oracle.
    n_freqs, n_mels, sr = 321, 80, 24000
    f_min, f_max = 0.0, 12000.0
    all_freqs = torch.linspace(0, sr // 2, n_freqs)
    m_min = 2595.0 * math.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * math.log10(1.0 + f_max / 700.0)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    ref = torch.clamp(torch.min(down_slopes, up_slopes), min=0.0).numpy()
    fb = np.asarray(mel_filterbank(n_freqs, n_mels, sr))
    np.testing.assert_allclose(fb, ref, atol=1e-5)


def test_mel_spectrogram_shape_and_energy(rng):
    x = rng.standard_normal((2, 32480)).astype(np.float32)
    mel = mel_spectrogram(jnp.asarray(x), 24000, n_fft=640, hop=160, n_mels=80)
    assert mel.shape == (2, 80, (32480 - 640) // 160 + 1)
    assert np.all(np.asarray(mel) >= 0)


def test_istft_roundtrip(rng):
    x = rng.standard_normal((2, 1600)).astype(np.float32)
    n_fft, hop = 320, 80
    z = stft(jnp.asarray(x), n_fft, hop, center=True)
    y = istft(z, n_fft, hop, length=1600, center=True)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)
