"""Metrics and loss tests: LSD vs torch oracle, SI-SDR, STOI sanity,
multires loss vs torch oracle."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from open_universe_tpu.losses.multires_stft import MultiResL1SpecLoss
from open_universe_tpu.metrics.bss import sdr, si_sdr
from open_universe_tpu.metrics.lsd import log_spectral_distance
from open_universe_tpu.metrics.stoi import stoi


def _torch_lsd(inp, tgt, n_fft=400, hop=160, eps=1e-7):
    window = torch.hann_window(n_fft)

    def spec(x):
        z = torch.stft(x, n_fft, hop, win_length=n_fft, window=window,
                       center=True, return_complex=True)
        p = (z.abs() / window.pow(2).sum().sqrt()) ** 2
        return 10 * torch.log10(p + eps)

    si, st = spec(inp), spec(tgt)
    denom = (si.shape[-1] * si.shape[-2]) ** 0.5
    return (torch.norm(si - st, p=2, dim=(-2, -1)) / denom).numpy()


def test_lsd_matches_torch_oracle(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    y = x + rng.standard_normal((2, 8000)).astype(np.float32) * 0.01
    ref = _torch_lsd(torch.from_numpy(y), torch.from_numpy(x))
    ours = np.asarray(log_spectral_distance(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-3)


def test_si_sdr_known_value(rng):
    ref = rng.standard_normal(16000)
    noise = rng.standard_normal(16000)
    noise *= np.linalg.norm(ref) / np.linalg.norm(noise) / 10 ** (20 / 20)
    est = ref + noise
    val = si_sdr(ref, est)
    assert abs(val - 20.0) < 0.2, val
    assert si_sdr(ref, ref * 3.0) > 50  # scale invariance


def test_sdr_filtered_signal(rng):
    ref = rng.standard_normal(16000)
    # a short FIR of ref should give very high SDR (filter-invariant)
    h = np.array([0.9, 0.05, -0.02])
    est = np.convolve(ref, h)[:16000]
    assert sdr(ref, est) > 40
    assert sdr(ref, est) > si_sdr(ref, est)


def test_stoi_sanity(rng):
    t = 3 * 16000
    clean = np.sin(2 * np.pi * 300 * np.arange(t) / 16000) * (
        0.5 + 0.5 * np.sin(2 * np.pi * 3 * np.arange(t) / 16000))
    clean += 0.3 * rng.standard_normal(t) * np.abs(np.sin(
        2 * np.pi * 1.3 * np.arange(t) / 16000))
    v_self = stoi(clean, clean, 16000)
    assert v_self > 0.99
    noisy1 = clean + 0.1 * rng.standard_normal(t)
    noisy2 = clean + 0.7 * rng.standard_normal(t)
    v1, v2 = stoi(clean, noisy1, 16000), stoi(clean, noisy2, 16000)
    assert v1 > v2, (v1, v2)
    e_self = stoi(clean, clean, 16000, extended=True)
    assert e_self > 0.99
    assert stoi(clean, noisy1, 16000, extended=True) > stoi(
        clean, noisy2, 16000, extended=True)


def test_multires_loss_matches_torch_oracle(rng):
    est = rng.standard_normal((2, 4000)).astype(np.float32) * 0.2
    tgt = rng.standard_normal((2, 4000)).astype(np.float32) * 0.2
    for si in (False, True):
        loss = MultiResL1SpecLoss(window_sz=[512, 256], scale_invariant=si)
        ours = float(loss(jnp.asarray(est), jnp.asarray(tgt)))

        te, tt = torch.from_numpy(est), torch.from_numpy(tgt)
        if si:
            a = (te * tt).sum(-1, keepdim=True) / (te.pow(2).sum(
                -1, keepdim=True) + 1e-8)
        else:
            a = torch.tensor(1.0)
        tl = (te * a - tt).abs().mean(dim=1)
        sl = torch.zeros_like(tl)
        for w in (512, 256):
            win = torch.hann_window(w)
            zt = torch.stft(tt, w, w // 2, window=win, center=True,
                            pad_mode="constant", return_complex=True)
            ze = torch.stft(te * a, w, w // 2, window=win, center=True,
                            pad_mode="constant", return_complex=True)
            sl += (ze.abs() - zt.abs()).abs().mean(dim=(1, 2))
        ref = float((tl * 0.5 + 0.5 * sl / 2).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_metrics_wrapper_dispatch(rng):
    from open_universe_tpu.metrics import Metrics

    m = Metrics(["si-sdr", "sdr", "lsd", "si-lsd", "stoi", "stoi-ext"])
    t = 2 * 16000
    ref = (np.sin(2 * np.pi * 200 * np.arange(t) / 16000)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * np.arange(t) / 16000))
           + 0.1 * rng.standard_normal(t)).astype(np.float32)
    deg = ref + 0.05 * rng.standard_normal(t).astype(np.float32)
    out = m(16000, deg, ref)
    assert set(out) == {"si-sdr", "sdr", "lsd", "si-lsd", "stoi", "stoi-ext"}
    assert out["si-sdr"] > 10
    assert 0 < out["stoi-ext"] <= 1
