"""MP3/FLAC codec tests (data/codecs.py) and audio IO dispatch.

The reference reads wav/mp3/flac through torchaudio (reference
bin/enhance.py:173-178); this image has neither torchaudio nor libsndfile,
so MP3 goes through ctypes libmpg123/libmp3lame and FLAC through the
in-house pure-Python codec.  FLAC is lossless -> bit-exact round-trips.
"""
import ctypes

import numpy as np
import pytest

from open_universe_tpu.data.audio import load_audio, save_audio
from open_universe_tpu.data.codecs import (decode_flac, decode_mp3,
                                           encode_flac, encode_mp3)


def _have_lib(name):
    try:
        ctypes.CDLL(name)
        return True
    except OSError:
        return False


mp3_available = pytest.mark.skipif(
    not (_have_lib("libmpg123.so.0") and _have_lib("libmp3lame.so.0")),
    reason="system mp3 libraries not present")


def _tone(fs, seconds, freq, channels=1, seed=0):
    t = np.arange(int(fs * seconds)) / fs
    rng = np.random.default_rng(seed)
    x = np.stack([0.5 * np.sin(2 * np.pi * (freq + 50 * c) * t)
                  + 0.01 * rng.standard_normal(len(t))
                  for c in range(channels)])
    return x.astype(np.float32)


def _quantize(x, bps=16):
    scale = float(1 << (bps - 1))
    return np.clip(np.round(x * scale), -scale, scale - 1) / scale


# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels,mode", [
    (1, "independent"),
    (2, "independent"),
    (2, "left_side"),
    (2, "right_side"),
    (2, "mid_side"),
])
def test_flac_roundtrip_bit_exact(tmp_path, channels, mode):
    fs = 16000
    x = _tone(fs, 0.7, 440.0, channels=channels)
    path = tmp_path / "clip.flac"
    encode_flac(path, x, fs, stereo_mode=mode)
    y, fs2 = decode_flac(path)
    assert fs2 == fs
    assert y.shape == x.shape
    np.testing.assert_array_equal(y, _quantize(x))


def test_flac_nonstandard_blocksize_and_rate(tmp_path):
    # odd blocksize exercises bs_code 7 (16-bit explicit) and a partial
    # last frame; fs 11025 is not in the rate table -> sr_code 14
    fs = 11025
    x = _tone(fs, 0.31, 330.0)
    path = tmp_path / "odd.flac"
    encode_flac(path, x, fs, block_size=1000)
    y, fs2 = decode_flac(path)
    assert fs2 == fs
    np.testing.assert_array_equal(y, _quantize(x))


def test_flac_constant_and_silence(tmp_path):
    fs = 16000
    x = np.zeros((1, 5000), np.float32)
    x[0, :2048] = 0.25  # constant non-zero block
    path = tmp_path / "const.flac"
    encode_flac(path, x, fs, block_size=2048)
    y, fs2 = decode_flac(path)
    np.testing.assert_array_equal(y, _quantize(x))


def test_flac_noise_uses_verbatim_or_high_order(tmp_path):
    # full-scale white noise defeats the fixed predictors
    fs = 16000
    rng = np.random.default_rng(3)
    x = (rng.uniform(-1, 1, (1, 4096))).astype(np.float32)
    path = tmp_path / "noise.flac"
    encode_flac(path, x, fs)
    y, _ = decode_flac(path)
    np.testing.assert_array_equal(y, _quantize(x))


def test_flac_crc_detects_corruption(tmp_path):
    fs = 16000
    x = _tone(fs, 0.2, 500.0)
    path = tmp_path / "ok.flac"
    encode_flac(path, x, fs)
    data = bytearray(path.read_bytes())
    data[-40] ^= 0xFF  # flip a byte inside the last frame
    bad = tmp_path / "bad.flac"
    bad.write_bytes(bytes(data))
    with pytest.raises((ValueError, EOFError)):
        decode_flac(bad)


def test_flac_rejects_non_flac(tmp_path):
    p = tmp_path / "x.flac"
    p.write_bytes(b"RIFFxxxx")
    with pytest.raises(ValueError):
        decode_flac(p)


# ---------------------------------------------------------------------------
# MP3
# ---------------------------------------------------------------------------


@mp3_available
@pytest.mark.parametrize("channels", [1, 2])
def test_mp3_roundtrip_close(tmp_path, channels):
    fs = 16000
    x = _tone(fs, 1.0, 440.0, channels=channels)
    path = tmp_path / "clip.mp3"
    encode_mp3(path, x, fs)
    y, fs2 = decode_mp3(path)
    assert fs2 == fs
    assert y.shape[0] == channels
    # lossy + codec delay: align by cross-correlation, then check SNR
    a = x[0]
    b = y[0, : len(a) + 4000]
    corr = np.correlate(b, a[: fs // 2], mode="valid")
    lag = int(np.argmax(corr))
    n = min(len(a), len(b) - lag) - fs // 100  # drop the final frames
    err = a[:n] - b[lag: lag + n]
    snr = 10 * np.log10(np.sum(a[:n] ** 2) / max(np.sum(err ** 2), 1e-12))
    assert snr > 20.0, f"mp3 roundtrip SNR {snr:.1f} dB"


# ---------------------------------------------------------------------------
# audio.py dispatch
# ---------------------------------------------------------------------------


def test_load_save_dispatch_flac(tmp_path):
    fs = 16000
    x = _tone(fs, 0.3, 220.0)
    p = tmp_path / "clip.flac"
    save_audio(p, x[0], fs)
    y, fs2 = load_audio(p)
    assert fs2 == fs and y.shape == (1, x.shape[1])
    np.testing.assert_array_equal(y[0], _quantize(x[0]))


@mp3_available
def test_load_save_dispatch_mp3(tmp_path):
    fs = 16000
    x = _tone(fs, 0.3, 220.0)
    p = tmp_path / "clip.mp3"
    save_audio(p, x, fs)
    y, fs2 = load_audio(p)
    assert fs2 == fs and y.ndim == 2


def test_dataset_reads_flac(tmp_path):
    from open_universe_tpu.data.dataset import NoisyDataset

    fs = 16000
    for split in ("clean", "noisy"):
        d = tmp_path / "train" / split
        d.mkdir(parents=True)
        for i in range(2):
            x = _tone(fs, 0.4, 300.0 + 10 * i, seed=i)
            encode_flac(d / f"c{i}.flac", x, fs)
    ds = NoisyDataset(tmp_path, split="train", fs=fs, audio_len=0.25)
    assert len(ds) == 2
    noisy, clean, key = ds[0]
    assert noisy.shape[-1] == int(0.25 * fs)
    assert np.max(np.abs(noisy)) > 0.1
