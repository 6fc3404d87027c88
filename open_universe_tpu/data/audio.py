"""Audio file IO and CPU-side resampling (no torchaudio/soundfile needed).

The reference enhance CLI accepts wav/mp3/flac (reference
bin/enhance.py:173-178, via torchaudio).  Here: WAV is read/written with
scipy (PCM 16/24/32 and float), MP3 via ctypes libmpg123/libmp3lame, FLAC
via the in-house codec (data/codecs.py); ogg falls back to the optional
``soundfile`` package.  Resampling uses the same windowed-sinc polyphase
design as our on-device resampler (torchaudio-compatible).
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Tuple, Union

import numpy as np

from ..nn.snake import _sinc_kernel_np

AUDIO_EXTS = (".wav", ".flac", ".mp3", ".ogg")


def load_audio(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Returns (audio (channels, T) float32 in [-1, 1], sample_rate)."""
    path = Path(path)
    if path.suffix.lower() == ".wav":
        from scipy.io import wavfile

        fs, data = wavfile.read(path)
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 1:
            data = data[None, :]
        else:
            data = data.T
        return np.ascontiguousarray(data), int(fs)
    if path.suffix.lower() == ".mp3":
        from .codecs import decode_mp3

        return decode_mp3(path)
    if path.suffix.lower() == ".flac":
        from .codecs import decode_flac

        return decode_flac(path)
    try:
        import soundfile as sf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            f"reading {path.suffix} requires the optional 'soundfile' package"
        ) from e
    data, fs = sf.read(path, dtype="float32", always_2d=True)
    return np.ascontiguousarray(data.T), int(fs)


def save_audio(path: Union[str, Path], audio: np.ndarray, fs: int):
    """audio: (channels, T) or (T,) float32. Container chosen by suffix."""
    path = Path(path)
    audio = np.asarray(audio)
    if path.suffix.lower() == ".mp3":
        from .codecs import encode_mp3

        encode_mp3(path, np.clip(audio, -1.0, 1.0), fs)
        return
    if path.suffix.lower() == ".flac":
        from .codecs import encode_flac

        encode_flac(path, np.clip(audio, -1.0, 1.0), fs)
        return
    from scipy.io import wavfile

    if audio.ndim == 2:
        audio = audio.T  # scipy expects (T, C)
    pcm = np.clip(audio, -1.0, 1.0)
    wavfile.write(str(path), fs, (pcm * 32767.0).astype(np.int16))


def resample_audio(x: np.ndarray, orig_fs: int, new_fs: int) -> np.ndarray:
    """Polyphase sinc resample along the last axis (numpy, float64 kernel)."""
    if orig_fs == new_fs:
        return x
    kernel, width, orig, new = _sinc_kernel_np(orig_fs, new_fs)
    shape = x.shape
    xf = np.asarray(x, np.float32).reshape(-1, shape[-1])
    t = shape[-1]
    xp = np.pad(xf, ((0, 0), (width, width + orig)))
    n_frames = (xp.shape[-1] - kernel.shape[1]) // orig + 1
    idx = np.arange(kernel.shape[1])[None, :] + orig * np.arange(n_frames)[:, None]
    frames = xp[:, idx]  # (B, frames, taps)
    y = np.einsum("bft,pt->bfp", frames, kernel)  # (B, frames, phases)
    y = y.reshape(xf.shape[0], -1)
    target = int(math.ceil(new * t / orig))
    return y[:, :target].reshape(shape[:-1] + (target,)).astype(np.float32)
