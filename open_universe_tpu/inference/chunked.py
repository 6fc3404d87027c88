"""Chunked (overlap-add) enhancement for arbitrarily long audio.

The reference processes each utterance whole (universe.py:219-226 pads to a
multiple of 160 and runs the full length), which on TPU means one XLA
compilation per input length and unbounded memory for long recordings.  This
module is the TPU-native serving path the reference lacks:

  * the waveform is split into fixed-length chunks with symmetric overlap,
    so ONE compiled program (static shape) serves any duration;
  * chunks are batched (``max_batch``) to fill the chip;
  * outputs are blended by overlap-add with raised-cosine crossfades and a
    weight normalization, so seams are inaudible while each chunk still sees
    ``overlap``/2 seconds of context on both sides.

The conditioner/GRU context and the loudness normalization are per-chunk;
``keep_rms`` defaults to True here so every chunk is rescaled back to its
input RMS and the output follows the recording's own level contour (without
it, enhance() returns each chunk at the normalized target level and a quiet
chunk's noise floor would be blown up).  With the default 10 s chunks and
25% overlap the remaining boundary differences are far below the diffusion
sampler's own noise floor.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import numpy as np


def _crossfade_window(chunk: int, ov: int) -> np.ndarray:
    """Raised-cosine ramps of length ``ov`` at both ends, flat middle.

    Built as the PRODUCT of an up-ramp and a down-ramp so the window stays
    smooth when ov > chunk/2 (the two ramps then overlap; sequential
    assignment would overwrite part of the head ramp and leave a
    mid-overlap jump).  For ov <= chunk/2 the product equals the classic
    ramp/flat/ramp window.  Weight normalization in the blender handles the
    non-unity overlap sums either way."""
    w = np.ones(chunk, np.float32)
    if ov > 0:
        ramp = (0.5 - 0.5 * np.cos(np.pi * (np.arange(ov) + 0.5) / ov)
                ).astype(np.float32)
        head = np.ones(chunk, np.float32)
        head[:ov] = ramp
        tail = np.ones(chunk, np.float32)
        tail[-ov:] = ramp[::-1]
        w = head * tail
    return w


def make_chunked_enhancer(
    model,
    chunk_seconds: float = 10.0,
    overlap: float = 0.25,
    max_batch: int = 8,
    **enhance_kwargs,
) -> Callable:
    """Build ``fn(params, mix, key) -> enhanced`` for long-form audio.

    mix: numpy/jax array (T,) or (B, T); rows share the sample rate
    ``model.fs``.  All chunks of all rows are processed through a single
    jitted enhance program with static shape (max_batch, chunk).
    """
    import jax
    import jax.numpy as jnp

    if not 0.0 <= overlap < 1.0:
        # negative overlap would make hop > chunk, leaving sample ranges no
        # chunk covers (near-silent gaps via the weight floor, not an error)
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    chunk = int(round(chunk_seconds * model.fs))
    ov = int(round(chunk * overlap))
    hop = chunk - ov
    if hop < 1:
        # overlap < 1 does not guarantee hop >= 1 after rounding (e.g.
        # overlap=0.999997 at chunk=160000 rounds ov up to chunk)
        raise ValueError(
            f"chunk_seconds={chunk_seconds} with overlap={overlap} leaves a "
            f"hop of {hop} samples; increase the chunk or lower the overlap")

    # enhance() loudness-normalizes each batch row independently and returns
    # output at the normalized level; blended chunks would therefore carry
    # per-chunk gains (a near-silent chunk gets its noise floor blown up to
    # the target level).  keep_rms=True rescales every chunk back to its
    # input RMS, so the output follows the recording's own level contour and
    # chunks blend seamlessly.  Callers can still override it explicitly.
    enhance_kwargs = dict(enhance_kwargs)
    enhance_kwargs.setdefault("keep_rms", True)

    @jax.jit
    def _enhance(params, mix, key):
        return model.enhance(params, mix, key=key, **enhance_kwargs)

    window = _crossfade_window(chunk, ov)

    def enhance_chunked(params, mix, key=None):
        if key is None:
            key = jax.random.key(0)
        x = np.asarray(mix, np.float32)
        single = x.ndim == 1
        if single:
            x = x[None]
        b, t = x.shape

        # the general overlap-add path also covers t <= chunk (n_chunks=1,
        # and out*w/w == out exactly)
        n_chunks = max(1, math.ceil(max(t - ov, 1) / hop))
        t_pad = (n_chunks - 1) * hop + chunk
        xp = np.pad(x, ((0, 0), (0, t_pad - t)))
        starts = np.arange(n_chunks) * hop
        frames = np.stack([xp[:, s : s + chunk] for s in starts], axis=1)
        flat = frames.reshape(b * n_chunks, chunk)

        outs = np.empty_like(flat)
        for i in range(0, flat.shape[0], max_batch):
            blk = flat[i : i + max_batch]
            bpad = max_batch - blk.shape[0]
            if bpad:
                blk = np.pad(blk, ((0, bpad), (0, 0)))
            key, sub = jax.random.split(key)
            out = np.asarray(_enhance(params, jnp.asarray(blk), sub))
            outs[i : i + max_batch] = out[: blk.shape[0] - bpad]

        outs = outs.reshape(b, n_chunks, chunk)
        acc = np.zeros((b, t_pad), np.float32)
        wacc = np.zeros(t_pad, np.float32)
        for j, s in enumerate(starts):
            acc[:, s : s + chunk] += outs[:, j] * window
            wacc[s : s + chunk] += window
        acc /= np.maximum(wacc, 1e-8)[None, :]
        acc = acc[:, :t]
        return acc[0] if single else acc

    return enhance_chunked


def enhance_chunked(model, params, mix, key=None, chunk_seconds: float = 10.0,
                    overlap: float = 0.25, max_batch: int = 8,
                    **enhance_kwargs):
    """One-shot convenience wrapper around :func:`make_chunked_enhancer`.

    NOTE: builds (and jit-caches) a fresh enhancer per call; for repeated
    use construct the enhancer once via ``make_chunked_enhancer``.
    """
    fn = make_chunked_enhancer(model, chunk_seconds=chunk_seconds,
                               overlap=overlap, max_batch=max_batch,
                               **enhance_kwargs)
    return fn(params, mix, key=key)
