"""Phoneme-based perceptual losses (reference losses/phoneme_loss.py).

Uses the *Flax* wav2vec2 CTC model (transformers FlaxWav2Vec2ForCTC) so the
loss is a pure JAX function and gradients flow through the enhanced waveform
— the TPU-native analog of the reference's frozen torch wav2vec2.  CTC uses
optax.ctc_loss.  Requires the HF checkpoint (downloaded on first use).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.snake import resample as _resample

DEFAULT_CHECKPOINT = "facebook/wav2vec2-lv-60-espeak-cv-ft"
W2V_SR = 16000


class PhonemePredictor:
    """Frozen Flax wav2vec2 CTC logits over a (B, T) waveform.

    ``model`` injects an already-constructed FlaxWav2Vec2ForCTC (any size);
    used by the tests to exercise the full loss path with a tiny
    randomly-initialized config, and usable for locally-cached weights.
    """

    def __init__(self, checkpoint: str = DEFAULT_CHECKPOINT, model=None):
        if model is None:
            try:
                from transformers import FlaxWav2Vec2ForCTC
            except ImportError as e:  # pragma: no cover
                raise RuntimeError(
                    "transformers is required for phoneme losses") from e
            model = FlaxWav2Vec2ForCTC.from_pretrained(checkpoint,
                                                       from_pt=True)
        self.model = model
        self.blank = self.model.config.pad_token_id
        self.sr = W2V_SR

    def __call__(self, waveform: jax.Array) -> jax.Array:
        if waveform.ndim == 3:
            waveform = waveform[..., 0] if waveform.shape[-1] == 1 else \
                waveform[:, :, 0]
        m = jnp.mean(waveform, axis=-1, keepdims=True)
        v = jnp.var(waveform, axis=-1, keepdims=True)
        x = (waveform - m) / jnp.sqrt(v + 1e-7)
        return self.model(x).logits


def _maybe_resample(x: jax.Array, sr: int) -> jax.Array:
    if sr == W2V_SR:
        return x
    if x.ndim == 2:
        x = x[:, :, None]
        return _resample(x, sr, W2V_SR)[..., 0]
    return _resample(x, sr, W2V_SR)


class PhonemeEmbeddingLoss:
    """MSE between phoneme logits of estimate and target."""

    def __init__(self, checkpoint: str = DEFAULT_CHECKPOINT, sr: int = 16000,
                 loss=None, model=None):
        self.sr = sr
        self.phoneme_predictor = PhonemePredictor(checkpoint, model=model)
        self.loss = loss or (lambda a, b: jnp.mean(jnp.square(a - b)))

    def __call__(self, input, target):
        li = self.phoneme_predictor(_maybe_resample(input, self.sr))
        lt = jax.lax.stop_gradient(
            self.phoneme_predictor(_maybe_resample(target, self.sr)))
        return self.loss(li, lt)


class PhonemeLoss:
    """Frame-wise cross-entropy against the target's argmax phonemes."""

    def __init__(self, checkpoint: str = DEFAULT_CHECKPOINT, sr: int = 16000,
                 model=None):
        self.sr = sr
        self.phoneme_predictor = PhonemePredictor(checkpoint, model=model)

    def __call__(self, input, target):
        li = self.phoneme_predictor(_maybe_resample(input, self.sr))
        lt = jax.lax.stop_gradient(
            self.phoneme_predictor(_maybe_resample(target, self.sr)))
        labels = jnp.argmax(lt, axis=-1)
        logp = jax.nn.log_softmax(li, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return jnp.mean(nll)


class PhonemeCTCLoss:
    """CTC loss on estimate logits vs the target's collapsed phoneme ids."""

    def __init__(self, checkpoint: str = DEFAULT_CHECKPOINT, sr: int = 16000,
                 model=None):
        self.sr = sr
        self.phoneme_predictor = PhonemePredictor(checkpoint, model=model)
        self.blank = self.phoneme_predictor.blank

    def _targets_to_ctc(self, target):
        lt = self.phoneme_predictor(_maybe_resample(target, self.sr))
        ids = np.asarray(jnp.argmax(lt, axis=-1))
        seqs, lengths = [], []
        for row in ids:
            dedup = row[np.insert(row[1:] != row[:-1], 0, True)]
            dedup = dedup[dedup != self.blank]
            seqs.append(dedup)
            lengths.append(len(dedup))
        s = max(max(lengths), 1)
        padded = np.full((len(seqs), s), self.blank, np.int32)
        for i, q in enumerate(seqs):
            padded[i, : len(q)] = q
        return jnp.asarray(padded), jnp.asarray(lengths, jnp.int32)

    def __call__(self, input, target):
        import optax

        logits = self.phoneme_predictor(_maybe_resample(input, self.sr))
        labels, label_lengths = self._targets_to_ctc(target)
        b, t, _ = logits.shape
        logit_pad = jnp.zeros((b, t), jnp.float32)
        label_pad = (jnp.arange(labels.shape[1])[None, :]
                     >= label_lengths[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                              blank_id=self.blank)
        return jnp.mean(loss / jnp.maximum(label_lengths, 1))
