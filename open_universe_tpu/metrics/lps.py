"""Levenshtein phoneme similarity (reference metrics/lps.py).

LPS = 1 - levenshtein(phonemes(est), phonemes(ref)) / len(phonemes(ref)),
with phonemes predicted by wav2vec2-lv-60-espeak-cv-ft (CTC argmax decode).
Requires the optional transformers/torch stack and the HF checkpoint
(downloaded on first use; unavailable in offline environments).
"""
from __future__ import annotations

import numpy as np

from ..data.audio import resample_audio

WAV2VEC2_SR = 16000
DEFAULT_CHECKPOINT = "facebook/wav2vec2-lv-60-espeak-cv-ft"


class PhonemePredictor:
    def __init__(self, checkpoint: str = DEFAULT_CHECKPOINT):
        try:
            from transformers import Wav2Vec2ForCTC, Wav2Vec2Processor
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("transformers is required for LPS") from e
        self.processor = Wav2Vec2Processor.from_pretrained(checkpoint)
        self.model = Wav2Vec2ForCTC.from_pretrained(checkpoint)
        self.model.eval()
        self.sr = WAV2VEC2_SR

    def __call__(self, waveform) -> str:
        import torch

        if isinstance(waveform, np.ndarray):
            waveform = torch.from_numpy(np.asarray(waveform, np.float32))
        inputs = self.processor(waveform, return_tensors="pt",
                                sampling_rate=self.sr).input_values
        with torch.no_grad():
            logits = self.model(inputs).logits
        ids = logits.argmax(dim=-1)
        return self.processor.batch_decode(ids)[0]


def levenshtein_distance(a: str, b: str) -> int:
    """Plain DP edit distance — fallback when python-Levenshtein is absent."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _distance(a: str, b: str) -> int:
    try:
        from Levenshtein import distance
    except ImportError:
        return levenshtein_distance(a, b)
    return distance(a, b)


class LevenshteinPhonemeSimilarity:
    def __init__(self, sr: int = WAV2VEC2_SR,
                 checkpoint: str = DEFAULT_CHECKPOINT, predictor=None):
        """``predictor`` injects any waveform -> phoneme-string callable
        (tests use a mock; default is the wav2vec2 espeak CTC model)."""
        self.phoneme_predictor = predictor or PhonemePredictor(checkpoint)
        self.sr = sr

    def _maybe_resample(self, audio):
        pred_sr = getattr(self.phoneme_predictor, "sr", WAV2VEC2_SR)
        if self.sr != pred_sr:
            return resample_audio(np.asarray(audio), self.sr, pred_sr)
        return audio

    def __call__(self, sample, reference) -> float:
        sample = self._maybe_resample(sample)
        reference = self._maybe_resample(reference)
        sample_ph = self.phoneme_predictor(sample).replace(" ", "")
        ref_ph = self.phoneme_predictor(reference).replace(" ", "")
        return 1.0 - _distance(sample_ph, ref_ph) / len(ref_ph)
