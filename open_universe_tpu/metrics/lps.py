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


class LevenshteinPhonemeSimilarity:
    def __init__(self, sr: int = WAV2VEC2_SR,
                 checkpoint: str = DEFAULT_CHECKPOINT):
        self.phoneme_predictor = PhonemePredictor(checkpoint)
        self.sr = sr

    def _maybe_resample(self, audio):
        if self.sr != self.phoneme_predictor.sr:
            return resample_audio(np.asarray(audio), self.sr,
                                  self.phoneme_predictor.sr)
        return audio

    def __call__(self, sample, reference) -> float:
        from Levenshtein import distance

        sample = self._maybe_resample(sample)
        reference = self._maybe_resample(reference)
        sample_ph = self.phoneme_predictor(sample).replace(" ", "")
        ref_ph = self.phoneme_predictor(reference).replace(" ", "")
        return 1.0 - distance(sample_ph, ref_ph) / len(ref_ph)
