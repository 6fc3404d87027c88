"""Speech-quality metrics (reference metrics/ package parity).

In-house implementations: LSD/si-LSD (JAX), SI-SDR and CI-SDR, STOI/ESTOI.
Optional-dependency wrappers: PESQ (pesq), DNSMOS + PLCMOS (onnxruntime +
model files), LPS (transformers wav2vec2), WER (whisper).
"""
from .bss import sdr, si_sdr  # noqa: F401
from .eval import EvalMetrics  # noqa: F401
from .lsd import log_spectral_distance  # noqa: F401
from .stoi import stoi  # noqa: F401
from .wrapper import Metrics  # noqa: F401


def __getattr__(name):
    # heavy/optional imports resolved lazily
    if name == "PESQ":
        from .pesq import PESQ

        return PESQ
    if name == "Compute_DNSMOS":
        from .dnsmos import Compute_DNSMOS

        return Compute_DNSMOS
    if name == "PLCMOSEstimator":
        from .plcmos import PLCMOSEstimator

        return PLCMOSEstimator
    if name == "LevenshteinPhonemeSimilarity":
        from .lps import LevenshteinPhonemeSimilarity

        return LevenshteinPhonemeSimilarity
    if name == "wer":
        from .wer import wer

        return wer
    raise AttributeError(name)
