"""Training losses (reference losses/ package parity)."""
from .combine import MultiLoss  # noqa: F401
from .multires_stft import MultiResL1SpecLoss  # noqa: F401


def __getattr__(name):
    if name in ("PhonemeLoss", "PhonemeCTCLoss", "PhonemeEmbeddingLoss",
                "PhonemePredictor"):
        from . import phoneme_loss

        return getattr(phoneme_loss, name)
    raise AttributeError(name)
