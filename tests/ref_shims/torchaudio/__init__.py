"""Minimal torchaudio stand-in for the reference code's two uses:

- ``transforms.MelSpectrogram`` (reference condition.py:75-81)
- ``transforms.Resample`` (reference alias_free_act.py:21-22)

Both are independent re-implementations of the published torchaudio
algorithms (HTK mel filterbank; sinc_interp_hann polyphase resampling with
lowpass_filter_width=6, rolloff=0.99).  They are deliberately NOT derived
from the JAX port under test, so a disagreement between the two fails the
golden tests instead of hiding a shared bug.
"""
from . import functional, transforms  # noqa: F401
