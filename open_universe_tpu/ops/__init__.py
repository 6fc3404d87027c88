from .conv import (  # noqa: F401
    conv1d,
    conv_transpose1d,
    depthwise_conv1d_same,
    linear,
    pad_to_multiple,
)
from .stft import (  # noqa: F401
    frame,
    hann_window,
    istft,
    mel_filterbank,
    mel_spectrogram,
    spectrogram,
    stft,
)
