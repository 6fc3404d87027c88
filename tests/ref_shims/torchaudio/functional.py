import math

import torch


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate,
                    norm=None, mel_scale="htk"):
    """HTK-scale triangular mel filterbank, torchaudio algorithm."""
    if mel_scale != "htk" or norm is not None:
        raise NotImplementedError("shim supports htk/no-norm only")
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_min = 2595.0 * math.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * math.log10(1.0 + f_max / 700.0)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = 700.0 * (10 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels+2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    zero = torch.zeros(1)
    return torch.max(zero, torch.min(down_slopes, up_slopes))


def _get_sinc_resample_kernel(orig_freq, new_freq, gcd,
                              lowpass_filter_width=6, rolloff=0.99):
    orig_freq = int(orig_freq) // gcd
    new_freq = int(new_freq) // gcd
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = torch.arange(-width, width + orig_freq, dtype=torch.float64)[
        None, None] / orig_freq
    t = torch.arange(0, -new_freq, -1, dtype=torch.float64)[
        :, None, None] / new_freq + idx
    t *= base_freq
    t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)
    window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    t *= math.pi
    scale = base_freq / orig_freq
    kernels = torch.where(t == 0, torch.tensor(1.0, dtype=t.dtype),
                          t.sin() / t)
    kernels *= window * scale
    return kernels.to(torch.float32), width


def _apply_sinc_resample_kernel(waveform, orig_freq, new_freq, gcd,
                                kernel, width):
    orig_freq = int(orig_freq) // gcd
    new_freq = int(new_freq) // gcd
    shape = waveform.size()
    waveform = waveform.reshape(-1, shape[-1])
    num_wavs, length = waveform.shape
    waveform = torch.nn.functional.pad(waveform, (width, width + orig_freq))
    resampled = torch.nn.functional.conv1d(
        waveform[:, None], kernel, stride=orig_freq)
    resampled = resampled.transpose(1, 2).reshape(num_wavs, -1)
    target_length = int(math.ceil(new_freq * length / orig_freq))
    resampled = resampled[..., :target_length]
    return resampled.view(shape[:-1] + resampled.shape[-1:])


def resample(waveform, orig_freq, new_freq,
             lowpass_filter_width=6, rolloff=0.99):
    gcd = math.gcd(int(orig_freq), int(new_freq))
    kernel, width = _get_sinc_resample_kernel(
        orig_freq, new_freq, gcd, lowpass_filter_width, rolloff)
    return _apply_sinc_resample_kernel(
        waveform, orig_freq, new_freq, gcd, kernel, width)


def loudness(waveform, sample_rate):  # pragma: no cover - not used in tests
    raise NotImplementedError("torchaudio shim: loudness not implemented")
