import math

import torch

from . import functional as F


class MelSpectrogram(torch.nn.Module):
    """torchaudio.transforms.MelSpectrogram subset: power-2 spectrogram with
    hann window + HTK mel filterbank (norm=None).  Supports center=False as
    used by the reference MelAdapter (condition.py:75-81)."""

    def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                 hop_length=None, f_min=0.0, f_max=None, pad=0, n_mels=128,
                 power=2.0, normalized=False, center=True,
                 pad_mode="reflect", norm=None, mel_scale="htk"):
        super().__init__()
        if normalized or pad != 0:
            raise NotImplementedError
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = hop_length if hop_length is not None else self.win_length // 2
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else float(sample_rate // 2)
        self.power = power
        self.center = center
        self.pad_mode = pad_mode
        # buffers live on submodules named exactly like real torchaudio's
        # (spectrogram.window / mel_scale.fb) so state_dict keys match
        self.spectrogram = torch.nn.Module()
        self.spectrogram.register_buffer("window", torch.hann_window(self.win_length))
        fb = F.melscale_fbanks(n_fft // 2 + 1, self.f_min, self.f_max,
                               n_mels, sample_rate, norm, mel_scale)
        self.mel_scale = torch.nn.Module()
        self.mel_scale.register_buffer("fb", fb)

    def forward(self, waveform):
        shape = waveform.size()
        waveform = waveform.reshape(-1, shape[-1])
        spec = torch.stft(
            waveform, n_fft=self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.spectrogram.window,
            center=self.center, pad_mode=self.pad_mode, normalized=False,
            onesided=True, return_complex=True)
        spec = spec.abs() ** self.power  # (B, F, T)
        mel = torch.matmul(spec.transpose(-1, -2),
                           self.mel_scale.fb).transpose(-1, -2)
        return mel.view(shape[:-1] + mel.shape[-2:])


class Spectrogram(torch.nn.Module):
    """torchaudio.transforms.Spectrogram subset as used by the reference
    MultiResL1SpecLoss (losses/multires_stft.py:65-75): hann window,
    center=True, pad_mode='constant', power=None (complex output)."""

    def __init__(self, n_fft=400, win_length=None, hop_length=None, pad=0,
                 window_fn=torch.hann_window, power=2.0, normalized=False,
                 center=True, pad_mode="reflect", onesided=True):
        super().__init__()
        if normalized or pad != 0 or not onesided:
            raise NotImplementedError
        self.n_fft = n_fft
        self.win_length = win_length if win_length is not None else n_fft
        self.hop_length = (hop_length if hop_length is not None
                           else self.win_length // 2)
        self.power = power
        self.center = center
        self.pad_mode = pad_mode
        self.register_buffer("window", window_fn(self.win_length))

    def forward(self, waveform):
        shape = waveform.size()
        waveform = waveform.reshape(-1, shape[-1])
        spec = torch.stft(
            waveform, n_fft=self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window,
            center=self.center, pad_mode=self.pad_mode, normalized=False,
            onesided=True, return_complex=True)
        if self.power is not None:
            spec = spec.abs() ** self.power
        return spec.view(shape[:-1] + spec.shape[-2:])


class Resample(torch.nn.Module):
    """torchaudio.transforms.Resample subset (sinc_interp_hann defaults)."""

    def __init__(self, orig_freq=16000, new_freq=16000,
                 resampling_method="sinc_interp_hann",
                 lowpass_filter_width=6, rolloff=0.99, beta=None):
        super().__init__()
        if resampling_method != "sinc_interp_hann":
            raise NotImplementedError
        self.orig_freq = int(orig_freq)
        self.new_freq = int(new_freq)
        self.gcd = math.gcd(self.orig_freq, self.new_freq)
        kernel, self.width = F._get_sinc_resample_kernel(
            self.orig_freq, self.new_freq, self.gcd,
            lowpass_filter_width, rolloff)
        self.register_buffer("kernel", kernel)

    def forward(self, waveform):
        if self.orig_freq == self.new_freq:
            return waveform
        return F._apply_sinc_resample_kernel(
            waveform, self.orig_freq, self.new_freq, self.gcd,
            self.kernel, self.width)
