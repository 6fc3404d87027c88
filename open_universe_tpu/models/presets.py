"""Model presets mirroring the reference experiment configurations."""
from __future__ import annotations

from typing import Optional

from .condition import ConditionerNetwork
from .score import ScoreNetwork
from .universe import Universe
from .universe_gan import UniverseGAN

_GAN_LOSSES = {
    "multi_period_discriminator": {
        "mpd_reshapes": [2, 3, 5, 7, 11],
        "use_spectral_norm": False,
        "discriminator_channel_mult": 1,
    },
    "multi_resolution_discriminator": {
        "resolutions": [[1024, 120, 600], [2048, 240, 1200], [512, 50, 240]],
        "use_spectral_norm": False,
        "discriminator_channel_mult": 1,
    },
    "disc_freeze_step": 0,
    "weights": {"mel_l1": 45.0, "score": 1.0},
    "use_signal_decoupling": True,
    "signal_decoupling_act": "snake",
}


def universepp(fs: int = 16000, audio_len: float = 2.0) -> UniverseGAN:
    """UNIVERSE++ (config/model/default.yaml for 16k, universepp_24k.yaml)."""
    if fs == 16000:
        rate_factors, n_channels, n_mels = [2, 4, 4, 5], 32, 80
    elif fs == 24000:
        rate_factors, n_channels, n_mels = [2, 3, 5, 8], 48, 128
    else:
        raise ValueError(f"unsupported fs {fs}")
    score = ScoreNetwork(
        fb_kernel_size=3, rate_factors=rate_factors, n_channels=n_channels,
        n_rff=32, noise_cond_dim=512, extra_conv_block=True,
        use_weight_norm=True, use_antialiasing=True, time_embedding="simple")
    cond = ConditionerNetwork(
        fb_kernel_size=3, rate_factors=rate_factors, n_channels=n_channels,
        n_mels=n_mels, n_mel_oversample=4, encoder_gru_residual=True,
        extra_conv_block=True, use_weight_norm=True, use_antialiasing=False)
    return UniverseGAN(
        fs=fs, normalization_norm=2,
        normalization_kwargs={"ref": "both", "level_db": -26.0},
        score_model=score, condition_model=cond,
        diffusion={"schedule": "geometric", "sigma_min": 0.0005,
                   "sigma_max": 5.0, "n_steps": 8, "epsilon": 1.3},
        losses=dict(_GAN_LOSSES),
        training={"audio_len": audio_len, "time_sampling": "time_normal_0.95",
                  "dynamic_mixing": False, "ema_decay": 0.999},
        edm={"noise": 0.25},
    )


def universe_original(fs: int = 16000, audio_len: float = 2.0) -> Universe:
    """Plain UNIVERSE with MDN losses (config/model/universe_original.yaml)."""
    score = ScoreNetwork(
        fb_kernel_size=3, rate_factors=[2, 4, 4, 5], n_channels=32, n_rff=32,
        noise_cond_dim=512, extra_conv_block=True, use_weight_norm=False,
        use_antialiasing=False)
    cond = ConditionerNetwork(
        fb_kernel_size=3, rate_factors=[2, 4, 4, 5], n_channels=32, n_mels=80,
        n_mel_oversample=4, encoder_gru_residual=True, extra_conv_block=True,
        use_weight_norm=False, use_antialiasing=False)
    return Universe(
        fs=fs, normalization_norm=2,
        normalization_kwargs={"ref": "both", "level_db": -26.0},
        score_model=score, condition_model=cond,
        diffusion={"schedule": "geometric", "sigma_min": 5e-4, "sigma_max": 5.0,
                   "n_steps": 8, "epsilon": 1.3},
        losses={"weights": {"score": 1.0, "signal": 1.0, "latent": 1.0},
                "mdn_n_comp": 3, "mdn_alpha_per_sample": True},
        training={"audio_len": audio_len, "time_sampling": "time_uniform",
                  "dynamic_mixing": False, "ema_decay": 0.999},
    )
