"""WER wildcard distance (reference's own smoke examples), loudness sanity,
signal_median, transforms roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.metrics.loudness import loudness
from open_universe_tpu.metrics.wer import wer, word_edit_distance
from open_universe_tpu.models.transforms import CompressedMagSTFT
from open_universe_tpu.utils import signal_median


def test_word_edit_distance_wildcard():
    wc = "<ignore/>"
    d = lambda a, b: word_edit_distance(a, b, wildcard=wc)[0]
    assert d("hello robin!", "hello robin!") == 0
    assert d("hello robin!", "hello robin") == 0  # punctuation removed
    assert d("hello robin", "hello <ignore/> robin") == 0
    assert d("hello robin", "hello <ignore/>") == 0
    assert d("hello robin shark", "hello <ignore/>") == 0
    assert d("hello <ignore/> robin", "hello robin shark") == 1
    assert d("a b c", "a x c") == 1
    assert d("a b c", "x y z") == 3


def test_wer_corpus():
    refs = ["the cat sat", "on the mat"]
    hyps = ["the cat sat", "on a mat"]
    assert abs(wer(refs, hyps) - 1 / 6) < 1e-9


def test_loudness_gain_relationship(rng):
    fs = 16000
    x = 0.1 * np.sin(2 * np.pi * 997 * np.arange(3 * fs) / fs)
    l1 = loudness(x, fs)
    l2 = loudness(2 * x, fs)
    assert abs((l2 - l1) - 20 * np.log10(2)) < 0.1
    # a ~1 kHz tone at amplitude a has loudness ~ -0.691 + 20 log10(a/sqrt(2)) ± shelf
    assert -30 < l1 < -15


def test_signal_median_majority():
    # ensemble of 5; members 0..3 equal, member 4 an outlier
    base = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2, 50)))
    ens = jnp.concatenate([base + 0.01 * i for i in range(4)]
                          + [base + 100.0], axis=0)
    med = signal_median(ens)
    err_good = float(jnp.abs(med - base[0]).max())
    assert err_good < 0.1


def test_compressed_mag_stft_roundtrip(rng):
    tr = CompressedMagSTFT(
        {"n_fft": 256, "hop_length": 64, "window_name": "hann"},
        {"transform_type": "exponent", "abs_exponent": 0.5, "factor": 0.3})
    x = jnp.asarray(rng.standard_normal((2, 1024, 1)).astype(np.float32) * 0.3)
    z = tr({}, x)
    assert z.ndim == 3 and z.shape[-1] == 2 * (256 // 2 + 1)
    y = tr.inv({}, z, length=1024)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)

    tr_log = CompressedMagSTFT(
        {"n_fft": 256, "hop_length": 64, "window_name": "sqrthann"},
        {"transform_type": "log", "abs_exponent": 1.0, "factor": 1.0})
    z = tr_log({}, x)
    y = tr_log.inv({}, z, length=1024)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-3)


def test_enhancement_base_model():
    from open_universe_tpu.models.enhancement import EnhancementBaseModel
    from open_universe_tpu.nn import Conv1d

    net = Conv1d(1, 1, 9, padding="same")
    model = EnhancementBaseModel(
        fs=16000, model=net,
        losses={"l1": {"weight": 1.0, "kwargs": {
            "_target_": "open_universe_tpu.losses.MultiResL1SpecLoss",
            "window_sz": [256]}}},
        normalization_kwargs={"ref": "both", "level_db": -26.0})
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, 800, 1)) * 0.1
    loss, metrics = model.training_losses(params, jax.random.key(2), mix,
                                          mix * 0.5)
    assert np.isfinite(float(loss))
    out = model.enhance(params, mix[:, :, 0])
    assert out.shape == (2, 800)
