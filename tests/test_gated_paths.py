"""Execute the dependency-gated loss/metric paths with mocked models
(VERDICT r1 missing #4 / next #8):

- Phoneme{Embedding,frame-CE,CTC} losses driven through a TINY
  randomly-initialized Flax wav2vec2 (no download) — values finite,
  fixed points hold, gradients flow through the enhanced waveform.
- LPS with an injected phoneme predictor + in-house Levenshtein fallback.
- DNSMOS windowing/calibration with a stub ONNX session (9.01 s windows,
  1 s hop, published polynomial calibration).
- PLCMOS feature extraction + rater-embedding rounds with a stub session.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

FS = 16000


@pytest.fixture(scope="module")
def tiny_w2v2():
    from transformers import FlaxWav2Vec2ForCTC, Wav2Vec2Config

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16, 16), conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 3), num_feat_extract_layers=3, vocab_size=40,
        do_stable_layer_norm=True, feat_extract_norm="layer", pad_token_id=0)
    return FlaxWav2Vec2ForCTC(cfg, input_shape=(1, 1024), seed=0)


@pytest.fixture(scope="module")
def wav(rng_mod=None):
    rng = np.random.default_rng(5)
    t = np.arange(FS // 2) / FS
    x = 0.3 * np.sin(2 * np.pi * 220 * t) * np.sin(2 * np.pi * 3 * t) ** 2
    return (x + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_phoneme_embedding_loss(tiny_w2v2, wav):
    from open_universe_tpu.losses.phoneme_loss import PhonemeEmbeddingLoss

    loss = PhonemeEmbeddingLoss(model=tiny_w2v2)
    x = jnp.asarray(wav)[None, :]
    y = x + 0.05 * jax.random.normal(jax.random.key(0), x.shape)
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-10)
    v = float(loss(y, x))
    assert np.isfinite(v) and v > 0

    g = jax.grad(lambda inp: loss(inp, x))(y)
    gn = float(jnp.linalg.norm(g))
    assert np.isfinite(gn) and gn > 0  # gradients flow through the waveform


def test_phoneme_frame_ce_loss(tiny_w2v2, wav):
    from open_universe_tpu.losses.phoneme_loss import PhonemeLoss

    loss = PhonemeLoss(model=tiny_w2v2)
    x = jnp.asarray(wav)[None, :]
    y = x + 0.05 * jax.random.normal(jax.random.key(0), x.shape)
    v_same = float(loss(x, x))
    v_diff = float(loss(y, x))
    assert np.isfinite(v_same) and np.isfinite(v_diff)
    assert v_same <= v_diff  # matching input scores at least as well
    g = jax.grad(lambda inp: loss(inp, x))(y)
    assert np.isfinite(float(jnp.linalg.norm(g)))


def test_phoneme_ctc_loss(tiny_w2v2, wav):
    from open_universe_tpu.losses.phoneme_loss import PhonemeCTCLoss

    loss = PhonemeCTCLoss(model=tiny_w2v2)
    x = jnp.asarray(wav)[None, :]
    y = x + 0.05 * jax.random.normal(jax.random.key(0), x.shape)
    v = float(loss(y, x))
    assert np.isfinite(v)
    g = jax.grad(lambda inp: loss(inp, x))(y)
    assert np.isfinite(float(jnp.linalg.norm(g)))


def test_phoneme_loss_resamples_24k(tiny_w2v2, wav):
    from open_universe_tpu.losses.phoneme_loss import PhonemeEmbeddingLoss

    loss = PhonemeEmbeddingLoss(model=tiny_w2v2, sr=24000)
    x = jnp.asarray(wav)[None, :]
    assert np.isfinite(float(loss(x, x)))


# ---------------------------------------------------------------------------
# LPS
# ---------------------------------------------------------------------------


def test_levenshtein_fallback():
    from open_universe_tpu.metrics.lps import levenshtein_distance

    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "abc") == 0
    assert levenshtein_distance("flaw", "lawn") == 2


def test_lps_with_mock_predictor(wav):
    from open_universe_tpu.metrics.lps import LevenshteinPhonemeSimilarity

    class MockPredictor:
        sr = FS

        def __call__(self, audio):
            # pretend phonemes depend on the signal energy
            e = float(np.mean(np.square(np.asarray(audio))))
            return "a b a k" if e > 1e-4 else "a b"

    lps = LevenshteinPhonemeSimilarity(predictor=MockPredictor())
    assert lps(wav, wav) == pytest.approx(1.0)
    quiet = wav * 1e-4
    # "ab" vs "abak": distance 2, ref len 4 -> 0.5
    assert lps(quiet, wav) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# DNSMOS / PLCMOS with stub sessions
# ---------------------------------------------------------------------------


class _DnsmosStub:
    """Returns fixed raw (sig, bak, ovr) and records the input windows."""

    def __init__(self, raw=(3.0, 3.5, 2.5)):
        self.raw = raw
        self.inputs = []

    def run(self, _none, feeds):
        feats = feeds["input_1"]
        self.inputs.append(np.array(feats))
        return [np.array([list(self.raw)], np.float32)]


def test_dnsmos_windowing_and_calibration(wav):
    from open_universe_tpu.metrics.dnsmos import (
        Compute_DNSMOS,
        INPUT_LENGTH,
        _POLY,
    )

    stub = _DnsmosStub()
    d = Compute_DNSMOS(session=stub)
    audio = np.tile(wav, 24)  # 12 s
    res = d(audio, FS)
    # 9.01 s windows hopped by 1 s over 12 s -> floor(12 - 9.01) + 1 = 3 hops
    assert res["num_hops"] == 3
    assert len(stub.inputs) == 3
    assert stub.inputs[0].shape == (1, int(INPUT_LENGTH * FS))
    # second window starts 1 s (= fs samples) later
    np.testing.assert_array_equal(stub.inputs[1][0, :FS],
                                  stub.inputs[0][0, FS:2 * FS])
    # published polynomial calibration applied to the raw scores
    sig, bak, ovr = 3.0, 3.5, 2.5
    assert res["SIG_raw"] == pytest.approx(sig)
    assert res["SIG"] == pytest.approx(np.polyval(_POLY[False]["sig"], sig))
    assert res["BAK"] == pytest.approx(np.polyval(_POLY[False]["bak"], bak))
    assert res["OVRL"] == pytest.approx(np.polyval(_POLY[False]["ovr"], ovr))
    assert res["len_in_sec"] == pytest.approx(len(audio) / FS)


def test_dnsmos_short_input_tiled(wav):
    from open_universe_tpu.metrics.dnsmos import Compute_DNSMOS

    stub = _DnsmosStub()
    d = Compute_DNSMOS(session=stub)
    res = d(wav, FS)  # 0.5 s input, tiled up to >= 9.01 s
    assert res["num_hops"] >= 1
    assert np.isfinite(res["OVRL"])


class _PlcmosStub:
    def __init__(self):
        self.raters = []
        self.feats = None

    def run(self, _none, feeds):
        self.feats = np.array(feeds["degraded_audio"])
        self.raters.append(np.array(feeds["rater_embed"]))
        # MOS = mean of the rater embedding -> varies per round
        return [np.float32(3.0 + self.raters[-1].mean())]


def test_plcmos_features_and_rounds(wav):
    from open_universe_tpu.metrics.plcmos import PLCMOSEstimator, _stft_features

    stub = _PlcmosStub()
    est = PLCMOSEstimator(session=stub, embed_rounds=15)
    mos = est.run(wav, FS)
    assert np.isfinite(mos) and 2.0 < mos < 4.0
    assert len(stub.raters) == 15
    assert stub.raters[0].shape == (1, 64)
    # deterministic rater sequence (seeded RandomState(23))
    rng = np.random.RandomState(23)
    np.testing.assert_allclose(stub.raters[0],
                               rng.normal(size=(1, 64)).astype(np.float32))
    # feature tensor: (1, 1, frames, 257) log-power hamming STFT
    f = stub.feats
    assert f.shape[:2] == (1, 1) and f.shape[3] == 257
    np.testing.assert_allclose(
        f[0, 0], np.float32(_stft_features(np.asarray(wav, np.float64))),
        atol=1e-6)


def test_plcmos_feature_peak_bin():
    """A pure 1 kHz tone's log-power spectrum must peak at bin
    1000/16000*512 = 32."""
    from open_universe_tpu.metrics.plcmos import _stft_features

    t = np.arange(FS) / FS
    tone = 0.5 * np.sin(2 * np.pi * 1000 * t)
    feats = _stft_features(tone)
    inner = feats[4:-4]  # skip partially-padded edge frames
    assert int(np.bincount(np.argmax(inner, axis=1)).argmax()) == 32
