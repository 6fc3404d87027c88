"""Shape/structure tests for ScoreNetwork and ConditionerNetwork."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.models.condition import ConditionerNetwork, MelAdapter
from open_universe_tpu.models.score import ScoreNetwork

RATES = [2, 4, 4, 5]
TOT_DS = 160
NCH = 4  # small for test speed


def _make_models(weight_norm=False, antialiasing=False, time_embedding=None):
    score = ScoreNetwork(
        rate_factors=RATES, n_channels=NCH, noise_cond_dim=32,
        extra_conv_block=True, use_weight_norm=weight_norm,
        use_antialiasing=antialiasing, time_embedding=time_embedding)
    cond = ConditionerNetwork(
        rate_factors=RATES, n_channels=NCH, n_mels=16, n_mel_oversample=4,
        encoder_gru_residual=True, extra_conv_block=True,
        use_weight_norm=weight_norm, use_antialiasing=antialiasing)
    return score, cond


@pytest.mark.parametrize("weight_norm,antialiasing,temb", [
    (False, False, None), (True, True, "simple"),
])
def test_score_cond_forward_shapes(weight_norm, antialiasing, temb):
    score, cond = _make_models(weight_norm, antialiasing, temb)
    key = jax.random.key(0)
    ps = score.init(key)
    pc = cond.init(jax.random.key(1))

    b, t = 2, 2 * TOT_DS * 5  # 1600 samples
    x = jax.random.normal(jax.random.key(2), (b, t, 1))
    conds, y_hat, h = cond(pc, x, train=True)

    # conditions: coarse -> fine, channels 16x,8x,4x,2x,1x of n_channels
    assert len(conds) == 5
    expected_ch = [NCH * 16, NCH * 8, NCH * 4, NCH * 2, NCH]
    expected_t = [t // TOT_DS, t // 32, t // 8, t // 2, t]
    for c_arr, ch, tt in zip(conds, expected_ch, expected_t):
        assert c_arr.shape == (b, tt, ch), (c_arr.shape, ch, tt)

    assert y_hat.shape == (b, t, NCH)
    assert h.shape == (b, t // TOT_DS, NCH * 16)

    sigma = jnp.full((b,), 0.1)
    s = score(ps, x, sigma, conds)
    assert s.shape == (b, t, 1)
    assert np.isfinite(np.asarray(s)).all()


def test_mel_adapter_frame_rate():
    mel = MelAdapter(n_mels=16, output_channels=64, ds_factor=160, oversample=4)
    p = mel.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 3200, 1))
    m = mel.compute_mel_spec(x)
    assert m.shape == (2, 3200 // 160, 16)
    # unit average frame energy
    energy = np.mean(np.sum(np.asarray(m) ** 2, axis=-1), axis=-1)
    np.testing.assert_allclose(energy, 1.0, rtol=1e-3)
    out = mel(p, x)
    assert out.shape == (2, 20, 64)


def test_score_network_length_restore():
    score, cond = _make_models()
    ps = score.init(jax.random.key(0))
    pc = cond.init(jax.random.key(1))
    t = 4 * TOT_DS
    x = jax.random.normal(jax.random.key(2), (1, t, 1))
    conds = cond(pc, x, train=False)
    s = score(ps, x, jnp.full((1,), 1.0), conds)
    assert s.shape == (1, t, 1)


def test_packed_eligibility_requires_unpacked_bottleneck():
    """packed_eligible must reject configs whose deepest level still has a
    pack factor > 1: the encoder GRU (and the conditioner's mel/shortcut
    joins) consume the bottleneck as plain (B, T, C) rows, so auto-enabling
    packed mode there crashed at trace time with a matmul shape error."""
    small = dict(rate_factors=[2], n_channels=32, noise_cond_dim=32)
    assert not ScoreNetwork(**small).packed_eligible(1600)
    assert not ConditionerNetwork(
        rate_factors=[2], n_channels=32, n_mels=16).packed_eligible(1600)
    # the published ladder (bottleneck 32 * 2^4 = 512 >= 128) stays eligible
    big_score = ScoreNetwork(rate_factors=[2, 4, 4, 5], n_channels=32,
                             noise_cond_dim=512, extra_conv_block=True)
    assert big_score.packed_eligible(16000)


def test_mrd_channel_mult_override():
    """DiscriminatorR honors losses.mrd_channel_mult over the shared
    discriminator_channel_mult (reference gan.py:151-157)."""
    from open_universe_tpu.models.discriminators import DiscriminatorR

    cfg = {"discriminator_channel_mult": 0.25, "mrd_channel_mult": 0.5}
    d = DiscriminatorR(cfg, [128, 30, 75])
    assert d.convs[0].out_channels == 16  # 32 * 0.5, not 32 * 0.25
    d2 = DiscriminatorR({"discriminator_channel_mult": 0.25}, [128, 30, 75])
    assert d2.convs[0].out_channels == 8


def test_process_local_batch_slice_divisibility(monkeypatch):
    """A global batch not divisible by the process count must fail fast —
    the silent floor-division remainder meant one sample of every global
    batch was never loaded by any host."""
    from open_universe_tpu.parallel import mesh as mesh_mod

    assert mesh_mod.process_local_batch_slice(8) == slice(0, 8)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 3)
    monkeypatch.setattr(mesh_mod.jax, "process_index", lambda: 1)
    assert mesh_mod.process_local_batch_slice(39) == slice(13, 26)
    with pytest.raises(ValueError, match="divisible"):
        mesh_mod.process_local_batch_slice(40)
