"""Chunked (overlap-add) long-form enhancement."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.inference.chunked import make_chunked_enhancer


class _StubModel:
    """enhance() = 2x gain: chunked output must equal 2x input exactly
    (crossfade weights must sum to one everywhere)."""
    fs = 16000

    def enhance(self, params, mix, key=None, **kw):
        return mix * 2.0


@pytest.mark.parametrize("t_seconds", [0.3, 1.0, 1.31, 2.0, 3.7])
def test_overlap_add_reconstruction(t_seconds):
    model = _StubModel()
    fn = make_chunked_enhancer(model, chunk_seconds=1.0, overlap=0.25,
                               max_batch=3)
    rng = np.random.default_rng(0)
    t = int(t_seconds * model.fs)
    x = rng.standard_normal(t).astype(np.float32)
    y = fn({}, x, key=jax.random.key(1))
    assert y.shape == (t,)
    np.testing.assert_allclose(y, 2.0 * x, rtol=1e-5, atol=1e-5)
    # batched rows
    xb = rng.standard_normal((2, t)).astype(np.float32)
    yb = fn({}, xb, key=jax.random.key(2))
    assert yb.shape == (2, t)
    np.testing.assert_allclose(yb, 2.0 * xb, rtol=1e-5, atol=1e-5)


def test_chunked_real_model_runs():
    from open_universe_tpu.models.condition import ConditionerNetwork
    from open_universe_tpu.models.score import ScoreNetwork
    from open_universe_tpu.models.universe import Universe

    rates = [2, 4, 4, 5]
    model = Universe(
        fs=16000,
        score_model=ScoreNetwork(rate_factors=rates, n_channels=4,
                                 noise_cond_dim=32),
        condition_model=ConditionerNetwork(rate_factors=rates, n_channels=4,
                                           n_mels=16, n_mel_oversample=4),
        losses={"weights": {"score": 1.0}},
        normalization_kwargs={"ref": "both", "level_db": -26.0})
    params = model.init(jax.random.key(0))
    fn = make_chunked_enhancer(model, chunk_seconds=0.1, overlap=0.25,
                               max_batch=4, n_steps=2)
    x = np.random.default_rng(1).standard_normal(int(0.35 * 16000)).astype(np.float32) * 0.05
    y = fn(params, x, key=jax.random.key(3))
    assert y.shape == x.shape
    assert np.all(np.isfinite(y))


@pytest.mark.parametrize("chunk_seconds,overlap",
                         [(10.0, 0.999997),  # ov rounds up to chunk
                          (1.0, -0.1)])      # negative -> uncovered gaps
def test_invalid_overlap_rejected(chunk_seconds, overlap):
    """hop must stay >= 1 after rounding; the old overlap<1 check alone let
    overlap=0.999997 through (ov=round(159999.5)=chunk, hop=0) and the first
    call died with ZeroDivisionError instead of a clear error."""
    with pytest.raises(ValueError):
        make_chunked_enhancer(_StubModel(), chunk_seconds=chunk_seconds,
                              overlap=overlap)
