"""Data-parallel batched enhancement over a device mesh (GSPMD): the jitted
sampler program accepts a batch sharded on the dp axis and produces a
correspondingly sharded output with per-row results identical to the
replicated run."""
import numpy as np

import jax
import jax.numpy as jnp

from open_universe_tpu.models.condition import ConditionerNetwork
from open_universe_tpu.models.score import ScoreNetwork
from open_universe_tpu.models.universe import Universe
from open_universe_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _tiny_model():
    rates = [2, 4, 4, 5]
    return Universe(
        fs=16000,
        score_model=ScoreNetwork(rate_factors=rates, n_channels=4,
                                 noise_cond_dim=32),
        condition_model=ConditionerNetwork(rate_factors=rates, n_channels=4,
                                           n_mels=16, n_mel_oversample=4),
        losses={"weights": {"score": 1.0}},
        normalization_kwargs={"ref": "both", "level_db": -26.0})


def test_enhance_dp_sharded_matches_single_device():
    model = _tiny_model()
    params = model.init(jax.random.key(0))
    mesh = make_mesh(dp=8)
    b, t = 8, 1600
    mix = np.random.default_rng(0).standard_normal((b, t)).astype(np.float32) * 0.05
    key = jax.random.key(42)

    fn = jax.jit(lambda p, m: model.enhance(p, m, key=key, n_steps=2))
    ref = np.asarray(fn(params, jnp.asarray(mix)))

    p_sh = replicate(mesh, params)
    m_sh = shard_batch(mesh, {"mix": jnp.asarray(mix)})["mix"]
    out = fn(p_sh, m_sh)
    # output stays sharded over dp (no implicit gather inside the program)
    assert not out.sharding.is_fully_replicated
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)
