"""Pallas fused ConvBlock kernel vs the XLA composition (interpreter mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.nn.blocks import ConvBlock
from open_universe_tpu.ops import pallas as pallas_config


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_config.enable(True, interpret=True)
    yield
    pallas_config.enable(None)
    pallas_config._STATE["interpret"] = False


@pytest.mark.parametrize("with_film,with_cond", [
    (False, False), (True, False), (True, True),
])
def test_fused_conv_chain_matches_xla(with_film, with_cond):
    c, t, b = 8, 2048 + 37, 2
    block = ConvBlock(c)
    params = block.init(jax.random.key(0))
    h = jax.random.normal(jax.random.key(1), (b, t, c))
    nc = jax.random.normal(jax.random.key(2), (b, 2 * c)) if with_film else None
    ic = jax.random.normal(jax.random.key(3), (b, t, c)) if with_cond else None

    pallas_config.enable(True, interpret=True)
    v_f, _, cond_f = block(params, h, noise_cond=nc, input_cond=ic)

    pallas_config.enable(False)
    v_x, _, cond_x = block(params, h, noise_cond=nc, input_cond=ic)

    np.testing.assert_allclose(np.asarray(cond_f), np.asarray(cond_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x), atol=2e-5)


def test_fused_eligibility_gates():
    block = ConvBlock(8)
    params = block.init(jax.random.key(0))
    h_short = jnp.zeros((1, 100, 8))
    assert not block._fused_eligible(params, h_short)  # too short
    h = jnp.zeros((1, 4096, 8))
    assert block._fused_eligible(params, h)
    block_wn = ConvBlock(8, weight_norm=True)
    p_wn = block_wn.init(jax.random.key(0))
    assert not block_wn._fused_eligible(p_wn, h)  # unfolded weight norm
    block_snake = ConvBlock(8, act_type="snake")
    p_s = block_snake.init(jax.random.key(0))
    assert not block_snake._fused_eligible(p_s, h)
