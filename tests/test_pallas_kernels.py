"""Pallas fused ConvBlock kernel vs the XLA composition (interpreter mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.nn.blocks import ConvBlock
from open_universe_tpu.ops import pallas as pallas_config
from open_universe_tpu.ops.pallas.conv_block import fused_conv_chain


@pytest.fixture(autouse=True)
def _interpret_mode():
    pallas_config.enable(True, interpret=True)
    yield
    pallas_config.enable(None)
    pallas_config._STATE["interpret"] = False


def _params_as_args(block, params):
    return (params["conv1"]["conv"]["weight"], params["conv1"]["conv"]["bias"],
            params["conv1"]["prelu"]["weight"],
            params["conv2"]["conv"]["weight"], params["conv2"]["conv"]["bias"],
            params["conv2"]["prelu"]["weight"],
            params["conv3"]["conv"]["weight"], params["conv3"]["conv"]["bias"],
            params["conv3"]["prelu"]["weight"])


@pytest.mark.parametrize("c,t,with_film,with_cond", [
    (8, 2048, False, False),       # p=16
    (8, 2048, True, True),
    (32, 1280, True, False),       # p=4, multi-tile via tile_target
    (128, 512, True, True),        # p=1 (5-tap row conv)
])
def test_fused_conv_chain_matches_xla(c, t, with_film, with_cond):
    b = 2
    block = ConvBlock(c)
    params = block.init(jax.random.key(0))
    h = jax.random.normal(jax.random.key(1), (b, t, c))
    nc = jax.random.normal(jax.random.key(2), (b, 2 * c)) if with_film else None
    ic = jax.random.normal(jax.random.key(3), (b, t, c)) if with_cond else None

    out = fused_conv_chain(h, *_params_as_args(block, params),
                           noise_cond=nc, input_cond=ic, tile_target=64)
    assert out is not None, "fused path unexpectedly ineligible"
    v_f, cond_f = out

    pallas_config.enable(False)
    v_x, _, cond_x = block(params, h, noise_cond=nc, input_cond=ic)

    np.testing.assert_allclose(np.asarray(cond_f), np.asarray(cond_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x), atol=2e-5)


def test_fused_conv_chain_shape_fallback():
    c = 32
    block = ConvBlock(c)
    params = block.init(jax.random.key(0))
    h = jax.random.normal(jax.random.key(1), (1, 1001, c))  # 1001 % 4 != 0
    out = fused_conv_chain(h, *_params_as_args(block, params))
    assert out is None


def test_convblock_fused_path_equals_xla_end_to_end():
    c, t, b = 32, 2560, 2
    block = ConvBlock(c)
    params = block.init(jax.random.key(0))
    h = jax.random.normal(jax.random.key(1), (b, t, c))
    nc = jax.random.normal(jax.random.key(2), (b, 2 * c))

    pallas_config.enable(True, interpret=True)
    v_f, _, cond_f = block(params, h, noise_cond=nc)
    pallas_config.enable(False)
    v_x, _, cond_x = block(params, h, noise_cond=nc)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cond_f), np.asarray(cond_x),
                               atol=2e-5)


def test_fused_eligibility_gates():
    block = ConvBlock(8)
    params = block.init(jax.random.key(0))
    h_short = jnp.zeros((1, 100, 8))
    assert not block._fused_eligible(params, h_short)  # too short
    h = jnp.zeros((1, 4096, 8))
    # C < 128 engages only with allow_repack (lane packing is a relayout)
    assert not block._fused_eligible(params, h)
    pallas_config.enable(True, interpret=True, allow_repack=True)
    assert block._fused_eligible(params, h)
    pallas_config.enable(True, interpret=True)
    block128 = ConvBlock(128)
    p128 = block128.init(jax.random.key(0))
    assert block128._fused_eligible(p128, jnp.zeros((1, 512, 128)))
    block_wn = ConvBlock(8, weight_norm=True)
    p_wn = block_wn.init(jax.random.key(0))
    assert not block_wn._fused_eligible(p_wn, h)  # unfolded weight norm
    block_snake = ConvBlock(8, act_type="snake")
    p_s = block_snake.init(jax.random.key(0))
    assert not block_snake._fused_eligible(p_s, h)
