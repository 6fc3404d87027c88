"""Lane-packed (time-packed) execution: ops/packed.py builders vs the
reference ops, ConvBlock.apply_packed vs apply, and full packed enhance
equality (OPEN_UNIVERSE_PACKED=1 path)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.nn.blocks import ConvBlock, binomial_filter, film
from open_universe_tpu.ops import conv as oc
from open_universe_tpu.ops import packed as pk
from open_universe_tpu.ops import pallas as pallas_config

rng = np.random.default_rng(0)


def arr(*s):
    return jnp.asarray(rng.standard_normal(s), jnp.float32)


@pytest.mark.parametrize("c1,c2,r,p1,p2,aa", [
    (32, 64, 2, 4, 2, False), (64, 128, 4, 2, 1, False),
    (256, 512, 5, 1, 1, False), (48, 96, 2, 2, 1, False),
    (32, 64, 2, 4, 2, True), (64, 128, 4, 2, 1, True),
])
def test_packed_strided_conv(c1, c2, r, p1, p2, aa):
    T = 160 * p1
    x, w, b = arr(2, T, c1), arr(r, c1, c2) * 0.1, arr(c2) * 0.1
    f = binomial_filter(2 * r + 1) if aa else None
    ref = oc.conv1d(oc.depthwise_conv1d_same(x, f) if aa else x,
                    w, b, stride=r, padding=0)
    got = pk.unpack_rows(pk.packed_strided_conv(
        pk.pack_rows(x, p1), w, b, r, 0, p1, p2, aa_filter=f), p2, c2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


@pytest.mark.parametrize("c1,c2,r,p1,p2,aa", [
    (512, 256, 5, 1, 1, False), (128, 64, 4, 1, 2, False),
    (64, 32, 2, 2, 4, False), (96, 48, 2, 1, 2, False),
    (64, 32, 2, 2, 4, True), (128, 64, 4, 1, 2, True),
])
def test_packed_transposed_conv(c1, c2, r, p1, p2, aa):
    T = 160 * p1
    x, w, b = arr(2, T, c1), arr(r, c1, c2) * 0.1, arr(c2) * 0.1
    f = binomial_filter(2 * r + 1) if aa else None
    z = oc.conv_transpose1d(x, w, None, stride=r, padding=0)
    ref = (oc.depthwise_conv1d_same(z, f) if aa else z) + b
    got = pk.unpack_rows(pk.packed_transposed_conv(
        pk.pack_rows(x, p1), w, b, r, 0, p1, p2, aa_filter=f), p2, c2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_packed_same_pointwise_film_io_convs():
    c, p, T = 32, 4, 1600
    x = arr(2, T, c)
    w5, b5 = arr(5, c, c) * 0.1, arr(c) * 0.1
    np.testing.assert_allclose(
        np.asarray(oc.conv1d(x, w5, b5, padding="same")),
        np.asarray(pk.unpack_rows(
            pk.packed_same_conv(pk.pack_rows(x, p), w5, b5, p), p, c)),
        atol=1e-4)
    y = arr(2, 2 * c)
    np.testing.assert_allclose(
        np.asarray(film(x, y)),
        np.asarray(pk.unpack_rows(
            pk.packed_film(pk.pack_rows(x, p), y, p), p, c)), atol=1e-5)
    # waveform entry/exit convs: C=1 <-> C=32 at pack factor 4
    xw, w, b = arr(2, T, 1), arr(3, 1, 32) * 0.3, arr(32) * 0.1
    np.testing.assert_allclose(
        np.asarray(oc.conv1d(xw, w, b, padding="same")),
        np.asarray(pk.unpack_rows(pk.packed_strided_conv(
            pk.pack_rows(xw, 4), w, b, 1, 1, 4, 4), 4, 32)), atol=1e-4)


@pytest.mark.parametrize("kind,kwargs,h_shape,res", [
    ("down", dict(weight_norm=True, antialiasing=True), (2, 640, 32), False),
    ("up", dict(antialiasing=True), (2, 320, 64), True),
    ("none", dict(), (2, 40, 512), False),
])
def test_convblock_apply_packed(kind, kwargs, h_shape, res):
    c = h_shape[-1] if kind != "up" else h_shape[-1] // 2
    block = (ConvBlock(c, 2, kind, **kwargs) if kind != "none"
             else ConvBlock(c, **kwargs))
    params = block.init(jax.random.key(0))
    h = arr(*h_shape)
    nc = arr(2, 2 * c)
    ic = arr(2, 640, c) if kind == "up" else None
    rr = arr(2, 640, c) if res else None
    length = 640 if kind == "up" else None
    ref = block(params, h, noise_cond=nc, input_cond=ic, res=rr, length=length)
    hp = pk.pack_rows(h, pk.pack_factor(h.shape[-1]))
    icp = None if ic is None else pk.pack_rows(ic, pk.pack_factor(c))
    rrp = None if rr is None else pk.pack_rows(rr, pk.pack_factor(c))
    got = block.apply_packed(params, hp, noise_cond=nc, input_cond=icp,
                             res=rrp, length=length)
    for a, g in zip(ref, got):
        cc = a.shape[-1]
        gu = pk.unpack_rows(g, pk.pack_factor(cc), cc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(gu), atol=2e-5)


def test_packed_enhance_equality(monkeypatch):
    from open_universe_tpu.models.presets import universepp

    pallas_config.enable(False)
    model = universepp(fs=16000)
    params = model.init(jax.random.key(0))
    key = jax.random.key(1)
    mix = jax.random.normal(jax.random.key(2), (2, 1600)) * 0.05

    ref = jax.jit(lambda p, m: model.enhance(p, m, key=key, n_steps=2)
                  )(params, mix)
    monkeypatch.setenv("OPEN_UNIVERSE_PACKED", "1")
    assert model.score_model.packed_eligible(1760)
    assert model.condition_model.packed_eligible(1760)
    got = jax.jit(lambda p, m: model.enhance(p, m, key=key, n_steps=2)
                  )(params, mix)
    pallas_config.enable(None)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_fused_chain_non_divisible_rows():
    """Partial tail tiles (rows not a multiple of the halo) are masked."""
    pallas_config.enable(True, interpret=True)
    block = ConvBlock(32, 2, "down")
    params = block.init(jax.random.key(0))
    h = arr(2, 2680, 32)  # rows = 670, not a multiple of 8
    nc = arr(2, 64)
    hp = pk.pack_rows(h, 4)
    got = block.apply_packed(params, hp, noise_cond=nc)
    pallas_config.enable(False)
    ref = block.apply_packed(params, hp, noise_cond=nc)
    pallas_config.enable(None)
    for a, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=2e-5)
