"""Golden-parity tests for leaf layers vs torch (GRU, PReLU, weight norm)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from open_universe_tpu.nn import GRU, Conv1d, LayerNorm, Linear, PReLU
from open_universe_tpu.nn.blocks import binomial_filter, film


def test_gru_bidirectional_matches_torch(rng):
    b, t, insz, h = 3, 17, 12, 8
    tg = torch.nn.GRU(insz, h, num_layers=2, bidirectional=True, batch_first=True)
    x = rng.standard_normal((b, t, insz)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))
    gru = GRU(insz, h, num_layers=2, bidirectional=True)
    params = {}
    for name, p in tg.named_parameters():
        arr = p.detach().numpy()
        params[name] = jnp.asarray(arr.T if name.startswith("weight") else arr)
    y = gru(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_gru_unidirectional_matches_torch(rng):
    b, t, insz, h = 2, 9, 6, 5
    tg = torch.nn.GRU(insz, h, num_layers=1, bidirectional=False, batch_first=True)
    x = rng.standard_normal((b, t, insz)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tg(torch.from_numpy(x))
    gru = GRU(insz, h, num_layers=1, bidirectional=False)
    params = {
        name: jnp.asarray(p.detach().numpy().T if name.startswith("weight") else p.detach().numpy())
        for name, p in tg.named_parameters()
    }
    y = gru(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref.numpy(), atol=1e-5)


def test_prelu_matches_torch(rng):
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    tp = torch.nn.PReLU()
    with torch.no_grad():
        ref = tp(torch.from_numpy(x)).numpy()
    prelu = PReLU()
    y = prelu(prelu.init(jax.random.key(0)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-6)


def test_weight_norm_conv_matches_torch(rng):
    cin, cout, k = 6, 10, 3
    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(cin, cout, k, padding="same"))
    x = rng.standard_normal((2, cin, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    conv = Conv1d(cin, cout, k, padding="same", weight_norm=True)
    params = {
        "weight_g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(-1)),
        "weight_v": jnp.asarray(tconv.weight_v.detach().numpy().transpose(2, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    y = conv(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)


def test_weight_norm_convtranspose_matches_torch(rng):
    cin, cout, k, s = 8, 4, 5, 5
    tconv = torch.nn.utils.weight_norm(torch.nn.ConvTranspose1d(cin, cout, k, stride=s))
    x = rng.standard_normal((2, cin, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    from open_universe_tpu.nn import ConvTranspose1d

    conv = ConvTranspose1d(cin, cout, k, stride=s, weight_norm=True)
    params = {
        "weight_g": jnp.asarray(tconv.weight_g.detach().numpy().reshape(-1)),
        "weight_v": jnp.asarray(
            tconv.weight_v.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        ),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    y = conv(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)


def test_layernorm_matches_torch(rng):
    c, t = 8, 50
    tln = torch.nn.LayerNorm((c, t))
    x = rng.standard_normal((3, c, t)).astype(np.float32)
    with torch.no_grad():
        ref = tln(torch.from_numpy(x)).numpy()
    ln = LayerNorm((c, t))
    y = ln(ln.init(jax.random.key(0)), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_film():
    x = jnp.ones((2, 7, 4))
    y = jnp.concatenate([2 * jnp.ones((2, 4)), 3 * jnp.ones((2, 4))], axis=-1)
    out = film(x, y)
    np.testing.assert_allclose(np.asarray(out), 5.0)


def test_binomial_filter_matches_reference_formula():
    import scipy.linalg

    for k in (5, 7, 11):
        binomial = scipy.linalg.pascal(k, kind="lower", exact=True)
        norm = np.sqrt(np.mean(binomial**2))
        ref = (binomial[k - 1, :] / norm).astype("float32")
        ref = ref / np.sqrt(np.mean(ref**2))
        np.testing.assert_allclose(np.asarray(binomial_filter(k)), ref, rtol=1e-6)


def test_snake_resample_polyphase_reference():
    """resample() must implement the torchaudio sinc_interp_hann polyphase
    design exactly: y[f*new + p] = sum_j k[p, j] * x_pad[f*orig + j]."""
    import math as _math

    from open_universe_tpu.nn.snake import _sinc_kernel_np, resample

    rng = np.random.default_rng(3)
    for orig, new in [(1, 2), (2, 1)]:
        kernel, width, o2, n2 = _sinc_kernel_np(orig, new)
        b, t, c = 2, 50, 3
        x = rng.standard_normal((b, t, c)).astype(np.float32)
        xp = np.pad(x, ((0, 0), (width, width + orig), (0, 0)))
        target = int(_math.ceil(new * t / orig))
        taps = kernel.shape[1]
        ref = np.zeros((b, target, c), np.float32)
        for i in range(target):
            f, p = divmod(i, new)
            ref[:, i] = np.einsum("btc,t->bc", xp[:, f * orig : f * orig + taps], kernel[p])
        got = np.asarray(resample(jnp.asarray(x), orig, new))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_spectral_norm_conv2d_matches_torch(rng):
    """Our state-free power-iteration spectral norm converges to torch's
    (persistent-buffer) normalization: run the torch module enough training
    forwards for its u/v buffers to converge, then compare effective
    weights and outputs (reference gan.py:27 uses
    torch.nn.utils.spectral_norm on the same conv shapes)."""
    from open_universe_tpu.nn.layers import Conv2d as JConv2d

    cin, cout, kh, kw = 4, 12, 3, 5
    tconv = torch.nn.utils.spectral_norm(
        torch.nn.Conv2d(cin, cout, (kh, kw), padding=(1, 2)),
        n_power_iterations=1)
    x = rng.standard_normal((2, cin, 8, 16)).astype(np.float32)
    tconv.train()
    with torch.no_grad():
        for _ in range(200):  # converge the persistent power-iteration pair
            tconv(torch.from_numpy(x))
    tconv.eval()
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
        w_eff_torch = tconv.weight.detach().numpy()

    conv = JConv2d(cin, cout, (kh, kw), padding=(1, 2), spectral_norm=True,
                   sn_power_iters=200)
    params = {
        "weight": jnp.asarray(
            tconv.weight_orig.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    w_eff = np.asarray(conv.weight(params)).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(w_eff, w_eff_torch, atol=1e-5)
    y = conv(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), ref,
                               atol=2e-5)


def test_spectral_norm_unit_sigma_and_grads(rng):
    """The normalized weight has top singular value ~1 (any scale of the
    raw weight), and gradients through the normalization are finite."""
    from open_universe_tpu.nn.layers import Conv2d as JConv2d

    conv = JConv2d(3, 16, (5, 1), spectral_norm=True)
    params = conv.init(jax.random.key(0))
    params["weight"] = params["weight"] * 37.0  # scale must not matter
    w = np.asarray(conv.weight(params))
    sigma = np.linalg.svd(w.reshape(-1, w.shape[-1]).T, compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, atol=1e-2)  # default iters

    conv50 = JConv2d(3, 16, (5, 1), spectral_norm=True, sn_power_iters=50)
    w50 = np.asarray(conv50.weight(params))
    sigma50 = np.linalg.svd(w50.reshape(-1, w50.shape[-1]).T,
                            compute_uv=False)[0]
    np.testing.assert_allclose(sigma50, 1.0, atol=1e-3)  # tightens

    def loss(p):
        x = jnp.ones((1, 32, 4, 3))
        return jnp.sum(conv(p, x) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(g))


def test_spectral_norm_discriminators_forward(rng):
    """MPD/MRD build and run with use_spectral_norm / the MRD override
    (reference gan.py:27,140-149); no weight_g params appear."""
    from open_universe_tpu.models.discriminators import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator)

    cfg = {"use_spectral_norm": True, "discriminator_channel_mult": 0.25}
    y = jnp.asarray(rng.standard_normal((2, 400, 1)).astype(np.float32))
    yh = jnp.asarray(rng.standard_normal((2, 400, 1)).astype(np.float32))

    mpd = MultiPeriodDiscriminator(cfg)
    p = mpd.init(jax.random.key(0))
    names = [k for k in jax.tree_util.tree_flatten_with_path(p)[0]]
    assert not any("weight_g" in str(k) for k in names)
    rs, gs, fr, fg = mpd(p, y, yh)
    assert len(rs) == 5 and all(np.isfinite(np.asarray(s)).all() for s in rs)

    # MRD override flips spectral norm off for the resolution discriminators
    cfg2 = {"use_spectral_norm": True, "mrd_use_spectral_norm": False,
            "discriminator_channel_mult": 0.25,
            "resolutions": [[128, 16, 64], [256, 32, 128], [64, 8, 32]]}
    mrd = MultiResolutionDiscriminator(cfg2)
    p2 = mrd.init(jax.random.key(1))
    names2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert any("weight_g" in str(k) for k in names2)
    rs2, *_ = mrd(p2, y, yh)
    assert len(rs2) == 3 and all(np.isfinite(np.asarray(s)).all() for s in rs2)
