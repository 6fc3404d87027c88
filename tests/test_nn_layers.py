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
