"""Golden-parity tests: JAX conv ops vs torch.nn functional ops."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from open_universe_tpu.ops import conv1d, conv_transpose1d, depthwise_conv1d_same


def _to_jax_w(tw: torch.Tensor) -> jnp.ndarray:
    # torch conv1d weight (Cout, Cin/g, K) -> (K, Cin/g, Cout)
    return jnp.asarray(tw.detach().numpy().transpose(2, 1, 0))


def _to_jax_wt(tw: torch.Tensor) -> jnp.ndarray:
    # torch convtranspose1d weight (Cin, Cout, K) -> flipped (K, Cin, Cout)
    return jnp.asarray(tw.detach().numpy().transpose(2, 0, 1)[::-1].copy())


@pytest.mark.parametrize("stride,pad,k,groups", [
    (1, "same", 3, 1), (1, "same", 5, 1), (2, 0, 2, 1), (5, 0, 5, 1),
    (1, 2, 5, 1), (3, 0, 3, 4),
])
def test_conv1d_matches_torch(rng, stride, pad, k, groups):
    b, t, cin, cout = 2, 64, 8, 12
    x = rng.standard_normal((b, cin, t)).astype(np.float32)
    conv = torch.nn.Conv1d(cin, cout, k, stride=stride, padding=pad, groups=groups)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    y = conv1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        _to_jax_w(conv.weight),
        jnp.asarray(conv.bias.detach().numpy()),
        stride=stride,
        padding=pad,
        groups=groups,
    )
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)


@pytest.mark.parametrize("stride,k", [(2, 2), (4, 4), (5, 5), (2, 4), (3, 5)])
def test_conv_transpose1d_matches_torch(rng, stride, k):
    b, t, cin, cout = 2, 40, 6, 10
    x = rng.standard_normal((b, cin, t)).astype(np.float32)
    conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=stride)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()
    y = conv_transpose1d(
        jnp.asarray(x.transpose(0, 2, 1)),
        _to_jax_wt(conv.weight),
        jnp.asarray(conv.bias.detach().numpy()),
        stride=stride,
    )
    assert y.shape[1] == (t - 1) * stride + k
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)


def test_depthwise_same_filter(rng):
    b, t, c, k = 2, 50, 4, 7
    x = rng.standard_normal((b, c, t)).astype(np.float32)
    kern = rng.standard_normal(k).astype(np.float32)
    w = torch.from_numpy(np.broadcast_to(kern[None, None, :], (c, 1, k)).copy())
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x), w, padding="same", groups=c
    ).numpy()
    y = depthwise_conv1d_same(jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(kern))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref, atol=2e-5)
