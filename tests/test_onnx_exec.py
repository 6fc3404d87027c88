"""In-house ONNX executor validation (metrics/onnx_exec.py).

Two evidence chains, per the round-4 brief:
  1. torch.onnx.export-minted golden graphs (torch serializes the proto
     itself; only the final onnxscript-function pass needs the absent
     ``onnx`` module, and that pass is a no-op for standard graphs — we
     stub it out) covering the exact op families the official metric
     models use: Conv (dilation/stride/pads), MaxPool, bidirectional GRU,
     Gemm/MatMul, shape plumbing (Transpose/Reshape/Squeeze/Unsqueeze/
     Slice/Concat/Gather/Shape/Expand), elementwise + reductions.
  2. The official DNSMOS / PLCMOS weights from the reference checkout run
     end-to-end with output pinned (regression) and behaving sanely
     (clean >= degraded ordering), matching the reference's usage
     (dnsmos_local.py:96-180, plc_mos.py:13-180).
"""
import io
from pathlib import Path

import numpy as np
import pytest

from open_universe_tpu.metrics.onnx_exec import OnnxSession, parse_model

torch = pytest.importorskip("torch")

DNSMOS_PATH = Path(
    "/root/reference/open_universe/metrics/dnsmos/DNSMOS/sig_bak_ovr.onnx")
PLCMOS_PATH = Path(
    "/root/reference/open_universe/metrics/plcmos/models/plcmos_v2.onnx")


def _export(module, args, opset=12):
    """torch.onnx.export to bytes without the `onnx` package."""
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    orig = onnx_proto_utils._add_onnxscript_fn
    onnx_proto_utils._add_onnxscript_fn = lambda mb, co: mb
    try:
        buf = io.BytesIO()
        torch.onnx.export(module.eval(), args, buf, opset_version=opset,
                          dynamo=False)
        return buf.getvalue()
    finally:
        onnx_proto_utils._add_onnxscript_fn = orig


def _check(module, args, opset=12, tol=1e-5):
    sess = OnnxSession(_export(module, args, opset))
    feeds = {i.name: a.numpy() for i, a in zip(sess.get_inputs(), args)}
    got = sess.run(None, feeds)
    want = module(*args)
    want = want if isinstance(want, tuple) else (want,)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w.detach().numpy(), atol=tol, rtol=tol)


class _ConvNet(torch.nn.Module):
    """Conv2d with dilation + asymmetric-ish shapes, MaxPool, LeakyReLU,
    global reduce, MLP head — the DNSMOS/PLCMOS conv-stack op family."""

    def __init__(self):
        super().__init__()
        self.c1 = torch.nn.Conv2d(1, 8, 3, padding=1, dilation=(2, 1))
        self.c2 = torch.nn.Conv2d(8, 4, (3, 3), stride=(1, 2), padding=(1, 0))
        self.p = torch.nn.MaxPool2d((1, 4), stride=(1, 4))
        self.l1 = torch.nn.Linear(4, 16)
        self.l2 = torch.nn.Linear(16, 3)

    def forward(self, x):
        h = torch.nn.functional.leaky_relu(self.c1(x), 0.1)
        h = self.p(torch.relu(self.c2(h)))
        h = h.permute(0, 2, 3, 1)
        h = h.reshape(h.shape[0], -1, h.shape[-1]).max(dim=1).values
        return self.l2(torch.relu(self.l1(h)))


class _GruNet(torch.nn.Module):
    """2-layer pipeline with a bidirectional GRU (torch exports ONNX GRU
    with linear_before_reset=1, the PLCMOS configuration) + shape ops."""

    def __init__(self):
        super().__init__()
        self.proj = torch.nn.Conv1d(6, 8, 1)
        self.gru = torch.nn.GRU(8, 5, bidirectional=True)
        self.head = torch.nn.Linear(10, 1)

    def forward(self, x):  # x: (B, 6, T)
        seq = self.proj(x).permute(2, 0, 1)  # (T, B, 8)
        y, hn = self.gru(seq)
        last = torch.cat([hn[0], hn[1]], dim=-1)
        return torch.sigmoid(self.head(last)).squeeze(-1) * 4.0 + 1.0


class _SliceNet(torch.nn.Module):
    """Slice/Concat/Gather/Unsqueeze/elementwise-math plumbing."""

    def forward(self, x):  # (B, T)
        a = x[:, 10:50:2]
        b = x[:, :20]
        mag = torch.sqrt(a[:, :20] * a[:, :20] + b * b)
        spec = torch.pow(torch.maximum(
            mag, torch.tensor(1e-3)), 0.3)
        h = torch.log(spec) / 2.0
        return torch.cat([h.unsqueeze(1), h.unsqueeze(1)], dim=1)


def test_golden_conv_stack():
    torch.manual_seed(0)
    _check(_ConvNet(), (torch.randn(2, 1, 24, 33),))


def test_golden_bigru():
    torch.manual_seed(1)
    _check(_GruNet(), (torch.randn(3, 6, 17),))
    # and at opset 11 (the PLCMOS opset)
    torch.manual_seed(2)
    _check(_GruNet(), (torch.randn(1, 6, 9),), opset=11)


def test_golden_shape_math():
    torch.manual_seed(3)
    _check(_SliceNet(), (torch.abs(torch.randn(2, 64)) + 0.1,))


def test_parser_roundtrip_details():
    m = parse_model(_export(_ConvNet(), (torch.randn(1, 1, 24, 33),)))
    assert m.opsets[""] == 12
    convs = [n for n in m.graph.nodes if n.op_type == "Conv"]
    assert convs[0].attrs["dilations"] == [2, 1]
    # initializers carry real float32 payloads
    w = next(v for k, v in m.graph.initializers.items() if v.ndim == 4)
    assert w.dtype == np.float32 and np.isfinite(w).all()


# ---------------------------------------------------------------------------
# official weights
# ---------------------------------------------------------------------------


def _tone_and_noisy(n=32000, fs=16000):
    rng = np.random.default_rng(0)
    t = np.arange(n) / fs
    clean = (0.1 * np.sin(2 * np.pi * 220 * t)
             * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    noisy = clean + 0.05 * rng.standard_normal(n).astype(np.float32)
    return clean, noisy


@pytest.mark.skipif(not DNSMOS_PATH.exists(), reason="official weights absent")
def test_official_dnsmos():
    from open_universe_tpu.metrics.dnsmos import Compute_DNSMOS

    d = Compute_DNSMOS(session=OnnxSession(str(DNSMOS_PATH)))
    clean, noisy = _tone_and_noisy()
    r_c, r_n = d(clean, 16000), d(noisy, 16000)
    for r in (r_c, r_n):
        for k in ("OVRL", "SIG", "BAK", "OVRL_raw", "SIG_raw", "BAK_raw"):
            assert np.isfinite(r[k]) and 0.0 < r[k] < 5.5
    # additive noise must not raise any MOS axis
    assert r_c["SIG"] >= r_n["SIG"] and r_c["BAK"] >= r_n["BAK"]
    assert r_c["OVRL"] >= r_n["OVRL"]
    # pinned regression (executor outputs recorded at implementation time)
    np.testing.assert_allclose(
        [r_c["OVRL"], r_c["SIG"], r_c["BAK"]],
        [1.1271, 1.3998, 1.0987], atol=2e-3)


@pytest.mark.skipif(not PLCMOS_PATH.exists(), reason="official weights absent")
def test_official_plcmos():
    from open_universe_tpu.metrics.plcmos import PLCMOSEstimator

    p = PLCMOSEstimator(session=OnnxSession(str(PLCMOS_PATH)))
    clean, noisy = _tone_and_noisy()
    v_c, v_n = p.run(clean, 16000), p.run(noisy, 16000)
    assert 1.0 <= v_n <= v_c <= 5.0
    np.testing.assert_allclose(v_c, 3.6033, atol=2e-3)


@pytest.mark.skipif(not (DNSMOS_PATH.exists() and PLCMOS_PATH.exists()),
                    reason="official weights absent")
def test_metrics_wrapper_and_eval_ungated():
    """Metrics(metrics=["dnsmos","plcmos"]) returns real numbers in THIS
    image, and EvalMetrics exposes val/dnsmos-* (the reference's validation
    signal, metrics/eval.py:64-101) without onnxruntime."""
    from open_universe_tpu.metrics.eval import EvalMetrics
    from open_universe_tpu.metrics.wrapper import Metrics

    clean, noisy = _tone_and_noisy(16000)
    m = Metrics(metrics=["dnsmos", "plcmos"])
    out = m(16000, noisy)
    for k in ("OVRL", "SIG", "BAK", "plcmos"):
        assert np.isfinite(out[k]), out

    ev = EvalMetrics()
    res = ev(noisy[None, None, :], clean[None, None, :])
    for k in ("pesq", "lsd", "dnsmos-OVRL", "dnsmos-SIG", "dnsmos-BAK"):
        assert k in res and np.isfinite(res[k]), res
