"""Native (C++) FLAC codec vs the pure-Python reference implementation.

open_universe_tpu/native/flac_native.cpp mirrors data/codecs.py; these tests
pin them to each other sample-for-sample in both directions, and hand-craft
streams for the decoder paths neither encoder emits (LPC subframes,
multi-partition and escape residuals, wasted bits, Rice2 method).
"""
import numpy as np
import pytest

from open_universe_tpu.data import codecs
from open_universe_tpu.data.codecs import (_BitWriter, _crc8, _crc16,
                                           _decode_flac_python, decode_flac,
                                           encode_flac)
from open_universe_tpu.native import (flac_decode_native, flac_encode_native,
                                      get_flac_lib)

pytestmark = pytest.mark.skipif(
    get_flac_lib() is None, reason="native FLAC codec not buildable")


def _tone(fs, seconds, freq, channels=1, seed=0):
    t = np.arange(int(fs * seconds)) / fs
    rng = np.random.default_rng(seed)
    x = np.stack([0.5 * np.sin(2 * np.pi * (freq + 50 * c) * t)
                  + 0.01 * rng.standard_normal(len(t))
                  for c in range(channels)])
    return x.astype(np.float32)


def _quantize_int(x, bps):
    scale = float(1 << (bps - 1))
    return np.clip(np.round(x * scale), -scale, scale - 1).astype(np.int64)


def _encode_python(tmp_path, x, fs, **kw):
    """Run the pure-Python encoder regardless of native availability."""
    import open_universe_tpu.native as native
    path = tmp_path / "py.flac"
    saved = native._flac_failed
    native._flac_failed = True  # forces the Python fallback in encode_flac
    try:
        encode_flac(path, x, fs, **kw)
    finally:
        native._flac_failed = saved
    return path.read_bytes()


@pytest.mark.parametrize("channels,mode,bps", [
    (1, "independent", 16),
    (2, "independent", 16),
    (2, "left_side", 16),
    (2, "right_side", 16),
    (2, "mid_side", 16),
    (1, "independent", 24),
    (2, "mid_side", 8),
])
def test_native_python_cross_agreement(tmp_path, channels, mode, bps):
    fs = 16000
    x = _tone(fs, 0.5, 440.0, channels=channels)
    want = _quantize_int(x, bps)

    py_bytes = _encode_python(tmp_path, x, fs, bps=bps, stereo_mode=mode)
    nat_bytes = flac_encode_native(want.astype(np.int32), fs, bps, 4096, mode)

    for blob in (py_bytes, nat_bytes):
        nat_samples, nat_rate, nat_bps = flac_decode_native(blob)
        py_audio, py_rate = _decode_flac_python(blob)
        assert nat_rate == py_rate == fs and nat_bps == bps
        py_int = np.round(py_audio * float(1 << (bps - 1))).astype(np.int64)
        np.testing.assert_array_equal(nat_samples.astype(np.int64), py_int)
        np.testing.assert_array_equal(nat_samples.astype(np.int64), want)


def test_dispatch_uses_native(tmp_path):
    """decode_flac/encode_flac route through the native codec when built."""
    fs = 16000
    x = _tone(fs, 0.3, 220.0)
    path = tmp_path / "clip.flac"
    encode_flac(path, x, fs)
    audio, rate = decode_flac(path)
    assert rate == fs
    want = _quantize_int(x, 16).astype(np.float32) / float(1 << 15)
    np.testing.assert_array_equal(audio, want)


def test_native_rejects_corruption_and_garbage(tmp_path):
    fs = 16000
    x = _tone(fs, 0.2, 330.0)
    path = tmp_path / "c.flac"
    encode_flac(path, x, fs)
    blob = bytearray(path.read_bytes())
    blob[len(blob) // 2] ^= 0x40
    with pytest.raises(ValueError):
        flac_decode_native(bytes(blob))
    with pytest.raises(ValueError):
        flac_decode_native(b"RIFFnotflac")


# ---------------------------------------------------------------------------
# Hand-crafted streams: decoder paths no in-house encoder emits
# ---------------------------------------------------------------------------


def _utf8(n):
    from open_universe_tpu.data.codecs import _utf8_encode
    return _utf8_encode(n)


def _craft_stream(write_subframes, blocksize, fs=16000, bps=16, nch=1,
                  ch_code=None):
    """Build a single-frame FLAC stream with custom subframe payloads."""
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(fs, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    si.buf.extend(b"\x00" * 16)
    out.append(0x80)
    out.extend(len(si.buf).to_bytes(3, "big"))
    out.extend(si.buf)

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)
    w.write(7, 4)            # 16-bit blocksize-1 follows
    w.write(5, 4)            # 16 kHz
    w.write(nch - 1 if ch_code is None else ch_code, 4)
    w.write(4, 3)            # 16 bps
    w.write(0, 1)
    for b in _utf8(0):
        w.write(b, 8)
    w.write(blocksize - 1, 16)
    hdr = bytes(w.buf)
    assert w.nbits == 0
    w.write(_crc8(hdr), 8)
    write_subframes(w)
    w.align()
    frame = bytes(w.buf)
    out.extend(frame)
    out.extend(_crc16(frame).to_bytes(2, "big"))
    return bytes(out)


def _write_residual_custom(w, res, part_order, method=0, escape_parts=()):
    """Rice residual with the given partition order; selected partitions use
    the escape (raw nbits) encoding."""
    plen = 4 if method == 0 else 5
    w.write(method, 2)
    w.write(part_order, 4)
    nparts = 1 << part_order
    order = len(res["warm"])
    blocksize = res["blocksize"]
    vals = res["values"]
    pos = 0
    for p in range(nparts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        chunk = vals[pos: pos + n]
        pos += n
        if p in escape_parts:
            w.write((1 << plen) - 1, plen)
            nbits = 17
            w.write(nbits, 5)
            for v in chunk:
                w.write_signed(int(v), nbits)
        else:
            param = 3
            w.write(param, plen)
            for v in chunk:
                v = int(v)
                z = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
                w.unary(z >> param)
                if param:
                    w.write(z & ((1 << param) - 1), param)


def _decode_both(blob):
    nat, nat_rate, _ = flac_decode_native(blob)
    py_audio, py_rate = _decode_flac_python(blob)
    assert nat_rate == py_rate
    py_int = np.round(py_audio * 32768.0).astype(np.int64)
    np.testing.assert_array_equal(nat.astype(np.int64), py_int)
    return nat.astype(np.int64)


def test_lpc_subframe_multi_partition():
    rng = np.random.default_rng(7)
    blocksize = 512
    order, precision, shift = 3, 12, 10
    coeffs = [1900, -950, 60]
    res_vals = rng.integers(-40, 40, size=blocksize - order)
    warm = [100, -80, 55]

    # forward-run the predictor to know the expected output
    x = np.zeros(blocksize, np.int64)
    x[:order] = warm
    for i in range(order, blocksize):
        pred = sum(c * int(x[i - 1 - j]) for j, c in enumerate(coeffs))
        x[i] = res_vals[i - order] + (pred >> shift)

    def subframes(w):
        w.write(0, 1)                    # padding
        w.write(32 + order - 1, 6)       # LPC, order
        w.write(0, 1)                    # no wasted bits
        for v in warm:
            w.write_signed(v, 16)
        w.write(precision - 1, 4)
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(c, precision)
        _write_residual_custom(
            w, {"warm": warm, "blocksize": blocksize, "values": res_vals},
            part_order=2, escape_parts=(1,))

    blob = _craft_stream(subframes, blocksize)
    got = _decode_both(blob)
    np.testing.assert_array_equal(got[0], x)


def test_rice2_method_and_wasted_bits():
    rng = np.random.default_rng(11)
    blocksize = 256
    res_vals = rng.integers(-25, 25, size=blocksize - 1)
    warm = [40]
    wasted = 2

    x = np.zeros(blocksize, np.int64)
    x[0] = warm[0]
    for i in range(1, blocksize):
        x[i] = res_vals[i - 1] + x[i - 1]

    def subframes(w):
        w.write(0, 1)
        w.write(0b001000 | 1, 6)         # fixed, order 1
        w.write(1, 1)                    # wasted bits flag
        w.unary(wasted - 1)              # unary-coded wasted-1
        eff = 16 - wasted
        for v in warm:
            w.write_signed(v, eff)
        _write_residual_custom(
            w, {"warm": warm, "blocksize": blocksize, "values": res_vals},
            part_order=1, method=1)

    blob = _craft_stream(subframes, blocksize)
    got = _decode_both(blob)
    np.testing.assert_array_equal(got[0], x << wasted)


def test_verbatim_and_constant_subframes_stereo():
    blocksize = 192
    rng = np.random.default_rng(3)
    left = rng.integers(-3000, 3000, size=blocksize)
    const = -1234

    def subframes(w):
        w.write(0, 1)
        w.write(0b000001, 6)             # verbatim
        w.write(0, 1)
        for v in left:
            w.write_signed(int(v), 16)
        w.write(0, 1)
        w.write(0b000000, 6)             # constant
        w.write(0, 1)
        w.write_signed(const, 16)

    blob = _craft_stream(subframes, blocksize, nch=2)
    got = _decode_both(blob)
    np.testing.assert_array_equal(got[0], left)
    np.testing.assert_array_equal(got[1], np.full(blocksize, const))


def test_decode_speedup_sanity():
    """The native decoder must beat the pure-Python one comfortably (it is
    the data-loader hot path); generous 3x bound to stay timing-robust."""
    import time
    fs = 16000
    x = _tone(fs, 2.0, 440.0, channels=2, seed=5)
    blob = flac_encode_native(_quantize_int(x, 16).astype(np.int32), fs, 16,
                              4096, "left_side")
    t0 = time.perf_counter()
    for _ in range(3):
        flac_decode_native(blob)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _decode_flac_python(blob)
    t_py = time.perf_counter() - t0
    assert t_nat / 3 < t_py / 3.0, (t_nat / 3, t_py)
