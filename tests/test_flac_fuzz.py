"""Robustness of both FLAC decoders against malformed/adversarial input.

The data loader decodes whatever files the user points it at, and the native
decoder is C++ behind ctypes — a crafted stream must produce a clean Python
exception from BOTH the native decoder and the pure-Python fallback, never a
crash, an out-of-bounds access, or a silent divergence between the two.

Three layers:
- crafted streams targeting each validation guard (residual-partition
  underflow, wasted-bits >= bps, predictor order > blocksize, lying metadata
  length, negative LPC shift, LPC feedback overflow, out-of-int32 samples)
- random-payload frames behind VALID header+frame CRCs, so the fuzz reaches
  the subframe parsers instead of dying at the checksum
- byte-corruption fuzz over a valid encoded file (flips + truncations)

In every case the two decoders must agree: both reject, or both accept with
bit-identical output.  (The reference feeds flac through torchaudio's C++
backend — reference open_universe/bin/enhance.py:173-178 — and inherits
libFLAC's hardening; this is our equivalent evidence.)
"""
import numpy as np
import pytest

from open_universe_tpu import native
from open_universe_tpu.data.codecs import (_BitWriter, _crc8, _crc16,
                                           _decode_flac_python, _utf8_encode,
                                           encode_flac)

pytestmark = pytest.mark.skipif(native.get_flac_lib() is None,
                                reason="native FLAC codec unavailable")

# the pure-Python decoder signals malformed input through whichever of these
# its parsing machinery hits first; the native decoder always ValueError
PY_ERRS = (ValueError, EOFError, KeyError, IndexError, OverflowError)


def py_decode(data: bytes):
    return _decode_flac_python(data)


def nat_decode(data: bytes):
    samples, rate, bps = native.flac_decode_native(data)
    scale = float(1 << (bps - 1))
    return samples.astype(np.float32) / scale, rate


def both_reject(data: bytes, match=None):
    with pytest.raises(PY_ERRS):
        py_decode(data)
    with pytest.raises(ValueError, match=match):
        nat_decode(data)


# ---------------------------------------------------------------------------
# stream construction helpers
# ---------------------------------------------------------------------------

_SS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def make_stream(blocksize, subframe_writer, bps=16, rate=16000, nch=1,
                ch_code=None, meta_len_override=None, total=None):
    """One STREAMINFO + one frame whose subframe payload is caller-written.

    Header CRC-8 and frame CRC-16 are valid, so decoding reaches the
    subframe parser with exactly the payload bits the caller wrote.
    ``subframe_writer(w)`` is called once and writes ALL channel subframes.
    """
    total = blocksize if total is None else total
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.buf.extend(b"\x00" * 16)  # MD5 unset
    out.append(0x80)  # last-block | STREAMINFO
    n = len(si.buf) if meta_len_override is None else meta_len_override
    out += bytes([(n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF])
    out += si.buf

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 2)  # reserved + fixed-blocksize strategy
    w.write(7, 4)  # blocksize: explicit 16-bit field at header end
    w.write(5, 4)  # 16 kHz
    w.write(nch - 1 if ch_code is None else ch_code, 4)
    w.write(_SS_CODE[bps], 3)
    w.write(0, 1)  # reserved
    for b in _utf8_encode(0):
        w.write(b, 8)
    w.write(blocksize - 1, 16)
    w.write(_crc8(bytes(w.buf)), 8)
    subframe_writer(w)
    w.align()
    crc = _crc16(bytes(w.buf))
    out += w.buf
    out += bytes([crc >> 8, crc & 0xFF])
    return bytes(out)


def write_zero_residual(w, blocksize, order):
    w.write(0, 2)  # method 0 (4-bit Rice)
    w.write(0, 4)  # partition order 0
    w.write(0, 4)  # rice param 0
    for _ in range(blocksize - order):
        w.write(1, 1)  # unary zero


# ---------------------------------------------------------------------------
# crafted guard-trigger streams (each targets one hardening check)
# ---------------------------------------------------------------------------


def test_residual_partition_underflow_rejected():
    # fixed order 4 with partition order 6 on blocksize 192: the first
    # partition would hold 192/64 - 4 = -1 samples, driving the residual
    # write cursor negative (a heap underwrite without the guard)
    def sub(w):
        w.write(0, 1)
        w.write(8 + 4, 6)  # fixed, order 4
        w.write(0, 1)      # no wasted bits
        for _ in range(4):
            w.write(0, 16)  # warmup
        w.write(0, 2)   # residual method 0
        w.write(6, 4)   # partition order 6 -> 64 partitions
        w.write(0, 4)
        for _ in range(400):
            w.write(1, 1)

    both_reject(make_stream(192, sub), match="partition")


def test_wasted_bits_exceeding_bps_rejected():
    # constant subframe declaring 16 wasted bits at bps=16 -> effective
    # bps <= 0 (negative-width bit reads / UB shifts without the guard)
    def sub(w):
        w.write(0, 1)
        w.write(0, 6)   # constant
        w.write(1, 1)   # wasted-bits flag
        w.unary(15)     # wasted = 16
        w.write(0, 16)

    both_reject(make_stream(192, sub), match="wasted")


def test_predictor_order_exceeding_blocksize_rejected():
    # LPC order 32 on a 16-sample block: the warmup write alone would run
    # 16 samples past the block buffer without the guard
    def sub(w):
        w.write(0, 1)
        w.write(63, 6)  # LPC order 32
        w.write(0, 1)
        for _ in range(32):
            w.write(0, 16)

    both_reject(make_stream(16, sub), match="order")


def test_lying_metadata_length_handled():
    # STREAMINFO declaring 4000 bytes in a ~60-byte file: the bit reader
    # must clip to the buffer, not read past it.  The Python reference
    # behavior is to parse the (complete) STREAMINFO fields, skip past the
    # end of the file, and return an empty stream — the native decoder must
    # agree rather than OOB-read the declared length.
    def sub(w):
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write(0, 16)

    data = make_stream(192, sub, meta_len_override=4000)
    assert _agree(data, "lying metadata length")
    audio, rate = py_decode(data)
    assert audio.shape[1] == 0 and rate == 16000

    # a lying length that also truncates STREAMINFO itself must reject
    short = make_stream(192, sub, meta_len_override=4000)
    both_reject(short[:20])


def test_negative_lpc_shift_rejected():
    def sub(w):
        w.write(0, 1)
        w.write(32, 6)          # LPC order 1
        w.write(0, 1)
        w.write(0, 16)          # warmup
        w.write(13, 4)          # precision 14
        w.write_signed(-1, 5)   # negative shift
        w.write(0, 14)          # coefficient
        write_zero_residual(w, 16, 1)

    both_reject(make_stream(16, sub), match="shift")


def test_lpc_feedback_overflow_rejected():
    # order-2 LPC with maximal positive coefficients and large warmup:
    # x[i] = 16383*(x[i-1] + x[i-2]) blows past int64 within a few samples
    def sub(w):
        w.write(0, 1)
        w.write(33, 6)  # LPC order 2
        w.write(0, 1)
        w.write_signed(32767, 16)
        w.write_signed(32767, 16)
        w.write(14, 4)  # precision 15
        w.write_signed(0, 5)
        w.write_signed(16383, 15)
        w.write_signed(16383, 15)
        write_zero_residual(w, 4096, 2)

    both_reject(make_stream(4096, sub))


def test_out_of_int32_sample_rejected():
    # left/side stereo at bps=32: the side channel is 33 bits wide, so
    # right = left - side can reach 2^32, past int32.  The Python fallback
    # keeps int64 where the native ABI is int32 — both must reject instead
    # of one truncating silently.
    def sub(w):
        # left: constant 0 (32-bit)
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(0, 32)
        # side: constant -(2^32 - 1) (33-bit) -> right = 2^32 - 1
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(-(2**32 - 1), 33)

    both_reject(make_stream(16, sub, bps=32, nch=2, ch_code=8),
                match="int32")


def test_truncated_and_garbage_inputs_rejected():
    both_reject(b"")
    both_reject(b"fLa")
    both_reject(b"RIFF" + b"\x00" * 40)
    both_reject(b"fLaC")
    both_reject(b"fLaC" + b"\x80\x00\x00\x22" + b"\x00" * 10)


# ---------------------------------------------------------------------------
# fuzz layers
# ---------------------------------------------------------------------------


def _agree(data: bytes, ctx: str):
    py = nat = None
    py_err = nat_err = None
    try:
        py = py_decode(data)
    except PY_ERRS as e:
        py_err = f"{type(e).__name__}: {e}"
    try:
        nat = nat_decode(data)
    except ValueError as e:
        nat_err = f"ValueError: {e}"
    assert (py_err is None) == (nat_err is None), (
        f"{ctx}: python={py_err or 'accepted'} native={nat_err or 'accepted'}")
    if py_err is None:
        assert py[1] == nat[1], ctx
        assert np.array_equal(py[0], nat[0]), ctx
    return py_err is None


def _write_random_bits(w, rng, nbits):
    for _ in range(nbits // 16):
        w.write(int(rng.integers(0, 1 << 16)), 16)
    if nbits % 16:
        w.write(int(rng.integers(0, 1 << (nbits % 16))), nbits % 16)


def _write_valid_subframe(w, rng, blocksize, bps):
    """A spec-valid random subframe (constant/verbatim/fixed<=2)."""
    w.write(0, 1)
    kind = int(rng.integers(0, 3))
    if kind == 0:  # constant
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(int(rng.integers(-(2 ** 14), 2 ** 14)), bps)
    elif kind == 1:  # verbatim
        w.write(1, 6)
        w.write(0, 1)
        for _ in range(blocksize):
            w.write_signed(int(rng.integers(-(2 ** 14), 2 ** 14)), bps)
    else:  # fixed predictor, order <= 2 so the feedback stays bounded
        order = min(int(rng.integers(0, 3)), blocksize)
        w.write(8 + order, 6)
        w.write(0, 1)
        for _ in range(order):
            w.write_signed(int(rng.integers(-(2 ** 10), 2 ** 10)), bps)
        p = int(rng.integers(0, 6))
        w.write(0, 2)  # Rice method
        w.write(0, 4)  # partition order 0
        w.write(p, 4)
        for _ in range(blocksize - order):
            z = int(rng.integers(0, 1 << (p + 2)))
            w.unary(z >> p)
            if p:
                w.write(z & ((1 << p) - 1), p)


def test_random_subframe_payload_fuzz():
    """Payload bits behind valid CRCs reach the subframe parsers;
    accept/reject and decoded samples must agree between the decoders.

    Three trial shapes: fully random payloads (die anywhere in the parser),
    structured-random (valid subframe preamble, random body), and spec-valid
    random subframes incl. all four stereo modes (must be ACCEPTED by both
    with identical samples)."""
    rng = np.random.default_rng(0xF1AC)
    accepted = 0
    n_valid = 0
    for trial in range(250):
        blocksize = int(rng.integers(8, 384))
        shape = trial % 3
        if shape == 0:  # fully random
            nch = int(rng.integers(1, 3))

            def sub(w):
                _write_random_bits(w, rng, int(rng.integers(8, 600)))

            data = make_stream(blocksize, sub, nch=nch)
        elif shape == 1:  # valid preamble, random body
            stype = int(rng.choice([0, 1, 8, 9, 10, 11, 12, 32, 40, 63]))

            def sub(w):
                w.write(0, 1)
                w.write(stype, 6)
                w.write(0, 1)
                _write_random_bits(w, rng, int(rng.integers(8, 600)))

            data = make_stream(blocksize, sub)
        else:  # spec-valid subframes, random stereo decorrelation
            n_valid += 1
            nch = int(rng.integers(1, 3))
            ch_code = (int(rng.choice([1, 8, 9, 10])) if nch == 2
                       else 0)

            def sub(w):
                if ch_code == 8:  # left/side
                    _write_valid_subframe(w, rng, blocksize, 16)
                    _write_valid_subframe(w, rng, blocksize, 17)
                elif ch_code == 9:  # side/right
                    _write_valid_subframe(w, rng, blocksize, 17)
                    _write_valid_subframe(w, rng, blocksize, 16)
                elif ch_code == 10:  # mid/side
                    _write_valid_subframe(w, rng, blocksize, 16)
                    _write_valid_subframe(w, rng, blocksize, 17)
                else:
                    for _ in range(nch):
                        _write_valid_subframe(w, rng, blocksize, 16)

            data = make_stream(blocksize, sub, nch=nch, ch_code=ch_code)
        ok = _agree(data, f"payload trial {trial} shape {shape}")
        accepted += ok
        if shape == 2:
            assert ok, f"spec-valid trial {trial} rejected"
    # every spec-valid stream accepted, and the random shapes actually
    # exercised rejection paths
    assert accepted >= n_valid and accepted < 250


def test_byte_corruption_fuzz(tmp_path):
    """Bit flips and truncations of a valid file: both decoders agree."""
    rng = np.random.default_rng(0xC0DEC)
    t = np.arange(1000)
    x = (0.4 * np.sin(2 * np.pi * 220 * t / 16000)
         + 0.05 * rng.standard_normal(1000)).astype(np.float32)
    path = tmp_path / "base.flac"
    encode_flac(path, x, 16000, block_size=256)
    base = path.read_bytes()
    _agree(base, "uncorrupted")

    accepted = 0
    for trial in range(300):
        data = bytearray(base)
        if trial % 4 == 3:
            data = data[: int(rng.integers(0, len(data)))]
        else:
            for _ in range(int(rng.integers(1, 5))):
                data[int(rng.integers(0, len(data)))] = int(
                    rng.integers(0, 256))
        accepted += _agree(bytes(data), f"corruption trial {trial}")
    assert accepted < 300  # corruption must actually break some streams


def test_channel_count_mismatch_rejected():
    # STREAMINFO declares 2 channels but the frame carries 1 (ch_code=0):
    # both decoders must reject rather than silently change channel count
    def sub(w):
        w.write(0, 1)
        w.write(0, 6)   # constant
        w.write(0, 1)
        w.write_signed(100, 16)

    both_reject(make_stream(64, sub, nch=2, ch_code=0), match="channel")
