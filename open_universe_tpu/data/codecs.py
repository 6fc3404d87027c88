"""MP3 and FLAC decoding without torchaudio/soundfile.

The reference enhance CLI accepts wav/mp3/flac inputs through torchaudio
(reference bin/enhance.py:173-178).  Neither torchaudio nor libsndfile is
available in this image, so:

- MP3: ctypes bindings to the system ``libmpg123`` (decode) and
  ``libmp3lame`` (encode; used for round-trip tests and .mp3 output).
- FLAC: an in-house pure-Python/numpy decoder implementing the full frame
  spec — constant/verbatim/fixed/LPC subframes, Rice/Rice2 residual
  partitions, wasted bits, left/right/mid-side stereo decorrelation, CRC-16
  verification — plus a matching encoder (constant/verbatim/fixed subframes
  with per-subframe best-order selection, Rice residuals, all four stereo
  modes).  Lossless, so round-trips are bit-exact testable.

Both are host-side file IO, off the accelerator path.
"""
from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Tuple, Union

import numpy as np

# ---------------------------------------------------------------------------
# MP3 via libmpg123 / libmp3lame
# ---------------------------------------------------------------------------

_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_ENC_FLOAT_32 = 0x200
_MPG123_ADD_FLAGS = 2  # enum mpg123_parms (VERBOSE=0, FLAGS=1, ADD_FLAGS=2)
_MPG123_FORCE_FLOAT = 0x400

_mpg123 = None


def _load_mpg123():
    global _mpg123
    if _mpg123 is None:
        lib = ctypes.CDLL("libmpg123.so.0")
        lib.mpg123_init()
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_param.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_long, ctypes.c_double]
        lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_size_t,
                                    ctypes.POINTER(ctypes.c_size_t)]
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        _mpg123 = lib
    return _mpg123


def decode_mp3(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Returns (audio (channels, T) float32, sample_rate)."""
    lib = _load_mpg123()
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed ({err.value})")
    try:
        # force float32 output before the stream opens
        lib.mpg123_param(h, _MPG123_ADD_FLAGS, _MPG123_FORCE_FLOAT, 0.0)
        if lib.mpg123_open(h, str(path).encode()) != _MPG123_OK:
            raise RuntimeError(f"mpg123 cannot open {path}")
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        enc = ctypes.c_int(0)
        if lib.mpg123_getformat(h, ctypes.byref(rate), ctypes.byref(channels),
                                ctypes.byref(enc)) != _MPG123_OK:
            raise RuntimeError(f"mpg123_getformat failed for {path}")
        if enc.value != _MPG123_ENC_FLOAT_32:
            raise RuntimeError(
                f"mpg123 negotiated encoding {enc.value:#x}, not float32")

        chunks = []
        buf = ctypes.create_string_buffer(1 << 18)
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(h, buf, len(buf), ctypes.byref(done))
            if done.value:
                chunks.append(np.frombuffer(buf.raw[: done.value],
                                            np.float32).copy())
            if rc == _MPG123_DONE:
                break
            if rc != _MPG123_OK:
                raise RuntimeError(f"mpg123_read error {rc} for {path}")
        data = (np.concatenate(chunks) if chunks
                else np.zeros(0, np.float32))
        data = data.reshape(-1, channels.value).T
        return np.ascontiguousarray(data), int(rate.value)
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)


_lame = None


def _load_lame():
    global _lame
    if _lame is None:
        lib = ctypes.CDLL("libmp3lame.so.0")
        lib.lame_init.restype = ctypes.c_void_p
        for name in ("lame_set_in_samplerate", "lame_set_num_channels",
                     "lame_set_brate", "lame_set_quality"):
            getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.lame_init_params.argtypes = [ctypes.c_void_p]
        lib.lame_encode_buffer_ieee_float.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int]
        lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_int]
        lib.lame_close.argtypes = [ctypes.c_void_p]
        _lame = lib
    return _lame


def encode_mp3(path: Union[str, Path], audio: np.ndarray, fs: int,
               bitrate_kbps: int = 192):
    """audio: (T,) or (channels<=2, T) float32 in [-1, 1]."""
    lib = _load_lame()
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    if audio.shape[0] > 2:
        raise ValueError("mp3 supports at most 2 channels")
    ch, t = audio.shape
    gf = lib.lame_init()
    try:
        lib.lame_set_in_samplerate(gf, fs)
        lib.lame_set_num_channels(gf, ch)
        lib.lame_set_brate(gf, bitrate_kbps)
        lib.lame_set_quality(gf, 2)
        if lib.lame_init_params(gf) < 0:
            raise RuntimeError("lame_init_params failed")
        left = np.ascontiguousarray(audio[0])
        right = np.ascontiguousarray(audio[1] if ch == 2 else audio[0])
        out = ctypes.create_string_buffer(int(1.25 * t) + 7200)
        n = lib.lame_encode_buffer_ieee_float(
            gf, left.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t, out, len(out))
        if n < 0:
            raise RuntimeError(f"lame encode error {n}")
        data = out.raw[:n]
        n = lib.lame_encode_flush(gf, out, len(out))
        data += out.raw[:n]
        with open(path, "wb") as f:
            f.write(data)
    finally:
        lib.lame_close(gf)


# ---------------------------------------------------------------------------
# FLAC (pure Python/numpy decoder)
# ---------------------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over a byte buffer.

    Built ONCE per stream and repositioned between frames (frame starts are
    byte-aligned) — a per-frame construction would unpack the whole
    remaining file to bits for every frame, O(frames x filesize)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        b = self.bits[self.pos: self.pos + n]
        if len(b) < n:
            raise EOFError("flac: out of data")
        self.pos += n
        return int(b.dot(1 << np.arange(n - 1, -1, -1, dtype=np.uint64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        # Rice unary runs are short (q < 64 in practice): scan forward in
        # doubling windows instead of indexing every set bit of the stream
        pos = self.pos
        win = 64
        n = len(self.bits)
        while pos < n:
            seg = self.bits[pos: pos + win]
            first = int(seg.argmax())  # first 1, or 0 if all zero
            if seg[first]:
                one = pos + first
                q = one - self.pos
                self.pos = one + 1
                return q
            pos += len(seg)
            win *= 2
        raise EOFError("flac: out of data in unary read")

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


_BLOCKSIZE_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_TABLE = {0: None, 1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x80
    while first & mask:
        n += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(n - 1):
        val = (val << 6) | (bits.read(8) & 0x3F)
    return val


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> np.ndarray:
    method = bits.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = bits.read(4)
    nparts = 1 << part_order
    # spec: blocksize must divide evenly into 2^order partitions and the
    # first partition (blocksize/nparts - order samples) cannot be negative.
    # Without this check a crafted stream under/overruns the residual buffer
    # (negative first-partition length makes the write cursor negative).
    if blocksize % nparts or (blocksize >> part_order) < order:
        raise ValueError("flac: invalid residual partition order")
    out = np.empty(blocksize - order, np.int64)
    w = 0
    for p in range(nparts):
        n = (blocksize >> part_order) - (order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            for i in range(n):
                out[w + i] = bits.read_signed(nbits) if nbits else 0
        else:
            for i in range(n):
                q = bits.unary()
                r = bits.read(param) if param else 0
                v = (q << param) | r
                out[w + i] = (v >> 1) ^ -(v & 1)  # zigzag
        w += n
    return out


_FIXED_COEFFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("flac: invalid subframe padding bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if bps <= 0:
        raise ValueError("flac: wasted bits exceed bits per sample")

    if stype == 0:  # constant
        out = np.full(blocksize, bits.read_signed(bps), np.int64)
    elif stype == 1:  # verbatim
        out = np.array([bits.read_signed(bps) for _ in range(blocksize)],
                       np.int64)
    elif 8 <= stype <= 12:  # fixed
        order = stype - 8
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        warm = [bits.read_signed(bps) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, blocksize):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coeffs))
            out[i] = res[i - order] + pred
    elif stype >= 32:  # LPC
        order = stype - 31
        if order > blocksize:
            raise ValueError("flac: predictor order exceeds blocksize")
        warm = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid lpc precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative lpc shift")
        coeffs = [bits.read_signed(precision) for _ in range(order)]
        res = _decode_residual(bits, blocksize, order)
        out = np.empty(blocksize, np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            pred = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coeffs))
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")

    if wasted:
        out = out << wasted
    return out


def decode_flac(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Returns (audio (channels, T) float32 in [-1, 1], sample_rate).

    Dispatches to the native C++ decoder (open_universe_tpu/native) when it
    is available; the pure-Python path below is the reference implementation
    and fallback (tests assert sample-for-sample agreement).  Malformed
    input raises ValueError from either path — the Python parser's internal
    EOFError/KeyError/IndexError/OverflowError are normalized here so the
    public contract does not depend on which decoder ran.
    """
    with open(path, "rb") as f:
        data = f.read()
    from ..native import get_flac_lib
    if get_flac_lib() is not None:
        from ..native import flac_decode_native
        samples, rate, bps = flac_decode_native(data)
        scale = float(1 << (bps - 1))
        return samples.astype(np.float32) / scale, rate
    try:
        return _decode_flac_python(data, path)
    except (EOFError, KeyError, IndexError, OverflowError) as e:
        raise ValueError(
            f"{path}: malformed flac stream ({type(e).__name__}: {e})") from e


def _decode_flac_python(data: bytes, path="<bytes>") -> Tuple[np.ndarray, int]:
    if data[:4] != b"fLaC":
        raise ValueError(f"{path} is not a FLAC file")

    # metadata blocks
    pos = 4
    rate = channels = bps = None
    total = None
    while True:
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + length]
        if btype == 0:  # STREAMINFO
            b = _Bits(body)
            b.read(16); b.read(16)  # min/max blocksize
            b.read(24); b.read(24)  # min/max framesize
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
        pos += 4 + length
        if last:
            break
    if rate is None:
        raise ValueError("flac: missing STREAMINFO")

    out = []
    n_done = 0
    bits = _Bits(data)  # one unpack for the whole stream; repositioned below
    while pos < len(data) and (total is None or total == 0 or n_done < total):
        frame_start = pos
        bits.pos = pos * 8
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"flac: bad frame sync at byte {pos}")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)

        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        _SS = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
        fbps = _SS[ss_code]
        # CRC-8 over the header bytes (bit positions are absolute in the
        # stream; the frame starts byte-aligned at frame_start)
        hdr_bytes = (bits.pos - frame_start * 8 + 7) // 8
        if _crc8(data[frame_start: frame_start + hdr_bytes]) != \
                data[frame_start + hdr_bytes]:
            raise ValueError(f"flac: frame header CRC mismatch at {pos}")
        bits.pos = (frame_start + hdr_bytes + 1) * 8

        if ch_code < 8:
            nch = ch_code + 1
            chans = [_decode_subframe(bits, blocksize, fbps)
                     for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            chans = [left, left - side]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(bits, blocksize, fbps + 1)
            right = _decode_subframe(bits, blocksize, fbps)
            chans = [right + side, right]
        elif ch_code == 10:  # mid/side
            mid = _decode_subframe(bits, blocksize, fbps)
            side = _decode_subframe(bits, blocksize, fbps + 1)
            left = (((mid << 1) | (side & 1)) + side) >> 1
            chans = [left, left - side]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if len(chans) != channels:
            # native decoder rejects this too; without the check a frame
            # contradicting STREAMINFO silently changes the channel count
            raise ValueError("flac: channel count mismatch")

        bits.align()
        frame_len = bits.pos // 8 - frame_start
        crc = int.from_bytes(
            data[frame_start + frame_len: frame_start + frame_len + 2], "big")
        if _crc16(data[frame_start: frame_start + frame_len]) != crc:
            raise ValueError(f"flac: frame CRC-16 mismatch at {pos}")
        pos = frame_start + frame_len + 2

        out.append(np.stack(chans))
        n_done += blocksize

    audio = (np.concatenate(out, axis=1) if out
             else np.zeros((channels, 0), np.int64))
    if total:
        audio = audio[:, :total]
    # any valid stream fits signed 32-bit (bps <= 32); a decoded value
    # outside that range means a malformed stream, and the native decoder's
    # int32 output would otherwise silently truncate where this path doesn't
    if audio.size and (audio.max() > 0x7FFFFFFF or audio.min() < -0x80000000):
        raise ValueError("flac: decoded sample out of int32 range")
    scale = float(1 << (bps - 1))
    return (audio.astype(np.float32) / scale), int(rate)


# ---------------------------------------------------------------------------
# FLAC encoder (constant/verbatim/fixed subframes, Rice residuals)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, val: int, n: int):
        if n == 0:
            return
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, val: int, n: int):
        self.write(val & ((1 << n) - 1), n)

    def unary(self, q: int):
        # q zero bits followed by a one
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    payload = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        payload.append(0x80 | (n & 0x3F))
        n >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | n
    return bytes([lead] + payload[::-1])


def _rice_cost(res: np.ndarray, param: int) -> int:
    z = (np.abs(res) << 1) - (res < 0)
    return int(np.sum(z >> param)) + len(res) * (param + 1)


def _best_rice_param(res: np.ndarray) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res))) * 2.0
    guess = max(0, min(14, int(np.log2(mean + 1))))
    best, best_cost = guess, _rice_cost(res, guess)
    for p in (guess - 1, guess + 1):
        if 0 <= p <= 14:
            c = _rice_cost(res, p)
            if c < best_cost:
                best, best_cost = p, c
    return best


def _write_rice_residual(w: _BitWriter, res: np.ndarray):
    # method 0 (4-bit Rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    param = _best_rice_param(res)
    w.write(param, 4)
    for v in res:
        v = int(v)
        z = (v << 1) ^ (v >> 63) if v < 0 else (v << 1)
        w.unary(z >> param)
        if param:
            w.write(z & ((1 << param) - 1), param)


def _encode_subframe(w: _BitWriter, x: np.ndarray, bps: int):
    """Pick the cheapest of constant / fixed order 0-4 / verbatim."""
    w.write(0, 1)  # padding bit
    if len(x) and np.all(x == x[0]):
        w.write(0b000000, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
        return
    # evaluate fixed predictor orders
    diffs = [x.astype(np.int64)]
    for _ in range(4):
        diffs.append(np.diff(diffs[-1]))
    best_order, best_cost = 0, None
    for order in range(min(5, len(x))):
        res = diffs[order]
        cost = order * bps + _rice_cost(res, _best_rice_param(res))
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    if best_cost is not None and best_cost < len(x) * bps:
        order = best_order
        w.write(0b001000 | order, 6)
        w.write(0, 1)
        for i in range(order):
            w.write_signed(int(x[i]), bps)
        _write_rice_residual(w, diffs[order])
        return
    # verbatim fallback
    w.write(0b000001, 6)
    w.write(0, 1)
    for v in x:
        w.write_signed(int(v), bps)


def encode_flac(path: Union[str, Path], audio: np.ndarray, fs: int,
                bps: int = 16, block_size: int = 4096,
                stereo_mode: str = "auto"):
    """Lossless FLAC encode.

    audio: (T,) or (channels, T) float32 in [-1, 1] (quantized to ``bps``)
    or integer dtype (taken as-is).  stereo_mode: auto|independent|
    left_side|right_side|mid_side (2-channel input only).
    """
    audio = np.asarray(audio)
    if audio.ndim == 1:
        audio = audio[None, :]
    if np.issubdtype(audio.dtype, np.floating):
        scale = float(1 << (bps - 1))
        samples = np.clip(np.round(audio * scale), -scale, scale - 1)
        samples = samples.astype(np.int64)
    else:
        samples = audio.astype(np.int64)
    nch, t = samples.shape
    if nch > 8:
        raise ValueError("flac supports at most 8 channels")
    if stereo_mode != "auto" and stereo_mode != "independent" and nch != 2:
        raise ValueError(f"stereo_mode={stereo_mode} needs 2 channels")
    _SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
    if bps not in _SS_CODES:
        raise ValueError(f"unsupported bits-per-sample {bps}")
    mode = stereo_mode if nch == 2 else "independent"
    if mode == "auto":
        mode = "left_side"

    from ..native import get_flac_lib
    if get_flac_lib() is not None:
        from ..native import flac_encode_native
        data = flac_encode_native(samples, fs, bps, block_size, mode)
        with open(path, "wb") as f:
            f.write(data)
        return

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(fs, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(t, 36)
    si.buf.extend(b"\x00" * 16)  # MD5 unset
    out.append(0x80)  # last-block flag | type 0
    out.extend(len(si.buf).to_bytes(3, "big"))
    out.extend(si.buf)

    _SR_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                 22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11}
    _BS_CODES = {v: k for k, v in _BLOCKSIZE_TABLE.items()}
    ch_code = {"independent": nch - 1, "left_side": 8,
               "right_side": 9, "mid_side": 10}[mode]

    frame_idx = 0
    for start in range(0, max(t, 1), block_size):
        blk = samples[:, start: start + block_size]
        n = blk.shape[1]
        if n == 0:
            break
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocksize stream
        bs_code = _BS_CODES.get(n, 7)
        sr_code = _SR_CODES.get(fs, 14)
        w.write(bs_code, 4)
        w.write(sr_code, 4)
        w.write(ch_code, 4)
        w.write(_SS_CODES[bps], 3)
        w.write(0, 1)  # reserved
        for b in _utf8_encode(frame_idx):
            w.write(b, 8)
        if bs_code == 7:
            w.write(n - 1, 16)
        if sr_code == 14:
            w.write(fs, 16)
        hdr = bytes(w.buf)
        assert w.nbits == 0
        w.write(_crc8(hdr), 8)

        if ch_code == 8:  # left/side
            _encode_subframe(w, blk[0], bps)
            _encode_subframe(w, blk[0] - blk[1], bps + 1)
        elif ch_code == 9:  # right/side
            _encode_subframe(w, blk[0] - blk[1], bps + 1)
            _encode_subframe(w, blk[1], bps)
        elif ch_code == 10:  # mid/side
            _encode_subframe(w, (blk[0] + blk[1]) >> 1, bps)
            _encode_subframe(w, blk[0] - blk[1], bps + 1)
        else:
            for c in range(nch):
                _encode_subframe(w, blk[c], bps)
        w.align()
        frame = bytes(w.buf)
        out.extend(frame)
        out.extend(_crc16(frame).to_bytes(2, "big"))
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(bytes(out))
