"""DataLoader prefetch semantics and eval_metrics CLI helpers (r2 review
regressions): error propagation, abandoned-iterator cleanup, summary inf
handling, nested reference lookup, rerun skipping, header-only duration."""
import json
import threading
import time

import numpy as np
import pytest

from open_universe_tpu.data.dataset import DataLoader


class _FakeDataset:
    """Minimal dataset: __getitem__(i, rng=) -> (noisy(1,T), clean(1,T), key).
    Optionally raises at a given index."""

    def __init__(self, n=8, t=100, raise_at=None, delay=0.0):
        self.n, self.t, self.raise_at, self.delay = n, t, raise_at, delay

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        if self.raise_at is not None and i == self.raise_at:
            raise OSError(f"corrupt file at index {i}")
        if self.delay:
            time.sleep(self.delay)
        x = np.full((1, self.t), float(i), np.float32)
        return x, 0.5 * x, f"clip{i}"


def test_prefetch_propagates_producer_errors():
    """A dataset error mid-epoch must raise in the consumer, not silently
    truncate the epoch (the old `finally: q.put(None)` converted any IO
    error into a normal end-of-iteration)."""
    dl = DataLoader(_FakeDataset(n=8, raise_at=5), batch_size=2)
    batches = []
    with pytest.raises(OSError, match="corrupt file"):
        for b in dl:
            batches.append(b)
    assert len(batches) == 2  # indices 0..3 delivered before the error


def test_abandoned_iterator_stops_producer_thread():
    """Breaking out of a DataLoader iteration (validation does this at
    max_val_batches every pass) must not strand the producer thread blocked
    on the bounded queue."""
    before = threading.active_count()
    for _ in range(5):
        dl = DataLoader(_FakeDataset(n=64), batch_size=1, prefetch=1)
        it = iter(dl)
        next(it)
        it.close()  # what garbage collection of the generator does
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer threads leaked"


def test_loader_full_epoch_order_and_collate():
    dl = DataLoader(_FakeDataset(n=5, t=50), batch_size=2)
    batches = list(dl)
    assert [b["noisy"].shape for b in batches] == [(2, 50, 1)] * 2 + [(1, 50, 1)]
    assert batches[0]["key"] == ["clip0", "clip1"]
    np.testing.assert_array_equal(batches[0]["length"], [50, 50])


def test_summarize_excludes_inf():
    """Quirk intentionally fixed: the reference's `ignore_inf or not isinf`
    includes inf values with its own default, so one inf file poisons the
    summary mean."""
    from open_universe_tpu.bin.eval_metrics import summarize

    results = {"a": {"si-sdr": 10.0}, "b": {"si-sdr": float("inf")},
               "c": {"si-sdr": 20.0}}
    s = summarize(results)
    assert s["si-sdr"] == 15.0
    assert s["number"] == 3
    s2 = summarize(results, ignore_inf=False)
    assert np.isinf(s2["si-sdr"])


def test_prepare_nested_refs_and_stem_collisions(tmp_path):
    """Nested enhanced trees find their references in the mirrored clean
    subtree (the enhance CLI preserves structure); duplicate stems across
    subdirectories are keyed by relative path instead of dropped."""
    from scipy.io import wavfile

    from open_universe_tpu.bin.eval_metrics import prepare

    def wav(p, val):
        p.parent.mkdir(parents=True, exist_ok=True)
        wavfile.write(p, 16000, np.full(16000, val, np.int16))

    deg, ref = tmp_path / "deg", tmp_path / "ref"
    wav(deg / "sub1" / "a.wav", 100)
    wav(deg / "sub2" / "a.wav", 200)
    wav(deg / "sub1" / "b.wav", 300)
    wav(ref / "sub1" / "a.wav", 101)
    wav(ref / "sub2" / "a.wav", 201)
    wav(ref / "b.wav", 301)  # flat fallback (the reference's lookup rule)

    results, paths = prepare(ref, deg, tmp_path / "none.json")
    assert set(paths) == {"sub1/a", "sub2/a", "b"}
    assert paths["sub1/a"]["ref"] == ref / "sub1" / "a.wav"
    assert paths["sub2/a"]["ref"] == ref / "sub2" / "a.wav"
    assert paths["b"]["ref"] == ref / "b.wav"
    assert set(results) == set(paths)


def test_metrics_remaining_rerun_skip():
    """dnsmos emits OVRL/SIG/BAK keys, not 'dnsmos' — rerun skipping must
    match on the emitted keys (the reference recomputes dnsmos forever)."""
    from open_universe_tpu.metrics import Metrics

    done = {"OVRL_raw": 1, "SIG_raw": 1, "BAK_raw": 1,
            "OVRL": 1, "SIG": 1, "BAK": 1, "si-sdr": 5.0}
    assert Metrics.remaining(["dnsmos", "si-sdr"], done) == []
    assert Metrics.remaining(["dnsmos", "lsd"], done) == ["lsd"]
    assert Metrics.remaining(["pesq-wb"], {}) == ["pesq-wb"]


def test_audio_duration_header_only(tmp_path):
    """audio_duration reads container headers (wav RIFF walk, flac
    STREAMINFO) and matches the decoded length exactly."""
    from scipy.io import wavfile

    from open_universe_tpu.data.audio import audio_duration, save_audio

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(12345) * 0.1).astype(np.float32)

    wavfile.write(tmp_path / "a.wav", 16000, (x * 32767).astype(np.int16))
    assert audio_duration(tmp_path / "a.wav") == (12345, 16000)

    save_audio(tmp_path / "a.flac", x, 24000)
    assert audio_duration(tmp_path / "a.flac") == (12345, 24000)


def test_crossfade_window_high_overlap_smooth():
    """overlap > 0.5 used to leave a mid-overlap discontinuity (the tail
    ramp assignment overwrote part of the head ramp); the product-of-ramps
    window is smooth and unimodal for any admissible overlap."""
    from open_universe_tpu.inference.chunked import _crossfade_window

    for ov_frac in (0.25, 0.5, 0.75, 0.9):
        chunk = 400
        ov = int(round(chunk * ov_frac))
        w = _crossfade_window(chunk, ov)
        assert (w > 0).all() and w.max() <= 1.0 + 1e-6
        d = np.diff(w)
        # unimodal: once the window starts decreasing it never increases
        falling = False
        for v in d:
            if v < -1e-7:
                falling = True
            assert not (falling and v > 1e-7), ov_frac
        # no jumps anywhere near the ramp scale
        assert np.abs(d).max() < 3.0 / max(ov, 1)


def test_eval_metrics_per_metric_isolation():
    """One metric failing on a sample must not drop the other metrics for
    that sample (their means would silently cover different sample sets)."""
    from open_universe_tpu.metrics.eval import EvalMetrics

    em = EvalMetrics(audio_fs=16000, dnsmos=False)
    calls = {"n": 0}

    def flaky_pesq(fs, ref, deg, mode):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("silent clip")
        return 3.0

    em._pesq = flaky_pesq
    seen = []
    em._dnsmos = lambda x, fs: (seen.append(1) or
                                {"OVRL": 2.0, "SIG": 2.5, "BAK": 3.0})

    rng = np.random.default_rng(0)
    est = rng.standard_normal((2, 1, 8000)).astype(np.float32) * 0.1
    out = em(est, est * 0.9)
    assert out["pesq"] == 3.0          # mean over the one surviving sample
    assert len(seen) == 2              # dnsmos ran on BOTH samples
    assert out["dnsmos-OVRL"] == 2.0
    assert "lsd" in out


def test_audio_info_channel_probe(tmp_path):
    """audio_info reports channel counts from headers only (wav fmt chunk,
    flac STREAMINFO) — the enhance CLI's multichannel bucketing relies on
    it to count rows without decoding."""
    import numpy as np

    from open_universe_tpu.data.audio import audio_info, save_audio

    rng = np.random.default_rng(0)
    stereo = (0.1 * rng.standard_normal((2, 4321))).astype(np.float32)
    mono = stereo[0]
    save_audio(tmp_path / "st.wav", stereo, 16000)
    save_audio(tmp_path / "mo.wav", mono, 16000)
    save_audio(tmp_path / "st.flac", stereo, 24000)
    assert audio_info(tmp_path / "st.wav") == (4321, 16000, 2)
    assert audio_info(tmp_path / "mo.wav") == (4321, 16000, 1)
    assert audio_info(tmp_path / "st.flac") == (4321, 24000, 2)
