"""HTTP enhancement service with transparent micro-batching.

    python -m open_universe_tpu.bin.serve --model <run_dir|ckpt|hf_repo> \
        [--port 8000] [--max-batch 16] [--batch-window-ms 10] [--n_steps 8 ...]

A production-serving front end the reference does not have (its inference
surface is the one-clip-at-a-time bin/enhance.py CLI): concurrent POSTs are
gathered for a few milliseconds, grouped into length buckets, padded to a
power-of-two batch and enhanced in ONE jitted TPU call — so the service
rides the same batched-throughput curve as offline enhancement (1187
audio-s/s/chip at batch 128 bf16 on v5e) instead of paying one dispatch per
request, while the exact lane-packed small-batch path (ops/packed.py)
auto-enables whenever a quiet period leaves a batch <= 64.

API:
  POST /enhance   body = a wav/mp3/flac file -> 200 with a WAV body at the
                  input sample rate and channel count (every channel is
                  enhanced — each is one micro-batch row, like the
                  reference's channels-ride-the-batch-dim enhance,
                  bin/enhance.py:183-192).  Optional query args: none
                  (model sampler settings are fixed at server start so
                  every request compiles to the same program).
  GET  /healthz   liveness + model metadata JSON
  GET  /stats     request/batch/throughput counters JSON

All device work runs on a single worker thread (one jitted callable; XLA
caches one executable per (bucket, rows) shape, rows restricted to powers
of two — max-batch is rounded DOWN to a power of two).  Request threads
only decode/encode audio.  At startup the whole executable grid for clips
up to --warmup-seconds is precompiled (service.precompile), so a cold
server answers any in-grid shape without an XLA compile in the request
window.
"""
import argparse
import json
import queue
import sys
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

from ..data.audio import load_audio, resample_audio, save_audio
from ..inference.model_loader import DEFAULT_MODEL, load_model
from ..inference.signature_to_parser import parse_with_enhance_args

DEFAULT_SEED = 1028282  # reference bin/enhance.py:112


def _sniff_suffix(body: bytes) -> str:
    if body[:4] == b"RIFF":
        return ".wav"
    if body[:4] == b"fLaC":
        return ".flac"
    return ".mp3"  # ID3 / bare MPEG frames


@dataclass
class _Job:
    audio: np.ndarray          # one channel, f32 at model fs
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None


@dataclass
class _WarmJob:
    """Internal: compile the (rows, bucket) program on the device worker."""
    bucket: int
    rows: int
    done: threading.Event = field(default_factory=threading.Event)


def _pow2_floor(n: int) -> int:
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


class EnhanceService:
    """Owns the model, the request queue, and the single device worker."""

    def __init__(self, model, params, *, max_batch=16, batch_window_ms=10.0,
                 bucket_seconds=1.0, max_clip_seconds=60.0, seed=DEFAULT_SEED,
                 enhance_kwargs=None):
        import jax

        self.model = model
        self.params = params
        # rows are restricted to powers of two so the executable-cache
        # bound (#buckets x #row-sizes) holds; a non-pow2 max_batch would
        # add one extra shape per bucket
        self.max_batch = _pow2_floor(int(max_batch))
        self.window_s = batch_window_ms / 1000.0
        self.quantum = max(1, int(bucket_seconds * model.fs))
        self.max_clip_len = int(max_clip_seconds * model.fs)
        self._key = jax.random.key(seed)
        kw = enhance_kwargs or {}
        self._jit = jax.jit(
            lambda p, mix, key: model.enhance(p, mix, key=key, **kw))
        self._q: "queue.Queue[_Job]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "clips": 0,
                      "audio_seconds": 0.0, "device_seconds": 0.0,
                      "errors": 0}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="enhance-worker")
        self._worker.start()

    # -------------------------------------------------------------- client
    def submit(self, audio: np.ndarray) -> _Job:
        job = _Job(audio=audio)
        if self._stop.is_set():
            # fail fast: a job enqueued after close() drained the queue
            # would otherwise block its request thread for the full
            # request timeout
            job.error = "server shutting down"
            job.done.set()
            return job
        with self._lock:
            self.stats["requests"] += 1
        self._q.put(job)
        return job

    def precompile(self, seconds: float):
        """Compile every (bucket <= seconds, pow2 rows <= max_batch)
        program on the device worker so no cold request pays an XLA
        compile inside its latency window.  Blocks until done; shape count
        = ceil(seconds/bucket_seconds) * (log2(max_batch)+1)."""
        warms = []
        b = self.quantum
        while b <= -(-int(seconds * self.model.fs) // self.quantum) \
                * self.quantum:
            rows = 1
            while rows <= self.max_batch:
                warms.append(_WarmJob(bucket=b, rows=rows))
                rows *= 2
            b += self.quantum
        for w in warms:
            self._q.put(w)
        for w in warms:
            w.done.wait()
        return len(warms)

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        # fail fast for anything still queued, then give the worker (which
        # may sit in a cold compile) time to finish its in-flight batch —
        # draining both before AND after the join closes the race where a
        # job lands behind the in-progress batch
        deadline = time.monotonic() + 300.0
        while True:
            self._drain_failed()
            self._worker.join(timeout=1.0)
            if not self._worker.is_alive() or time.monotonic() > deadline:
                break
        self._drain_failed()

    def _drain_failed(self):
        while True:
            try:
                j = self._q.get_nowait()
            except queue.Empty:
                break
            if isinstance(j, _WarmJob):
                j.done.set()
            elif j is not None:
                j.error = "server shutting down"
                j.done.set()

    # -------------------------------------------------------------- worker
    def _collect(self):
        """One blocking get, then drain for up to window_s / max_batch."""
        job = self._q.get()
        if job is None:
            return []
        jobs = [job]
        deadline = time.monotonic() + self.window_s
        while len(jobs) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                j = self._q.get(timeout=left)
            except queue.Empty:
                break
            if j is None:
                break
            jobs.append(j)
        return jobs

    def _run(self):
        import jax

        while not self._stop.is_set():
            jobs = self._collect()
            if not jobs:
                continue
            # warm jobs run alone (their (rows, bucket) shape is the point)
            real = []
            for j in jobs:
                if isinstance(j, _WarmJob):
                    try:
                        np.asarray(self._jit(
                            self.params,
                            np.zeros((j.rows, j.bucket), np.float32),
                            jax.random.key(0)))
                    finally:
                        j.done.set()
                else:
                    real.append(j)
            jobs = real
            # group by padded bucket length
            by_bucket = {}
            for j in jobs:
                b = -(-len(j.audio) // self.quantum) * self.quantum
                by_bucket.setdefault(b, []).append(j)
            for bucket, group in sorted(by_bucket.items()):
                try:
                    self._run_bucket(bucket, group)
                except Exception as e:  # noqa: BLE001 — report to client
                    with self._lock:
                        self.stats["errors"] += len(group)
                    for j in group:
                        j.error = f"{type(e).__name__}: {e}"
                        j.done.set()

    def _run_bucket(self, bucket, group):
        import jax

        rows = 1
        while rows < len(group):
            rows *= 2
        rows = min(rows, self.max_batch)
        batch = np.zeros((rows, bucket), np.float32)
        for i, j in enumerate(group):
            batch[i, : len(j.audio)] = j.audio
        self._key, sub = jax.random.split(self._key)
        t0 = time.perf_counter()
        enh = np.asarray(self._jit(self.params, batch, sub))
        dt = time.perf_counter() - t0
        with self._lock:
            self.stats["batches"] += 1
            self.stats["clips"] += len(group)
            self.stats["audio_seconds"] += sum(
                len(j.audio) for j in group) / self.model.fs
            self.stats["device_seconds"] += dt
        for i, j in enumerate(group):
            j.result = enh[i, : len(j.audio)]
            j.done.set()


def make_handler(service: EnhanceService, model_name: str,
                 request_timeout: float = 300.0):
    fs_model = service.model.fs
    # OOM guard: refuse bodies that cannot possibly be a valid clip BEFORE
    # buffering them — max clip duration at a generous 48 kHz / float32 /
    # 8 channels, plus container slack
    max_body_bytes = (int(service.max_clip_len / fs_model * 48000) * 4 * 8
                      + (1 << 20))

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "model": model_name,
                                 "fs": fs_model,
                                 "max_batch": service.max_batch,
                                 "channels": "all enhanced; output keeps "
                                             "the input channel count"})
            elif self.path == "/stats":
                with service._lock:
                    s = dict(service.stats)
                s["mean_batch"] = s["clips"] / max(s["batches"], 1)
                s["device_realtime_factor"] = (
                    s["audio_seconds"] / max(s["device_seconds"], 1e-9))
                self._json(200, s)
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            # Read (or refuse) the body BEFORE any response: answering with
            # the body still unread corrupts the HTTP/1.1 keep-alive stream
            # (the leftover bytes parse as the next request line).
            cl = self.headers.get("Content-Length")
            if cl is None:
                self.close_connection = True  # chunked/absent: can't drain
                self._json(411, {"error": "Content-Length required"})
                return
            try:
                cl = int(cl)
            except ValueError:
                self.close_connection = True  # body length unknowable
                self._json(400, {"error": "malformed Content-Length"})
                return
            if cl > max_body_bytes:
                # refuse BEFORE buffering: a huge Content-Length must not
                # be read into memory just to fail the duration check
                self.close_connection = True
                self._json(413, {"error": f"body exceeds {max_body_bytes} "
                                          "byte limit"})
                return
            body = self.rfile.read(cl)
            if self.path != "/enhance":
                self._json(404, {"error": "not found"})
                return
            try:
                with tempfile.NamedTemporaryFile(
                        suffix=_sniff_suffix(body)) as f:
                    f.write(body)
                    f.flush()
                    audio, fs = load_audio(f.name)
            except Exception as e:  # noqa: BLE001
                self._json(400, {"error": f"undecodable audio: {e}"})
                return
            if fs != fs_model:
                audio = resample_audio(audio, fs, fs_model)
            if audio.shape[-1] == 0:
                self._json(400, {"error": "empty audio"})
                return
            if audio.shape[-1] > service.max_clip_len:
                self._json(413, {"error": "clip too long; use the chunked "
                                          "CLI for long recordings"})
                return
            # every channel is enhanced (reference bin/enhance.py:183-192:
            # channels ride the batch dim); each channel is one micro-batch
            # row, so a stereo request batches exactly like two mono ones
            jobs = [service.submit(np.asarray(ch, np.float32))
                    for ch in audio]
            deadline = time.monotonic() + request_timeout
            for job in jobs:
                if not job.done.wait(timeout=max(0.0,
                                                 deadline - time.monotonic())):
                    self._json(504, {"error": "enhancement timed out"})
                    return
            errs = [j.error for j in jobs if j.error is not None]
            if errs:
                self._json(500, {"error": errs[0]})
                return
            out = np.stack([j.result for j in jobs])
            if fs != fs_model:
                out = resample_audio(out, fs_model, fs)
            if out.shape[0] == 1:
                out = out[0]
            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                save_audio(f.name, out, fs)
                wav = Path(f.name).read_bytes()
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(wav)))
            self.end_headers()
            self.wfile.write(wav)

    return Handler


def make_server(model, params, *, model_name="model", host="127.0.0.1",
                port=0, **service_kwargs):
    """Build (server, service); caller runs server.serve_forever()."""
    service = EnhanceService(model, params, **service_kwargs)
    server = ThreadingHTTPServer(
        (host, port), make_handler(service, model_name))
    server.service = service
    return server, service


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Serve speech enhancement over HTTP with micro-batching")
    parser.add_argument("--model", type=str, default=DEFAULT_MODEL)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--batch-window-ms", type=float, default=10.0)
    parser.add_argument("--bucket-seconds", type=float, default=1.0)
    parser.add_argument("--max-clip-seconds", type=float, default=60.0)
    parser.add_argument("--warmup-seconds", type=float, default=2.0,
                        help="precompile the full executable grid for clips "
                             "up to this long — every (bucket, pow2-rows <= "
                             "max-batch) program — before accepting traffic, "
                             "so no cold request pays an XLA compile inside "
                             "its latency window (0 disables)")
    args, model, params, enhance_kwargs = parse_with_enhance_args(
        parser, sys.argv[1:] if argv is None else argv, load_model)

    server, service = make_server(
        model, params, model_name=args.model, host=args.host, port=args.port,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        bucket_seconds=args.bucket_seconds,
        max_clip_seconds=args.max_clip_seconds, seed=args.seed,
        enhance_kwargs=enhance_kwargs)
    if args.warmup_seconds > 0:
        t0 = time.perf_counter()
        n = service.precompile(args.warmup_seconds)
        print(f"precompiled {n} (bucket, rows) programs in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print(f"serving {args.model} on http://{args.host}:"
          f"{server.server_address[1]} (fs={model.fs}, "
          f"max_batch={args.max_batch})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
