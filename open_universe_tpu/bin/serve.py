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
                  input sample rate.  Optional query args: none (model
                  sampler settings are fixed at server start so every
                  request compiles to the same program).
  GET  /healthz   liveness + model metadata JSON
  GET  /stats     request/batch/throughput counters JSON

All device work runs on a single worker thread (one jitted callable; XLA
caches one executable per (bucket, rows) shape, rows restricted to powers
of two).  Request threads only decode/encode audio.
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
    audio: np.ndarray          # mono f32 at model fs
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None


class EnhanceService:
    """Owns the model, the request queue, and the single device worker."""

    def __init__(self, model, params, *, max_batch=16, batch_window_ms=10.0,
                 bucket_seconds=1.0, max_clip_seconds=60.0, seed=DEFAULT_SEED,
                 enhance_kwargs=None):
        import jax

        self.model = model
        self.params = params
        self.max_batch = int(max_batch)
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
        with self._lock:
            self.stats["requests"] += 1
        self._q.put(job)
        return job

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._worker.join(timeout=10)
        # fail any job the worker never got to (queued behind the sentinel
        # or dequeued-but-unprocessed) so its request thread doesn't sit out
        # the full request timeout
        while True:
            try:
                j = self._q.get_nowait()
            except queue.Empty:
                break
            if j is not None:
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
        while not self._stop.is_set():
            jobs = self._collect()
            if not jobs:
                continue
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
                                 "max_batch": service.max_batch})
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
            body = self.rfile.read(int(cl))
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
            mono = audio[0]
            if fs != fs_model:
                mono = resample_audio(mono, fs, fs_model)
            if len(mono) == 0:
                self._json(400, {"error": "empty audio"})
                return
            if len(mono) > service.max_clip_len:
                self._json(413, {"error": "clip too long; use the chunked "
                                          "CLI for long recordings"})
                return
            job = service.submit(mono.astype(np.float32))
            if not job.done.wait(timeout=request_timeout):
                self._json(504, {"error": "enhancement timed out"})
                return
            if job.error is not None:
                self._json(500, {"error": job.error})
                return
            out = job.result
            if fs != fs_model:
                out = resample_audio(out, fs_model, fs)
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
                        help="compile the (1 x warmup bucket) program before "
                             "accepting traffic (0 disables)")
    args, model, params, enhance_kwargs = parse_with_enhance_args(
        parser, sys.argv[1:] if argv is None else argv, load_model)

    server, service = make_server(
        model, params, model_name=args.model, host=args.host, port=args.port,
        max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        bucket_seconds=args.bucket_seconds,
        max_clip_seconds=args.max_clip_seconds, seed=args.seed,
        enhance_kwargs=enhance_kwargs)
    if args.warmup_seconds > 0:
        import jax

        t = -(-int(args.warmup_seconds * model.fs) // service.quantum) \
            * service.quantum
        t0 = time.perf_counter()
        np.asarray(service._jit(params, np.zeros((1, t), np.float32),
                                jax.random.key(0)))
        print(f"warmup compile ({t / model.fs:.1f}s x 1): "
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
