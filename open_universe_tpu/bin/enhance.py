"""Batch speech enhancement CLI (reference bin/enhance.py).

    python -m open_universe_tpu.bin.enhance input/ output/ \
        [--model line-corporation/open-universe:plusplus] \
        [--n_steps 8 --epsilon 1.3 --ensemble N --warm_start K ...]

Enhances a file or folder tree (structure preserved), resampling to/from the
model rate.  All keyword arguments of ``model.enhance`` are reflected into
CLI flags.  Unlike the reference (one clip per forward), clips are grouped
into length buckets and batched (--batch-size) so the jitted TPU program is
reused across the tree at high utilization.
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

from ..data.audio import (
    AUDIO_EXTS,
    audio_info,
    load_audio,
    resample_audio,
    save_audio,
)
from ..inference.model_loader import DEFAULT_MODEL, load_model
from ..inference.signature_to_parser import parse_with_enhance_args

DEFAULT_SEED = 1028282  # reference bin/enhance.py:112


_WRITABLE_EXTS = (".wav", ".mp3", ".flac")


def _out_suffix(out_path: Path) -> Path:
    """Keep the input container when we can encode it (reference
    bin/enhance.py:192 writes with the original suffix); otherwise wav."""
    if out_path.suffix.lower() in _WRITABLE_EXTS:
        return out_path
    return out_path.with_suffix(".wav")


def find_files(input_path: Path):
    if input_path.is_dir():
        files = sorted(p for p in input_path.rglob("*")
                       if p.suffix.lower() in AUDIO_EXTS)
        return files, input_path, True
    return [input_path], input_path.parent, False


def _bucket(files, fs_model, batch_size, quantum):
    """Group (path, channel) rows into (bucket_len, [(path, ch), ...])
    batches of equal padding.  Channels ride the batch dimension like the
    reference (bin/enhance.py:183-192 enhances the full (C, T) tensor), so
    a stereo file contributes two rows and is written back as stereo.

    Uses header-only probes (audio_info) — a full decode here would decode
    every file twice per run (the pure-Python FLAC fallback makes that the
    dominant cost on a small host)."""
    infos = []
    for p in files:
        n, fs, n_ch = audio_info(p)
        t_model = int(np.ceil(n * fs_model / fs))
        bucket = int(np.ceil(t_model / quantum)) * quantum
        for c in range(n_ch):
            infos.append((bucket, p, c))
    infos.sort(key=lambda x: (x[0], str(x[1]), x[2]))
    batches = []
    i = 0
    while i < len(infos):
        bucket = infos[i][0]
        group = []
        while (i < len(infos) and infos[i][0] == bucket
               and len(group) < batch_size):
            group.append((infos[i][1], infos[i][2]))
            i += 1
        batches.append((bucket, group))
    return batches


def main(argv=None):
    import jax

    parser = argparse.ArgumentParser(
        description="Enhance a file or a directory of audio files")
    parser.add_argument("input", type=Path)
    parser.add_argument("output", type=Path)
    parser.add_argument("--model", type=str, default=DEFAULT_MODEL)
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--batch-size", type=int, default=8,
                        help="clips enhanced per jitted call (per bucket)")
    parser.add_argument("--bucket-seconds", type=float, default=1.0,
                        help="length-bucket quantum for batching")
    parser.add_argument("--chunk-seconds", type=float, default=None,
                        help="process each file in fixed chunks of this many "
                        "seconds with 25%% overlap-add crossfade (one static "
                        "shape -> one compile for any duration; use for long "
                        "recordings)")
    args, model, params, enhance_kwargs = parse_with_enhance_args(
        parser, sys.argv[1:] if argv is None else argv, load_model)

    files, rel_path, dir_proc = find_files(args.input)
    if not files:
        print(f"no audio files found under {args.input}", file=sys.stderr)
        return 1

    key = jax.random.key(args.seed)

    if args.chunk_seconds is not None:
        from ..inference.chunked import make_chunked_enhancer

        enhancer = make_chunked_enhancer(
            model, chunk_seconds=args.chunk_seconds,
            max_batch=args.batch_size, **enhance_kwargs)
        n_done = 0
        t0 = time.perf_counter()
        total_audio = 0.0
        for path in files:
            audio, fs = load_audio(path)
            if fs != model.fs:
                audio = resample_audio(audio, fs, model.fs)
            # every channel is enhanced (reference bin/enhance.py:183-192:
            # channels ride the batch dim) and the file keeps its channels
            chans = []
            for c in range(audio.shape[0]):
                key, sub = jax.random.split(key)
                chans.append(np.asarray(enhancer(params, audio[c], key=sub)))
            out = np.stack(chans)
            total_audio += out.size / model.fs
            if fs != model.fs:
                out = resample_audio(out, model.fs, fs)
            if out.shape[0] == 1:
                out = out[0]
            if dir_proc:
                out_path = args.output / path.relative_to(rel_path)
            else:
                out_path = (args.output / path.name
                            if args.output.is_dir() else args.output)
            out_path.parent.mkdir(exist_ok=True, parents=True)
            save_audio(_out_suffix(out_path), out, fs)
            n_done += 1
            print(f"[{n_done}/{len(files)}] {path.name}", file=sys.stderr)
        dt = time.perf_counter() - t0
        print(f"enhanced {n_done} files ({total_audio:.1f}s audio) in "
              f"{dt:.1f}s ({total_audio / max(dt, 1e-9):.1f}x realtime)",
              file=sys.stderr)
        return 0

    quantum = int(args.bucket_seconds * model.fs)
    batches = _bucket(files, model.fs, args.batch_size, quantum)

    jit_enhance = jax.jit(
        lambda p, mix, key: model.enhance(p, mix, key=key, **enhance_kwargs))

    n_done = 0
    total_audio = 0.0
    t0 = time.perf_counter()
    # multichannel files may have their channels split across batches:
    # collect enhanced channels per file and write once complete
    pending = {}
    loaded = {}

    def _load(path):
        if path not in loaded:
            audio, fs = load_audio(path)
            if fs != model.fs:
                audio = resample_audio(audio, fs, model.fs)
            loaded[path] = (audio, fs)
        return loaded[path]

    for bucket_len, group in batches:
        mixes = []
        for path, ch in group:
            audio, _fs = _load(path)
            mixes.append(audio[ch])
        # pad the batch dimension too: a bucket's tail group would otherwise
        # be a fresh XLA shape -> a fresh compile per bucket
        rows = args.batch_size if len(group) < args.batch_size else len(group)
        batch = np.zeros((rows, bucket_len), np.float32)
        for i, m in enumerate(mixes):
            batch[i, : len(m)] = m

        key, sub = jax.random.split(key)
        enh = np.asarray(jit_enhance(params, batch, sub))[: len(group)]

        for i, (path, ch) in enumerate(group):
            audio, fs = _load(path)
            n_ch, length = audio.shape
            total_audio += length / model.fs
            slot = pending.setdefault(path, {})
            slot[ch] = enh[i, :length]
            if len(slot) < n_ch:
                continue
            out = np.stack([slot[c] for c in range(n_ch)])
            del pending[path], loaded[path]
            if fs != model.fs:
                out = resample_audio(out, model.fs, fs)
            if out.shape[0] == 1:
                out = out[0]
            if dir_proc:
                out_path = args.output / path.relative_to(rel_path)
                out_path.parent.mkdir(exist_ok=True, parents=True)
            else:
                out_path = (args.output / path.name
                            if args.output.is_dir() else args.output)
                out_path.parent.mkdir(exist_ok=True, parents=True)
            save_audio(_out_suffix(out_path), out, fs)
            n_done += 1
        print(f"[{n_done}/{len(files)}] bucket {bucket_len / model.fs:.1f}s "
              f"x{len(group)} rows", file=sys.stderr)
    assert not pending, f"unwritten channels for {list(pending)}"

    dt = time.perf_counter() - t0
    # actual clip seconds, not padded bucket seconds — the realtime factor
    # would otherwise be overstated by the padding ratio
    print(f"enhanced {n_done} files ({total_audio:.1f}s audio) in {dt:.1f}s "
          f"({total_audio / dt:.1f}x realtime)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
