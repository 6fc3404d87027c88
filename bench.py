"""Benchmark: batched enhancement throughput on one chip.

Metric: audio-sec/sec/chip for the full enhancement pipeline (1 conditioner
pass + 8 diffusion score passes, n_steps=8 / epsilon=1.3, the reference's
default inference cost, cf. BASELINE.md).  Baseline target: 100x real time
per chip (driver north star), so vs_baseline = value / 100.

Prints exactly one JSON line.
"""
import argparse
import json
import subprocess
import sys
import time


def _backend_alive(timeout_s: float = 120.0) -> bool:
    """Probe jax.devices() in a SUBPROCESS: the axon tunnel can wedge
    service-wide (observed >7h, CLAUDE.md) and then even backend init hangs
    forever — a hung bench records nothing at all, while an explicit error
    line tells the reader exactly what happened."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # probe only on a fresh interpreter: a caller that already imported and
    # configured jax (e.g. forcing platform=cpu) knows its backend works
    if "jax" not in sys.modules and not _backend_alive():
        print(json.dumps({
            "metric": "batched_enhancement_throughput",
            "value": 0.0,
            "unit": "audio-sec/sec/chip",
            "vs_baseline": 0.0,
            "detail": {"error": "TPU backend unavailable: jax.devices() hung "
                                ">120s (service-wide axon tunnel wedge; see "
                                "CLAUDE.md). Last good measurement: 1186 "
                                "audio-s/s (bf16, B=128), BENCH_r01.json."},
        }))
        return

    import jax
    import jax.numpy as jnp
    ap = argparse.ArgumentParser()
    # batch 128 (unpacked) is the stable throughput peak (1186 audio-s/s on
    # v5e, <1% run-to-run variance); batch 16-64 auto-enables the exact
    # lane-packed execution and lands within noise of the same peak at a
    # fraction of the batch (models/universe.py packed policy table).
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--n-steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                    help="network compute dtype (sampler math stays f32)")
    args = ap.parse_args()

    from open_universe_tpu.inference.torch_convert import fold_weight_norm
    from open_universe_tpu.models.presets import universepp

    model = universepp(fs=args.fs)
    params = model.init(jax.random.key(0))
    # deployment parity: the model loader folds weight norm for inference
    # (inference/model_loader.py), which also makes the ConvBlocks eligible
    # for the fused Pallas path at C>=128
    params = fold_weight_norm(model, params)
    key = jax.random.key(1)
    cdt = jnp.bfloat16 if args.dtype == "bf16" else None

    t = int(args.seconds * args.fs)
    mix = jax.random.normal(jax.random.key(2), (args.batch, t)) * 0.05

    @jax.jit
    def run(params, mix):
        return model.enhance(params, mix, key=key, n_steps=args.n_steps,
                             compute_dtype=cdt)

    # On the axon tunnel block_until_ready() does not reliably block
    # (CLAUDE.md); force execution by fetching a device-side scalar reduce —
    # executions on one device are serialized in launch order, so its 4-byte
    # result is only available once every prior iteration has run.
    _sync = jax.jit(lambda o: jnp.sum(o[-1]))

    # compile + warmup
    out = run(params, mix)
    float(jax.device_get(_sync(out)))

    start = time.perf_counter()
    for _ in range(args.iters):
        out = run(params, mix)
    float(jax.device_get(_sync(out)))
    elapsed = (time.perf_counter() - start) / args.iters

    audio_sec = args.batch * args.seconds
    rtf = audio_sec / elapsed
    print(json.dumps({
        "metric": "batched_enhancement_throughput",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rtf / 100.0, 4),
        "detail": {
            "dtype": args.dtype,
            "batch": args.batch,
            "clip_seconds": args.seconds,
            "n_steps": args.n_steps,
            "step_time_s": round(elapsed, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
