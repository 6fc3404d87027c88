"""24 kHz on-chip training smoke (round-5, VERDICT r4 Next #6).

``universepp_24k`` (rate factors [2,3,5,8], 48 channels, 128 mels —
reference config/model/universepp_24k.yaml) has forward+enhance golden
parity but had never trained a step on hardware; its shapes hit different
conv/GRU kernels than the 16 kHz flagship.  This runs a short GAN training
soak on the real chip against a 24 kHz rich-family synthetic task:

    python _tpu_smoke24.py [--steps 2000] [--val-every 500]

Validation every --val-every steps runs the real metric loop (enhancement
on val batches + EvalMetrics); each result is appended to
<run_dir>/val_curve.jsonl.  Evidence of a finished run is copied to
notes/smoke24_r5 by hand.  Done = the curve is stable (no NaN/update
skips, val/lsd decreasing) for ~2k steps.
"""
import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

import _tpu_soak

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s %(message)s")
log = logging.getLogger("smoke24")

ROOT = Path(__file__).parent
DATA = ROOT / "exp" / "smoke24_data"
RUN = ROOT / "exp" / "smoke24_r5"
FS = 24000


def make_dataset(n_train=512, clip_seconds=0.5):
    from open_universe_tpu.data.audio import save_audio

    if (DATA / ".done").exists():
        return
    t = np.arange(int(clip_seconds * FS)) / FS
    for split, n, seed in (("train", n_train, 0xC4),
                           ("val", 8, 0xC5), ("test", 8, 0xC6)):
        (DATA / split / "clean").mkdir(parents=True, exist_ok=True)
        (DATA / split / "noisy").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            g = np.random.default_rng((seed << 32) ^ i)
            clean = _tpu_soak._rich_clean(g, t, FS)
            noisy = _tpu_soak._rich_noisy(g, clean)
            save_audio(DATA / split / "clean" / f"c{i:04d}.wav",
                       clean.astype(np.float32), FS)
            save_audio(DATA / split / "noisy" / f"c{i:04d}.wav",
                       noisy.astype(np.float32), FS)
    (DATA / ".done").touch()
    log.info("24 kHz rich dataset written to %s", DATA)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--val-every", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.optim import gan_scheduler_units as units
    from open_universe_tpu.train.trainer import Trainer

    make_dataset()
    RUN.mkdir(parents=True, exist_ok=True)

    t_w, t_m = units(args.steps // 4, 0), units(args.steps, 0)
    overrides = [
        "experiment=universepp_vb_24k",
        f"datamodule.datasets.vb-train-24k.audio_path={DATA}",
        "datamodule.datasets.vb-train-24k.audio_len=0.5",
        f"datamodule.train.dl_opts.batch_size={args.batch}",
        "model.training.compute_dtype=bf16",
        "model.training.nan_guard=true",
        "model.training.dynamic_mixing=true",
        "+model.validation.num_tb_samples=2",
        f"model.scheduler.generator.scheduler.T_warmup={t_w}",
        f"model.scheduler.generator.scheduler.T_max={t_m}",
        f"model.scheduler.discriminator.scheduler.T_warmup={t_w}",
        f"model.scheduler.discriminator.scheduler.T_max={t_m}",
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    assert model.fs == FS

    class CurveTrainer(Trainer):
        def validate(self, step):
            metrics = super().validate(step)
            rec = {"step": step, "time": time.time(), **metrics}
            with open(RUN / "val_curve.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
            return metrics

    trainer = CurveTrainer(
        model, dm, RUN, max_steps=args.steps,
        val_check_interval=args.val_every, checkpoint_every=args.steps,
        log_every=100, max_val_batches=4, seed=0, mesh=make_mesh(dp=1),
        config=cfg)
    t0 = time.time()
    trainer.fit()
    dt = time.time() - t0
    log.info("24 kHz smoke done: %d steps in %.0fs (%.3f s/step incl val)",
             args.steps, dt, dt / args.steps)

    # full-test-split probe like the soak's
    import jax
    import jax.numpy as jnp

    from open_universe_tpu.metrics.bss import si_sdr

    params = trainer._eval_params()
    scores, noisy_scores = [], []
    for batch in trainer.dm.test_dataloader():
        mix = jnp.asarray(batch["noisy"])
        clean = np.asarray(batch["clean"])[:, :, 0]
        est = np.asarray(trainer._bucketed_enhance(
            params, mix, jax.random.key(9)))[:, :, 0]
        scores += [si_sdr(clean[i], est[i]) for i in range(est.shape[0])]
        noisy_scores += [si_sdr(clean[i], np.asarray(mix)[i, :, 0])
                         for i in range(mix.shape[0])]
    log.info("test SI-SDR (%d clips): noisy %.2f -> enhanced %.2f",
             len(scores), float(np.mean(noisy_scores)),
             float(np.mean(scores)))


if __name__ == "__main__":
    main()
