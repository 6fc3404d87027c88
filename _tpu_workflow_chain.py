"""On-chip proof of the full user workflow chain (round-2 evidence).

The reference's user journey is: train a UNIVERSE++ GAN run -> pick the best
checkpoint -> LoRA fine-tune from it -> enhance a test tree with both models
-> score with eval_metrics -> export/interop a checkpoint.  The r2 soak
(_tpu_soak.py) proved the GAN training + resume legs on the real chip; this
driver proves every OTHER leg, chained off one short on-chip GAN run:

  python _tpu_workflow_chain.py train     # 3k-step GAN run, val+ckpt every 1k
  python _tpu_workflow_chain.py lora      # LoRA fine-tune from that run dir
  python _tpu_workflow_chain.py enhance   # bin.enhance from both run dirs
  python _tpu_workflow_chain.py evaluate  # bin.eval_metrics + delta table
  python _tpu_workflow_chain.py export    # export_torch -> reload -> compare
  python _tpu_workflow_chain.py all

r3 (VERDICT weak #3): the r2 chain seeded every leg off its own 3k-step
run, whose checkpoint *degraded* the test clips — fine as plumbing proof,
useless as a product proof.  ``--gan-run <dir>`` seeds the chain from an
existing trained run (e.g. the 25k soak's best checkpoint) instead of
training one, and ``--data <dir>`` points at that run's dataset; with
``all`` the train leg is skipped.  The resulting chain_summary.json must
show enhanced > noisy:

  python _tpu_workflow_chain.py all --gan-run exp/soak_r3b \
      --data exp/soak_data_r3 --tag r3

Matches reference journey: train.py -> universe/lora.py:39 (load_model from
a run, EMA fold, LoRA inject) -> bin/enhance.py -> bin/eval_metrics.py.
Everything below uses the public CLIs / Trainer API only — no private hooks —
so this doubles as an integration test of the documented commands.
"""
import argparse
import json
import logging
import shutil
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s %(levelname)s %(message)s")
log = logging.getLogger("chain")

ROOT = Path(__file__).parent
DATA = ROOT / "exp" / "soak_data"   # reuse the soak's synthetic task
RUN_GAN = ROOT / "exp" / "chain_r2" / "gan"
RUN_LORA = ROOT / "exp" / "chain_r2" / "lora"
OUT = ROOT / "exp" / "chain_r2" / "enhanced"
FS = 16000

GAN_STEPS = 3000
LORA_STEPS = 400
VAL_EVERY = 1000
# dnsmos/plcmos run offline since r5 (in-house ONNX executor)
METRICS = ["si-sdr", "pesq-wb", "stoi-ext", "lsd", "dnsmos", "plcmos"]
TABLE_COLS = ["si-sdr", "pesq-wb", "stoi-ext", "lsd", "OVRL", "plcmos"]


def _dataset():
    import _tpu_soak
    _tpu_soak.make_dataset()


def phase_train():
    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    _dataset()
    overrides = [
        "experiment=universepp_vb_16k",
        f"datamodule.datasets.vb-train-16k.audio_path={DATA}",
        "datamodule.datasets.vb-train-16k.audio_len=0.5",
        "datamodule.train.dl_opts.batch_size=16",
        "model.training.compute_dtype=bf16",
        "model.training.nan_guard=true",
        # horizons scaled to the short run so warmup actually completes
        "model.scheduler.generator.scheduler.T_warmup=1000",
        f"model.scheduler.generator.scheduler.T_max={2 * GAN_STEPS}",
        "model.scheduler.discriminator.scheduler.T_warmup=1000",
        f"model.scheduler.discriminator.scheduler.T_max={2 * GAN_STEPS}",
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    trainer = Trainer(
        model, dm, RUN_GAN, max_steps=GAN_STEPS,
        val_check_interval=VAL_EVERY, checkpoint_every=VAL_EVERY,
        log_every=250, max_val_batches=4, seed=0, mesh=make_mesh(dp=1),
        config=cfg)
    t0 = time.time()
    trainer.fit()
    log.info("GAN run done: %d steps in %.0fs -> %s", GAN_STEPS,
             time.time() - t0, RUN_GAN)
    best = json.loads((RUN_GAN / "checkpoints" / "best.json").read_text())
    log.info("best checkpoint: %s", best)


def phase_lora():
    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    _dataset()
    overrides = [
        "experiment=universepp_lora_finetune",
        f"model.model={RUN_GAN}",          # fine-tune OUR run dir directly
        "model.losses.phonemeloss=null",   # HF-gated (zero egress)
        f"datamodule.datasets.vb-train-16k.audio_path={DATA}",
        "datamodule.datasets.vb-train-16k.audio_len=0.5",
        "datamodule.train.dl_opts.batch_size=4",
        "+model.training.compute_dtype=bf16",
        *LORA_OVERRIDES,
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    trainer = Trainer(
        model, dm, RUN_LORA, max_steps=LORA_STEPS,
        # one checkpoint at the end: each full-state save is ~3 min of
        # tunnel-bound transfer, and selection is already proven on the GAN leg
        val_check_interval=LORA_STEPS // 2, checkpoint_every=LORA_STEPS,
        log_every=50, max_val_batches=2, seed=1, mesh=make_mesh(dp=1),
        config=cfg)
    t0 = time.time()
    trainer.fit()
    log.info("LoRA fine-tune done: %d steps in %.0fs -> %s", LORA_STEPS,
             time.time() - t0, RUN_LORA)


def _cli(mod, argv):
    cmd = [sys.executable, "-m", mod] + [str(a) for a in argv]
    log.info("$ %s", " ".join(cmd))
    subprocess.run(cmd, check=True, cwd=ROOT)


ENHANCE_ARGS = []
LORA_OVERRIDES = []


def phase_enhance():
    for name, run in (("gan", RUN_GAN), ("lora", RUN_LORA)):
        if not run.exists():
            log.warning("skipping %s (run dir missing)", name)
            continue
        out = OUT / name
        if out.exists():
            shutil.rmtree(out)
        _cli("open_universe_tpu.bin.enhance",
             [DATA / "test" / "noisy", out, "--model", run,
              "--batch-size", 16] + ENHANCE_ARGS)


def phase_evaluate():
    rows = {}
    for name, deg in (("noisy", DATA / "test" / "noisy"),
                      ("gan", OUT / "gan"), ("lora", OUT / "lora")):
        if not deg.exists():
            continue
        rdir = OUT / f"results_{name}"
        _cli("open_universe_tpu.bin.eval_metrics",
             [deg, "--ref_path", DATA / "test" / "clean",
              "--result_dir", rdir, "--metrics"] + METRICS)
        summary = json.loads(
            (rdir / f"{deg.stem}_summary.json").read_text())
        rows[name] = summary
    log.info("=== summary (test split, %d files) ===", 16)
    hdr = ["model"] + TABLE_COLS
    print("\t".join(hdr))
    for name, s in rows.items():
        print("\t".join([name] + [f"{s.get(m, float('nan')):.3f}"
                                  for m in TABLE_COLS]))
    (OUT / "chain_summary.json").write_text(json.dumps(rows, indent=2))


def phase_export():
    """Export the GAN run to a torch .ckpt, reload it through the public
    model loader, and verify enhance() output matches the run-dir model."""
    import jax
    import jax.numpy as jnp

    from open_universe_tpu.data.audio import load_audio
    from open_universe_tpu.inference.model_loader import load_model

    ckpt = OUT / "export" / "weights.ckpt"
    ckpt.parent.mkdir(parents=True, exist_ok=True)
    _cli("open_universe_tpu.bin.export_torch", [RUN_GAN, ckpt])
    # the loader discovers config.yaml next to the ckpt
    shutil.copy(RUN_GAN / "config.yaml", ckpt.parent / "config.yaml")

    wav, fs = load_audio(sorted((DATA / "test" / "noisy").glob("*.wav"))[0])
    assert fs == FS
    # load_audio returns (channels, T); take the mono channel -> (B, T, C)
    mix = jnp.asarray(wav[0], dtype=jnp.float32)[None, :, None]

    m_run, p_run = load_model(str(RUN_GAN))
    m_ckpt, p_ckpt = load_model(str(ckpt))
    key = jax.random.key(7)
    a = np.asarray(m_run.enhance(p_run, mix, key))
    b = np.asarray(m_ckpt.enhance(p_ckpt, mix, key))
    err = float(np.max(np.abs(a - b)))
    denom = float(np.max(np.abs(a)) + 1e-9)
    log.info("export roundtrip: max|run - exported| = %.3e (rel %.3e)",
             err, err / denom)
    assert err / denom < 5e-3, (err, denom)
    log.info("export leg OK")


PHASES = {
    "train": phase_train,
    "lora": phase_lora,
    "enhance": phase_enhance,
    "evaluate": phase_evaluate,
    "export": phase_export,
}


def main():
    global DATA, RUN_GAN, RUN_LORA, OUT
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=list(PHASES) + ["all"])
    ap.add_argument("--gan-run", type=Path, default=None,
                    help="seed the chain from this existing run dir instead "
                         "of training the 3k GAN leg (e.g. exp/soak_r3b)")
    ap.add_argument("--data", type=Path, default=None,
                    help="dataset root with test/{clean,noisy} (defaults to "
                         "the chain's own synthetic task)")
    ap.add_argument("--tag", default=None,
                    help="output namespace: exp/chain_<tag>/ (default r2, "
                         "or r3 when --gan-run is given)")
    ap.add_argument("--enhance-arg", action="append", default=[],
                    help="extra flag for the enhance legs, repeatable "
                         "(e.g. --enhance-arg=--ensemble --enhance-arg=4)")
    ap.add_argument("--lora-steps", type=int, default=LORA_STEPS,
                    help="fine-tune length for the lora leg")
    ap.add_argument("--lora-override", action="append", default=[],
                    help="extra config override for the lora leg, repeatable "
                         "(e.g. --lora-override="
                         "model.losses.multires_l1.kwargs."
                         "time_domain_weight=0.5)")
    args = ap.parse_args()
    ENHANCE_ARGS.extend(args.enhance_arg)
    LORA_OVERRIDES.extend(args.lora_override)
    globals()["LORA_STEPS"] = args.lora_steps
    tag = args.tag or ("r3" if args.gan_run else "r2")
    RUN_LORA = ROOT / "exp" / f"chain_{tag}" / "lora"
    OUT = ROOT / "exp" / f"chain_{tag}" / "enhanced"
    if args.data is not None:
        DATA = args.data.resolve()
    if args.gan_run is not None:
        RUN_GAN = args.gan_run.resolve()
    else:
        RUN_GAN = ROOT / "exp" / f"chain_{tag}" / "gan"
    phases = dict(PHASES)
    if args.gan_run is not None:
        phases.pop("train")
    if args.phase == "all":
        for name, fn in phases.items():
            log.info("=== phase %s ===", name)
            fn()
    else:
        PHASES[args.phase]()


if __name__ == "__main__":
    main()
