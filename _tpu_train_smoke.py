"""Short real-TPU training run: does the full trainer pipeline learn?"""
import numpy as np, jax, logging, tempfile, time
from pathlib import Path
logging.basicConfig(level=logging.INFO)

from open_universe_tpu.data.audio import save_audio
from open_universe_tpu.configs.registry import instantiate
from open_universe_tpu.configs.resolve import compose
from open_universe_tpu.parallel.mesh import make_mesh
from open_universe_tpu.train.trainer import Trainer
from open_universe_tpu.metrics.bss import si_sdr

root = Path(tempfile.mkdtemp())
fs = 16000
rng = np.random.default_rng(0)
for split, n in (("train", 64), ("val", 4), ("test", 2)):
    (root / split / "clean").mkdir(parents=True)
    (root / split / "noisy").mkdir(parents=True)
    for i in range(n):
        t = int(0.6 * fs)
        f0 = 150 + 20 * (i % 12)
        clean = 0.08 * np.sin(2 * np.pi * f0 * np.arange(t) / fs) * (
            0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * np.arange(t) / fs))
        noise = 0.05 * rng.standard_normal(t)
        save_audio(root / split / "clean" / f"c{i:03d}.wav", clean.astype(np.float32), fs)
        save_audio(root / split / "noisy" / f"c{i:03d}.wav", (clean + noise).astype(np.float32), fs)

overrides = [
    "experiment=universe_original_vb_16k",
    f"datamodule.datasets.vb-train-16k.audio_path={root}",
    "datamodule.datasets.vb-train-16k.audio_len=0.5",
    "datamodule.train.dl_opts.batch_size=16",
    "model.optimizer.lr=0.001",
]
cfg = compose("config", overrides)
dm = instantiate(cfg["datamodule"])
model = instantiate(cfg["model"])
trainer = Trainer(model, dm, root / "run", max_steps=12000,
                  val_check_interval=4000, checkpoint_every=12000, log_every=500,
                  max_val_batches=4, seed=0, mesh=make_mesh(dp=1), config=cfg)

# quality before
import jax.numpy as jnp
val_batch = next(iter(dm.val_dataloader()))
mix = jnp.asarray(val_batch["noisy"]); clean = np.asarray(val_batch["clean"])[:, :, 0]
def q(params):
    est = np.asarray(model.enhance(params, mix[:, :, 0], key=jax.random.key(9)))
    return float(np.mean([si_sdr(clean[i], est[i]) for i in range(est.shape[0])]))
print("SI-SDR noisy vs clean:", float(np.mean([si_sdr(clean[i], np.asarray(mix)[i,:,0]) for i in range(mix.shape[0])])))
print("SI-SDR @init:", q(trainer._eval_params()))
t0 = time.time()
trainer.fit()
print(f"trained 12000 steps in {time.time()-t0:.0f}s")
print("SI-SDR @12000:", q(trainer._eval_params()))
