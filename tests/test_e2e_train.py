"""End-to-end: config composition -> synthetic VB-style dataset -> Trainer.fit
with validation + checkpointing, on the CPU mesh."""
import numpy as np
import pytest

import jax


def _make_dataset(root, n_train=8, n_val=2, n_test=2, fs=16000, dur=0.3):
    from open_universe_tpu.data.audio import save_audio

    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val), ("test", n_test)):
        for sub in ("clean", "noisy"):
            (root / split / sub).mkdir(parents=True, exist_ok=True)
        for i in range(n):
            t = int(dur * fs) + (0 if split == "train" else i * 800)
            clean = 0.1 * np.sin(
                2 * np.pi * (200 + 50 * i) * np.arange(t) / fs).astype(
                np.float32)
            noise = 0.05 * rng.standard_normal(t).astype(np.float32)
            save_audio(root / split / "clean" / f"p{i:03d}.wav", clean, fs)
            save_audio(root / split / "noisy" / f"p{i:03d}.wav", clean + noise,
                       fs)


def test_compose_reference_experiments():
    from open_universe_tpu.configs.resolve import compose

    cfg = compose("config", ["experiment=universepp_vb_16k"])
    assert cfg["model"]["_target_"].endswith("UniverseGAN")
    assert cfg["model"]["condition_model"]["rate_factors"] == [2, 4, 4, 5]
    assert cfg["model"]["training"]["audio_len"] == 2.0  # interpolation
    assert cfg["trainer"]["max_steps"] == 300000
    assert cfg["model"]["scheduler"]["generator"]["scheduler"]["T_max"] == 300000

    cfg24 = compose("config", ["experiment=universepp_vb_24k"])
    assert cfg24["model"]["fs"] == 24000
    assert cfg24["model"]["score_model"]["rate_factors"] == [2, 3, 5, 8]
    assert cfg24["datamodule"]["train"]["dataset"] == "vb-train-24k"

    cfg_u = compose("config", ["experiment=universe_original_vb_16k",
                               "model.fs=16000", "seed=7"])
    assert cfg_u["model"]["_target_"].endswith(".Universe")
    assert cfg_u["seed"] == 7


def test_trainer_fit_universe_original(tmp_path):
    _make_dataset(tmp_path / "data")

    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    overrides = [
        "experiment=universe_original_vb_16k",
        f"datamodule.datasets.vb-train-16k.audio_path={tmp_path/'data'}",
        "datamodule.datasets.vb-train-16k.audio_len=0.1",
        "datamodule.train.dl_opts.batch_size=8",
        "model.score_model.n_channels=4",
        "model.score_model.n_rff=8",
        "model.score_model.noise_cond_dim=32",
        "model.condition_model.n_mels=16",
        "model.losses.mdn_n_comp=2",
        "trainer.max_steps=4",
        "trainer.val_check_interval=2",
        "trainer.log_every=1",
        "trainer.max_val_batches=1",
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    assert model.opt_kwargs["lr"] == 0.0002

    trainer = Trainer(model, dm, tmp_path / "run",
                      max_steps=4, val_check_interval=2, checkpoint_every=2,
                      log_every=1, max_val_batches=1, seed=0,
                      mesh=make_mesh(dp=8), config=cfg)
    state = trainer.fit()
    assert int(jax.device_get(state["step"])) == 4
    # adaptive histogram was produced by validation
    assert trainer.pr_cum is not None
    # checkpoints on disk
    ckpts = list((tmp_path / "run" / "checkpoints").glob("step_*"))
    assert len(ckpts) >= 2
    assert (tmp_path / "run" / "config.yaml").exists()

    # resume restores the step counter
    trainer2 = Trainer(model, dm, tmp_path / "run2",
                       max_steps=4, val_check_interval=100,
                       log_every=100, seed=0, mesh=make_mesh(dp=8))
    trainer2.restore(str(tmp_path / "run" / "checkpoints"))
    assert int(jax.device_get(trainer2.state["step"])) == 4


def test_trainer_fit_universe_gan(tmp_path):
    _make_dataset(tmp_path / "data", n_train=8, n_val=1, n_test=1, dur=0.22)

    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    overrides = [
        "experiment=universepp_vb_16k",
        f"datamodule.datasets.vb-train-16k.audio_path={tmp_path/'data'}",
        "datamodule.datasets.vb-train-16k.audio_len=0.2",
        "datamodule.train.dl_opts.batch_size=2",
        "model.score_model.n_channels=4",
        "model.score_model.noise_cond_dim=32",
        "model.condition_model.n_mels=16",
        "model.losses.multi_period_discriminator.mpd_reshapes=[2,3]",
        "model.losses.multi_period_discriminator.discriminator_channel_mult=0.125",
        "model.losses.multi_resolution_discriminator.resolutions="
        "[[128,30,75],[256,60,150],[64,12,30]]",
        "model.losses.multi_resolution_discriminator.discriminator_channel_mult=0.125",
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    assert model.opt_kwargs["generator"]["lr"] == 0.0002

    trainer = Trainer(model, dm, tmp_path / "run", max_steps=2,
                      val_check_interval=100, checkpoint_every=2, log_every=1,
                      max_val_batches=0, seed=0, mesh=make_mesh(dp=2),
                      config=cfg)
    state = trainer.fit()
    assert int(jax.device_get(state["step"])) == 2
    assert "disc_opt_state" in state


def test_trainer_fit_universepp_24k(tmp_path):
    """The 24 kHz recipe (rate [2,3,5,8], 128 mels — shrunk here) trains
    end-to-end through the same Trainer (reference
    config/experiment/universepp_vb_24k.yaml)."""
    _make_dataset(tmp_path / "data", n_train=4, n_val=1, n_test=1, fs=24000,
                  dur=0.15)

    from open_universe_tpu.configs.registry import instantiate
    from open_universe_tpu.configs.resolve import compose
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    overrides = [
        "experiment=universepp_vb_24k",
        f"datamodule.datasets.vb-train-24k.audio_path={tmp_path/'data'}",
        "datamodule.datasets.vb-train-24k.audio_len=0.1",
        "datamodule.train.dl_opts.batch_size=2",
        "model.score_model.n_channels=4",
        "model.score_model.noise_cond_dim=32",
        "model.condition_model.n_mels=16",
        "model.losses.multi_period_discriminator.mpd_reshapes=[2,3]",
        "model.losses.multi_period_discriminator.discriminator_channel_mult=0.125",
        "model.losses.multi_resolution_discriminator.resolutions="
        "[[128,30,75],[256,60,150],[64,12,30]]",
        "model.losses.multi_resolution_discriminator.discriminator_channel_mult=0.125",
    ]
    cfg = compose("config", overrides)
    dm = instantiate(cfg["datamodule"])
    model = instantiate(cfg["model"])
    assert model.fs == 24000
    # the 24k score net downsamples by 2*3*5*8 = 240
    assert int(np.prod(model.score_model.rate_factors)) == 240

    trainer = Trainer(model, dm, tmp_path / "run", max_steps=2,
                      val_check_interval=100, checkpoint_every=100,
                      log_every=1, max_val_batches=0, seed=0,
                      mesh=make_mesh(dp=2), config=cfg)
    state = trainer.fit()
    assert int(jax.device_get(state["step"])) == 2


def test_dotlist_strictness():
    """Hydra-semantics dotlist: plain overrides must hit existing keys (a
    typo like exp_dir=... used to be silently created and ignored), + adds,
    ++ upserts, ~ deletes."""
    from open_universe_tpu.configs.resolve import apply_dotlist, compose

    cfg = {"a": {"b": 1}, "flat": 2}
    assert apply_dotlist(cfg, ["a.b=3"])["a"]["b"] == 3
    with pytest.raises(KeyError):
        apply_dotlist(cfg, ["a.c=1"])
    with pytest.raises(KeyError):
        apply_dotlist(cfg, ["exp_dir=/tmp/x"])  # the actual typo that bit us
    out = apply_dotlist(cfg, ["+a.c=4", "+new.deep.key=5"])
    assert out["a"]["c"] == 4 and out["new"]["deep"]["key"] == 5
    with pytest.raises(KeyError):
        apply_dotlist(cfg, ["+a.b=9"])
    out = apply_dotlist(cfg, ["++a.b=9", "++a.z=10"])
    assert out["a"]["b"] == 9 and out["a"]["z"] == 10
    out = apply_dotlist(cfg, ["~a.b"])
    assert "b" not in out["a"]
    with pytest.raises(ValueError):
        apply_dotlist(cfg, ["~missing.key"])

    # through compose: + introduces a key absent from the model config
    cfg2 = compose("config", ["experiment=universe_original_vb_16k",
                              "+model.with_noise_target=true"])
    assert cfg2["model"]["with_noise_target"] is True
    assert cfg2["platform"] is None  # declared root key
