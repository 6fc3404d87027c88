"""CLI tests: enhance -> eval_metrics -> make_table on a tiny model/dataset."""
import json

import numpy as np
import pytest
import yaml

import jax
import torch

from open_universe_tpu.configs.registry import instantiate
from open_universe_tpu.data.audio import load_audio, save_audio
from open_universe_tpu.inference.torch_convert import to_torch_state_dict

from test_checkpoint_conversion import TINY_GAN_CFG


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)
    t_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    torch.save({"state_dict": t_sd}, tmp / "weights.ckpt")
    with open(tmp / "config.yaml", "w") as f:
        yaml.safe_dump({"model": TINY_GAN_CFG}, f)
    return tmp / "weights.ckpt"


def test_enhance_cli(tmp_path, tiny_ckpt, rng):
    in_dir = tmp_path / "in" / "sub"
    in_dir.mkdir(parents=True)
    fs = 16000
    for i, dur in enumerate((0.21, 0.35, 0.21)):
        t = int(dur * fs)
        x = 0.1 * np.sin(2 * np.pi * 300 * np.arange(t) / fs) \
            + 0.02 * rng.standard_normal(t)
        save_audio(in_dir / f"clip{i}.wav", x.astype(np.float32), fs)

    out_dir = tmp_path / "out"
    from open_universe_tpu.bin.enhance import main

    rc = main([str(tmp_path / "in"), str(out_dir), "--model", str(tiny_ckpt),
               "--batch-size", "2", "--bucket-seconds", "0.5",
               "--n_steps", "2"])
    assert rc == 0
    outs = sorted(out_dir.rglob("*.wav"))
    assert len(outs) == 3
    enh, fs2 = load_audio(outs[0])
    assert fs2 == fs
    assert enh.shape[-1] == int(0.21 * fs)
    assert np.isfinite(enh).all()


def test_enhance_cli_mixed_containers(tmp_path, tiny_ckpt, rng):
    """flac/mp3/wav inputs are decoded and outputs keep the container
    (reference bin/enhance.py:173-178,192)."""
    import ctypes

    try:
        ctypes.CDLL("libmpg123.so.0")
        have_mp3 = True
    except OSError:
        have_mp3 = False

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    fs = 16000
    t = int(0.3 * fs)
    x = (0.1 * np.sin(2 * np.pi * 300 * np.arange(t) / fs)
         + 0.02 * rng.standard_normal(t)).astype(np.float32)
    names = ["a.flac", "c.wav"] + (["b.mp3"] if have_mp3 else [])
    for n in names:
        save_audio(in_dir / n, x, fs)

    out_dir = tmp_path / "out"
    from open_universe_tpu.bin.enhance import main

    rc = main([str(in_dir), str(out_dir), "--model", str(tiny_ckpt),
               "--batch-size", "2", "--bucket-seconds", "0.5",
               "--n_steps", "2"])
    assert rc == 0
    got = sorted(p.name for p in out_dir.iterdir())
    assert got == sorted(names)
    for p in out_dir.iterdir():
        y, fs2 = load_audio(p)
        assert fs2 == fs and y.shape[-1] > 0 and np.isfinite(y).all()


def test_eval_metrics_and_make_table_cli(tmp_path, rng, capsys):
    fs = 16000
    deg_dir = tmp_path / "enhanced"
    ref_dir = tmp_path / "clean"
    deg_dir.mkdir()
    ref_dir.mkdir()
    for i in range(2):
        t = 2 * fs
        clean = (0.1 * np.sin(2 * np.pi * (250 + 30 * i) * np.arange(t) / fs)
                 * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * np.arange(t) / fs))
                 + 0.02 * rng.standard_normal(t)).astype(np.float32)
        deg = clean + 0.03 * rng.standard_normal(t).astype(np.float32)
        save_audio(ref_dir / f"c{i}.wav", clean, fs)
        save_audio(deg_dir / f"c{i}.wav", deg, fs)

    from open_universe_tpu.bin.eval_metrics import main as eval_main

    rc = eval_main([str(deg_dir), "--ref_path", str(ref_dir),
                    "--metrics", "si-sdr", "lsd", "stoi-ext"])
    assert rc == 0
    summary_path = tmp_path / "enhanced_summary.json"
    assert summary_path.exists()
    with open(summary_path) as f:
        summary = json.load(f)
    assert summary["number"] == 2
    assert summary["si-sdr"] > 3

    # rerun skips existing metrics (incremental)
    rc = eval_main([str(deg_dir), "--ref_path", str(ref_dir),
                    "--metrics", "si-sdr", "lsd", "stoi-ext"])
    assert rc == 0

    from open_universe_tpu.bin.make_table import main as table_main

    capsys.readouterr()
    rc = table_main(["--results", str(summary_path), "--labels", "tiny",
                     "--metrics", "si-sdr", "lsd", "stoi-ext"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tiny" in out and "si-sdr" in out


def test_eval_metrics_parallel_and_mixed_containers(tmp_path, rng):
    """--workers N matches the sequential results; flac degraded files and
    flac references are collected alongside wav (extension beyond the
    reference, which globs *.wav only — reference bin/eval_metrics.py:86)."""
    fs = 16000
    deg_dir = tmp_path / "enhanced"
    ref_dir = tmp_path / "clean"
    deg_dir.mkdir()
    ref_dir.mkdir()
    for i in range(3):
        t = 2 * fs
        clean = (0.1 * np.sin(2 * np.pi * (250 + 30 * i) * np.arange(t) / fs)
                 * (0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * np.arange(t) / fs))
                 + 0.02 * rng.standard_normal(t)).astype(np.float32)
        deg = clean + 0.03 * rng.standard_normal(t).astype(np.float32)
        ext = "flac" if i == 1 else "wav"
        save_audio(ref_dir / f"c{i}.{ext}", clean, fs)
        save_audio(deg_dir / f"c{i}.{ext}", deg, fs)

    from open_universe_tpu.bin.eval_metrics import main as eval_main

    seq_dir = tmp_path / "seq"
    seq_dir.mkdir()
    rc = eval_main([str(deg_dir), "--ref_path", str(ref_dir),
                    "--result_dir", str(seq_dir),
                    "--metrics", "si-sdr", "lsd"])
    assert rc == 0
    par_dir = tmp_path / "par"
    par_dir.mkdir()
    rc = eval_main([str(deg_dir), "--ref_path", str(ref_dir),
                    "--result_dir", str(par_dir), "--workers", "2",
                    "--force-workers",  # 3 files would be clamped sequential
                    "--metrics", "si-sdr", "lsd"])
    assert rc == 0

    with open(seq_dir / "enhanced.json") as f:
        seq = json.load(f)
    with open(par_dir / "enhanced.json") as f:
        par = json.load(f)
    assert set(seq) == set(par) == {"c0", "c1", "c2"}
    for lbl in seq:
        for met in seq[lbl]:
            assert abs(seq[lbl][met] - par[lbl][met]) < 1e-6, (lbl, met)


def test_enhance_cli_chunked(tmp_path, tiny_ckpt, rng):
    in_dir = tmp_path / "in"
    in_dir.mkdir(parents=True)
    fs = 16000
    t = int(0.8 * fs)
    x = 0.1 * np.sin(2 * np.pi * 250 * np.arange(t) / fs) \
        + 0.02 * rng.standard_normal(t)
    save_audio(in_dir / "long.wav", x.astype(np.float32), fs)

    out_dir = tmp_path / "out"
    from open_universe_tpu.bin.enhance import main

    rc = main([str(in_dir), str(out_dir), "--model", str(tiny_ckpt),
               "--chunk-seconds", "0.3", "--batch-size", "2", "--n_steps", "2"])
    assert rc == 0
    enh, fs2 = load_audio(out_dir / "long.wav")
    assert fs2 == fs and enh.shape[-1] == t
    assert np.isfinite(enh).all()


def test_train_cli_end_to_end(tmp_path, rng):
    """train.py main: compose -> fit -> checkpoint -> test-set eval, with
    platform=cpu (reference train.py surface incl. trainer.test,
    reference train.py:105-119)."""
    fs = 16000
    data = tmp_path / "data"
    for split, n in (("train", 4), ("val", 1), ("test", 2)):
        for sub in ("clean", "noisy"):
            (data / split / sub).mkdir(parents=True)
        for i in range(n):
            t = int(0.25 * fs)
            clean = (0.1 * np.sin(2 * np.pi * (220 + 40 * i)
                                  * np.arange(t) / fs)).astype(np.float32)
            noise = 0.05 * rng.standard_normal(t).astype(np.float32)
            save_audio(data / split / "clean" / f"p{i}.wav", clean, fs)
            save_audio(data / split / "noisy" / f"p{i}.wav", clean + noise, fs)

    import train as train_mod

    train_mod.main([
        "experiment=universepp_vb_16k", "platform=cpu",
        f"path.exp_root={tmp_path/'exp'}",
        f"datamodule.datasets.vb-train-16k.audio_path={data}",
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
        "model.diffusion.n_steps=2",
        "trainer.mesh_dp=2",  # conftest exposes 8 virtual devices; batch is 2
        "trainer.max_steps=1", "trainer.val_check_interval=100",
        "trainer.checkpoint_every=1", "trainer.log_every=1",
        "trainer.max_val_batches=0",
        "test=true",
    ])
    runs = list((tmp_path / "exp" / "universepp_vb_16k").iterdir())
    assert len(runs) == 1
    run = runs[0]
    assert (run / "config.yaml").exists()
    assert (run / "checkpoints" / "last.json").exists()
    with open(run / "test_summary.json") as f:
        summary = json.load(f)
    assert summary["number"] == 2.0

    # the run dir itself is a loadable model spec: enhance straight from the
    # orbax checkpoint (best.json/last.json selection), no torch export step
    out_dir = tmp_path / "enh_from_run"
    from open_universe_tpu.bin.enhance import main as enhance_main

    rc = enhance_main([str(data / "test" / "noisy"), str(out_dir),
                       "--model", str(run), "--n_steps", "2"])
    assert rc == 0
    outs = sorted(out_dir.rglob("*.wav"))
    assert len(outs) == 2
    enh, _ = load_audio(outs[0])
    assert np.isfinite(enh).all()


def test_enhance_cli_stereo(tmp_path, tiny_ckpt, rng):
    """Multichannel files keep their channel count and every channel is
    enhanced (reference bin/enhance.py:183-192 runs the full (C, T) tensor
    through enhance; ours batches (path, channel) rows)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    fs = 16000
    t = int(0.21 * fs)
    n = np.arange(t) / fs
    stereo = np.stack([
        0.1 * np.sin(2 * np.pi * 220 * n) + 0.02 * rng.standard_normal(t),
        0.1 * np.sin(2 * np.pi * 440 * n) + 0.02 * rng.standard_normal(t),
    ]).astype(np.float32)
    mono = (0.1 * np.sin(2 * np.pi * 330 * n)
            + 0.02 * rng.standard_normal(t)).astype(np.float32)
    save_audio(in_dir / "stereo.wav", stereo, fs)
    save_audio(in_dir / "mono.wav", mono, fs)

    out_dir = tmp_path / "out"
    from open_universe_tpu.bin.enhance import main

    # batch-size 2 forces the stereo file's channels to share one batch
    # with the mono clip split across batches (reassembly across groups)
    rc = main([str(in_dir), str(out_dir), "--model", str(tiny_ckpt),
               "--batch-size", "2", "--bucket-seconds", "0.5",
               "--n_steps", "2"])
    assert rc == 0
    enh_st, fs_st = load_audio(out_dir / "stereo.wav")
    enh_mono, fs_mono = load_audio(out_dir / "mono.wav")
    assert fs_st == fs and fs_mono == fs
    assert enh_st.shape == (2, t)
    assert enh_mono.shape == (1, t)  # load_audio returns (C, T)
    assert np.isfinite(enh_st).all() and np.isfinite(enh_mono).all()
    # both channels really enhanced (distinct inputs -> distinct outputs)
    assert not np.array_equal(enh_st[0], enh_st[1])
    assert np.any(enh_st != 0) and np.any(enh_mono != 0)


def test_enhance_cli_chunked_stereo(tmp_path, tiny_ckpt, rng):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    fs = 16000
    t = int(0.6 * fs)
    n = np.arange(t) / fs
    stereo = np.stack([
        0.1 * np.sin(2 * np.pi * 220 * n) + 0.02 * rng.standard_normal(t),
        0.1 * np.sin(2 * np.pi * 440 * n) + 0.02 * rng.standard_normal(t),
    ]).astype(np.float32)
    save_audio(in_dir / "s.wav", stereo, fs)

    out_dir = tmp_path / "out"
    from open_universe_tpu.bin.enhance import main

    rc = main([str(in_dir), str(out_dir), "--model", str(tiny_ckpt),
               "--chunk-seconds", "0.25", "--n_steps", "2"])
    assert rc == 0
    enh, fs2 = load_audio(out_dir / "s.wav")
    assert fs2 == fs and enh.shape == (2, t)
    assert np.isfinite(enh).all()
    assert not np.array_equal(enh[0], enh[1])
