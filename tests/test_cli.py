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
