"""Offline dry-run of the quality-parity harness (bin/parity.py):
synthetic torch checkpoint -> enhance tree -> metrics -> delta report.
When real weights/network are available the identical command performs the
north-star check against the reference README table."""
import json

import numpy as np
import pytest
import yaml

import jax
import torch

from open_universe_tpu.bin.parity import (
    REFERENCE_RESULTS,
    build_report,
    format_table,
    main as parity_main,
)
from open_universe_tpu.configs.registry import instantiate
from open_universe_tpu.data.audio import save_audio
from open_universe_tpu.inference.torch_convert import to_torch_state_dict

from test_checkpoint_conversion import TINY_GAN_CFG


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity_ckpt")
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)
    t_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    torch.save({"state_dict": t_sd}, tmp / "weights.ckpt")
    with open(tmp / "config.yaml", "w") as f:
        yaml.safe_dump({"model": TINY_GAN_CFG}, f)
    return tmp / "weights.ckpt"


def test_parity_end_to_end(tmp_path, tiny_ckpt, rng):
    fs = 16000
    noisy_dir = tmp_path / "noisy"
    clean_dir = tmp_path / "clean"
    noisy_dir.mkdir()
    clean_dir.mkdir()
    for i in range(3):
        t = int(0.4 * fs)
        clean = (0.1 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(t) / fs)
                 ).astype(np.float32)
        noisy = clean + 0.05 * rng.standard_normal(t).astype(np.float32)
        save_audio(clean_dir / f"p{i}.wav", clean, fs)
        save_audio(noisy_dir / f"p{i}.wav", noisy, fs)

    out = tmp_path / "run"
    rc = parity_main(["--model", str(tiny_ckpt),
                      "--noisy-dir", str(noisy_dir),
                      "--clean-dir", str(clean_dir),
                      "--output", str(out),
                      "--metrics", "si-sdr", "lsd",
                      "--n-steps", "2", "--limit", "2",
                      "--bucket-seconds", "0.5"])
    assert rc == 0
    with open(out / "parity_report.json") as f:
        report = json.load(f)
    assert report["n_files"] == 2
    assert {r["metric"] for r in report["rows"]} == {"si-sdr", "lsd"}
    for row in report["rows"]:
        assert np.isfinite(row["ours"])
        assert "delta" in row and "better" in row
    # a random tiny model cannot reach published quality
    assert report["parity"] is False
    # enhanced tree was produced for only the --limit'ed subset
    assert len(list((out / "enhanced").rglob("*.wav"))) == 2


def test_build_report_delta_direction():
    summary = {"number": 2, "si-sdr": 19.0, "lsd": 5.0}
    rep = build_report(summary, REFERENCE_RESULTS["plusplus"],
                       ["si-sdr", "lsd"])
    rows = {r["metric"]: r for r in rep["rows"]}
    assert rows["si-sdr"]["better"] is True       # higher si-sdr is better
    assert rows["lsd"]["better"] is False         # higher lsd is worse
    assert rep["parity"] is False
    txt = format_table(rep)
    assert "si-sdr" in txt and "+0.376" in txt


def test_build_report_missing_metric():
    rep = build_report({"number": 1, "si-sdr": 1.0}, {"si-sdr": 18.0},
                       ["si-sdr", "pesq-wb"])
    rows = {r["metric"]: r for r in rep["rows"]}
    assert rows["pesq-wb"]["ours"] is None
    assert "delta" not in rows["pesq-wb"]


def test_build_report_no_compared_metrics_is_not_parity():
    """An all-failed metric pass (every row ours=None) must not report
    parity=true — all([]) on the empty comparison set was a false green
    light for the north-star check."""
    rep = build_report({"number": 3}, REFERENCE_RESULTS["plusplus"],
                       ["si-sdr", "pesq-wb"])
    assert rep["parity"] is False
    assert rep["n_compared"] == 0


def test_hf_hub_path_from_local_fixture(tiny_ckpt, monkeypatch, rng):
    """The hour network exists, ``--model line-corporation/open-universe:
    plusplus`` must work first try.  Pre-flight the whole HF branch of
    load_model (repo:rev parsing -> hf_hub_download calls -> ckpt+config
    ingest -> enhance) against a fake huggingface_hub serving the tiny
    local fixture (reference model_loader.py:62-137)."""
    import sys
    import types

    import jax.numpy as jnp

    from open_universe_tpu.inference import model_loader

    calls = []

    def fake_download(repo_id, filename, revision=None):
        calls.append((repo_id, filename, revision))
        path = tiny_ckpt.parent / filename
        assert path.exists(), filename
        return str(path)

    fake_hub = types.ModuleType("huggingface_hub")
    fake_hub.hf_hub_download = fake_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake_hub)

    model, params = model_loader.load_model(
        "line-corporation/open-universe:plusplus")
    assert calls == [
        ("line-corporation/open-universe", "weights.ckpt", "plusplus"),
        ("line-corporation/open-universe", "config.yaml", "plusplus"),
    ]
    mix = jnp.asarray(0.1 * rng.standard_normal(1600).astype(np.float32))
    out = model.enhance(params, mix, n_steps=2)
    assert np.all(np.isfinite(np.asarray(out)))

    # no revision: rev=None reaches the hub default
    calls.clear()
    model_loader.load_model("line-corporation/open-universe")
    assert calls[0] == ("line-corporation/open-universe", "weights.ckpt",
                        None)
