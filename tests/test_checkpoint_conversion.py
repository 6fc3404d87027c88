"""Checkpoint conversion tests: torch<->jax roundtrip, EMA ordering, loader."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
import torch

from open_universe_tpu.configs.registry import instantiate
from open_universe_tpu.inference.torch_convert import (
    apply_ema_shadow,
    convert_state_dict,
    fold_weight_norm,
    ordered_param_names,
    to_torch_state_dict,
)

TINY_GAN_CFG = {
    "_target_": "open_universe.networks.universe.UniverseGAN",
    "fs": 16000,
    "normalization_norm": 2,
    "normalization_kwargs": {"ref": "both", "level_db": -26.0},
    "edm": {"noise": 0.25},
    "score_model": {
        "_target_": "open_universe.networks.universe.ScoreNetwork",
        "fb_kernel_size": 3, "rate_factors": [2, 4, 4, 5], "n_channels": 4,
        "n_rff": 8, "noise_cond_dim": 32, "extra_conv_block": True,
        "use_weight_norm": True, "use_antialiasing": True,
        "time_embedding": "simple",
    },
    "condition_model": {
        "_target_": "open_universe.networks.universe.ConditionerNetwork",
        "fb_kernel_size": 3, "rate_factors": [2, 4, 4, 5], "n_channels": 4,
        "n_mels": 16, "n_mel_oversample": 4, "encoder_gru_residual": True,
        "extra_conv_block": True, "use_weight_norm": True,
        "use_antialiasing": False,
    },
    "diffusion": {"schedule": "geometric", "sigma_min": 0.0005,
                  "sigma_max": 5.0, "n_steps": 8, "epsilon": 1.3},
    "losses": {
        "multi_period_discriminator": {"mpd_reshapes": [2, 3],
                                       "discriminator_channel_mult": 0.125},
        "multi_resolution_discriminator": {
            "resolutions": [[128, 30, 75], [256, 60, 150], [64, 12, 30]],
            "discriminator_channel_mult": 0.125},
        "weights": {"mel_l1": 45.0, "score": 1.0},
        "use_signal_decoupling": True, "signal_decoupling_act": "snake",
        "score_loss": {"_target_": "torch.nn.MSELoss"},
    },
    "training": {"audio_len": 0.05, "time_sampling": "time_normal_0.95",
                 "ema_decay": 0.999},
    "validation": {"main_loss": "val/pesq", "main_loss_mode": "max",
                   "n_bins": 5, "max_enh_batches": 4, "enh_losses": {}},
}


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], path + "." + k)
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-6,
                err_msg=path + "." + k)


def test_instantiate_from_reference_config():
    model = instantiate(TINY_GAN_CFG)
    assert model.with_edm
    assert model.signal_decoupling_layer is not None
    assert model.tot_ds == 160


def test_roundtrip_torch_conversion():
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)

    # torch-layout sanity: conv1d weight is (Cout, Cin, K)
    w = sd["condition_model.input_conv.weight_v"]
    assert w.shape == (4, 1, 3)
    assert any(k.startswith("_edm_model.") for k in sd)

    params2, skipped = convert_state_dict(model, sd)
    assert not [k for k in skipped if "mel_spec" not in k]
    _tree_equal(params, params2)


def test_fold_weight_norm_preserves_forward():
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (1, 480, 1)) * 0.1
    conds_ref = model.condition_model(params["condition_model"], mix,
                                      train=False)
    import copy

    folded = fold_weight_norm(model, copy.deepcopy(
        jax.tree_util.tree_map(np.asarray, params)))
    folded = jax.tree_util.tree_map(jnp.asarray, folded)
    conds_fold = model.condition_model(folded["condition_model"], mix,
                                       train=False)
    for a, b in zip(conds_ref, conds_fold):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ema_shadow_ordering():
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)
    names = ordered_param_names(
        sd, ["_edm_model", "condition_model", "signal_decoupling_layer"])
    # shadows = params + 1, in model_parameters() order
    shadows = [np.asarray(sd[n]) + 1.0 for n in names]
    params2, _ = convert_state_dict(model, sd)
    params2 = apply_ema_shadow(model, params2, sd, shadows,
                               ["_edm_model", "condition_model",
                                "signal_decoupling_layer"])
    # every model param moved by exactly +1 (in torch layout, so compare
    # through a second export)
    sd2 = to_torch_state_dict(model, params2, edm=True)
    for n in names:
        np.testing.assert_allclose(sd2[n], np.asarray(sd[n]) + 1.0, atol=1e-5,
                                   err_msg=n)
    # discriminator params untouched
    disc_keys = [k for k in sd if k.startswith("loss_mpd.")]
    for k in disc_keys[:3]:
        np.testing.assert_allclose(sd2[k], sd[k], atol=1e-6)


def test_load_model_from_lightning_ckpt(tmp_path):
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)
    t_sd = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    names = ordered_param_names(
        sd, ["_edm_model", "condition_model", "signal_decoupling_layer"])
    ema = {"shadow_params": [t_sd[n].clone() * 0.5 for n in names],
           "decay": 0.999, "num_updates": 100}
    torch.save({"state_dict": t_sd, "ema": ema}, tmp_path / "weights.ckpt")
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump({"model": TINY_GAN_CFG}, f)

    from open_universe_tpu.inference.model_loader import load_model

    model2, params2 = load_model(str(tmp_path / "weights.ckpt"))
    est = model2.enhance(params2, jnp.zeros((1, 320)) + 0.01,
                         key=jax.random.key(0), n_steps=2)
    assert est.shape == (1, 320)
    assert np.isfinite(np.asarray(est)).all()


def test_export_torch_roundtrip_from_trainer_run(tmp_path):
    """bin/export_torch: a Trainer-saved orbax run exports to a
    reference-layout torch .ckpt (best/last selection via model_loader), and
    load_model on the export reproduces the run's enhance() output."""
    from open_universe_tpu.bin.export_torch import main as export_main
    from open_universe_tpu.inference.model_loader import load_model
    from open_universe_tpu.parallel.mesh import make_mesh
    from open_universe_tpu.train.trainer import Trainer

    model = instantiate(TINY_GAN_CFG)
    run = tmp_path / "run"
    trainer = Trainer(model, None, run, max_steps=1, seed=0,
                      mesh=make_mesh(dp=1), config={"model": TINY_GAN_CFG})
    trainer.save(0)
    trainer._wait_for_saves()

    out_ckpt = tmp_path / "export" / "weights.ckpt"
    rc = export_main([str(run), str(out_ckpt)])
    assert rc == 0
    assert out_ckpt.exists()
    assert (out_ckpt.parent / "config.yaml").exists()

    mix = np.asarray(
        jax.random.normal(jax.random.key(1), (1, 800)) * 0.1, np.float32)
    key = jax.random.key(2)

    m_run, p_run = load_model(str(run))           # orbax run dir
    m_exp, p_exp = load_model(str(out_ckpt))      # exported torch ckpt
    out_run = np.asarray(m_run.enhance(p_run, jnp.asarray(mix), key=key,
                                       n_steps=2))
    out_exp = np.asarray(m_exp.enhance(p_exp, jnp.asarray(mix), key=key,
                                       n_steps=2))
    np.testing.assert_allclose(out_run, out_exp, atol=2e-5)


def test_apply_ema_shadow_lora_nested_keys():
    """apply_ema_shadow resolves the reference LoRA nesting — a wrapped
    layer's params live under <path>.conv / <path>.linear in the torch
    state_dict — the same way convert_state_dict does.  EMA-bearing LoRA
    fine-tune checkpoints used to crash here with 'no module at ...conv'."""
    from open_universe_tpu.inference.torch_convert import apply_ema_shadow

    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    sd = to_torch_state_dict(model, params, edm=True)
    key = next(k for k in sd
               if k.startswith("_edm_model.") and k.endswith("conv.weight")
               and k.replace(".weight", ".weight_g") not in sd)
    nested = key.replace(".weight", ".conv.weight")
    sd[nested] = sd.pop(key)

    params2, _ = convert_state_dict(model, sd)
    shadow = [np.full_like(np.asarray(sd[nested]), 7.0)]
    out = apply_ema_shadow(model, params2, {nested: sd[nested]}, shadow,
                           ["_edm_model"])
    node = out
    for part in nested.replace("_edm_model.", "score_model.").split(".")[:-1]:
        node = node[part]
    assert np.all(np.asarray(node["weight"]) == 7.0)
