"""LoRA tests: injection identity, training updates only adapters, merge."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.configs.registry import instantiate
from open_universe_tpu.models.universe_lora import UniverseLoRA
from open_universe_tpu.nn import lora as lora_lib
from open_universe_tpu.nn.layers import Conv1d

from test_checkpoint_conversion import TINY_GAN_CFG


def _base():
    model = instantiate(TINY_GAN_CFG)
    params = model.init(jax.random.key(0))
    from open_universe_tpu.inference.torch_convert import fold_weight_norm

    params = fold_weight_norm(model, jax.tree_util.tree_map(np.asarray, params))
    return model, jax.tree_util.tree_map(jnp.asarray, params)


def test_lora_inject_is_identity_at_init():
    conv = Conv1d(8, 16, 3, padding="same")
    p = conv.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 20, 8))
    y0 = conv(p, x)
    p_lora = lora_lib.inject(conv, p, rank=4, alpha=2.0)
    assert "lora_weight_a" in p_lora and "conv" in p_lora
    y1 = conv(p_lora, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)

    # non-zero A changes the output; merge-remove reproduces it exactly
    p_lora["lora_weight_a"] = jnp.ones_like(p_lora["lora_weight_a"]) * 0.1
    y2 = conv(p_lora, x)
    assert not np.allclose(np.asarray(y0), np.asarray(y2))
    p_merged = lora_lib.remove(conv, p_lora)
    assert "lora_weight_a" not in p_merged
    y3 = conv(p_merged, x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y3), atol=1e-5)


def test_universe_lora_training_updates_only_adapters():
    model, base_params = _base()
    lora_model = UniverseLoRA(
        model=model, fs=16000, base_params=base_params,
        losses={"multires_l1": {
            "weight": 0.1,
            "kwargs": {"_target_": "open_universe_tpu.losses.MultiResL1SpecLoss",
                       "window_sz": [256], "time_domain_weight": 0.0}}},
        training={"audio_len": 0.05, "ema_decay": 0.0},
        diffusion={"n_steps": 3, "epsilon": 1.3},
        n_steps_backprop=2, lora_rank=2, lora_alpha=4.0,
        use_hifigan_loss=True, weight_hifigan_loss=0.01,
    )
    params = lora_model.init(jax.random.key(0))
    mask = lora_model.trainable_mask(params)
    leaves_mask = jax.tree_util.tree_leaves(mask)
    assert any(leaves_mask) and not all(leaves_mask)

    mix = jax.random.normal(jax.random.key(1), (2, 800, 1)) * 0.1
    target = mix * 0.7

    def loss_fn(p):
        return lora_model.training_losses(p, jax.random.key(2), mix, target)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # gradients reach the adapters
    ga = grads["model"]["score_model"]["input_conv"]
    # input_conv of score model isn't weight-normed in TINY cfg? it is plain conv
    # check some lora grad is non-zero somewhere in the tree
    lora_gs = [np.abs(np.asarray(v)).sum()
               for path, v in _iter_leaves(grads)
               if "lora_weight_a" in path]
    assert lora_gs and sum(lora_gs) > 0
    # frozen weights receive zero updates through the optimizer mask
    from open_universe_tpu.train.optim import adamw

    tx = adamw(1e-3, weight_decay=0.0, params=params, trainable_mask=mask)
    opt_state = tx.init(params)
    updates, _ = tx.update(grads, opt_state, params)
    for path, v in _iter_leaves(updates):
        leaf = path.rsplit(".", 1)[-1]
        if "lora_" in leaf or "bias" in leaf:
            continue
        assert np.all(np.asarray(v) == 0), path


def _iter_leaves(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaves(v, prefix + "." + k)
    else:
        yield prefix, tree


def test_universe_lora_partial_diffusion():
    model, base_params = _base()
    lora_model = UniverseLoRA(
        model=model, fs=16000, base_params=base_params,
        losses={}, training={"audio_len": 0.05},
        diffusion={"n_steps": 3, "epsilon": 1.3},
        n_steps_backprop=1, lora_rank=2,
        use_partial_diffusion=True,
    )
    params = lora_model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, 800)) * 0.1
    out = lora_model.forward(params, mix, key=jax.random.key(2))
    assert out.shape == (2, 800)
    assert np.isfinite(np.asarray(out)).all()


def test_universe_lora_merge_matches_adapter_forward():
    model, base_params = _base()
    lora_model = UniverseLoRA(
        model=model, fs=16000, base_params=base_params, losses={},
        training={"audio_len": 0.05}, diffusion={"n_steps": 2},
        lora_rank=2, use_hifigan_loss=False)
    params = lora_model.init(jax.random.key(0))

    # perturb the adapters so the merge is non-trivial
    def bump(tree):
        if isinstance(tree, dict):
            return {k: (v * 0 + 0.05 if k == "lora_weight_a" else bump(v))
                    for k, v in tree.items()}
        return tree

    params = bump(params)
    mix = jax.random.normal(jax.random.key(1), (1, 480)) * 0.1
    out_adapter = lora_model.enhance(params, mix, key=jax.random.key(3),
                                     n_steps=2)
    merged = lora_model.merge_lora(params)
    out_merged = model.enhance(merged, mix, key=jax.random.key(3), n_steps=2)
    np.testing.assert_allclose(np.asarray(out_adapter), np.asarray(out_merged),
                               atol=1e-4)


def test_make_train_step_with_lora_and_null_loss():
    """Regression: the generic train step passes pr_cum/bins only to models
    whose training_losses accepts them (UniverseLoRA's does not — found by
    the on-chip LoRA fine-tune run), and a ``<name>: null`` losses entry
    disables that loss instead of crashing (the CLI analog of hydra's
    ``~model.losses.<name>`` deletion)."""
    import optax

    from open_universe_tpu.train.steps import make_train_step

    model, base_params = _base()
    lora_model = UniverseLoRA(
        model=model, fs=16000, base_params=base_params,
        losses={"multires_l1": {
            "weight": 0.1,
            "kwargs": {"_target_": "open_universe_tpu.losses.MultiResL1SpecLoss",
                       "window_sz": [256], "time_domain_weight": 0.0}},
                "phonemeloss": None},  # e.g. HF-gated loss disabled offline
        training={"audio_len": 0.05, "ema_decay": 0.0},
        diffusion={"n_steps": 2, "epsilon": 1.3},
        n_steps_backprop=1, lora_rank=2, lora_alpha=4.0,
    )
    assert "phonemeloss" not in lora_model.losses_func
    params = lora_model.init(jax.random.key(0))
    tx = optax.adam(1e-4)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32)}
    step = make_train_step(lora_model, tx)
    batch = {
        "noisy": jax.random.normal(jax.random.key(1), (2, 800, 1)) * 0.1,
        "clean": jax.random.normal(jax.random.key(2), (2, 800, 1)) * 0.1,
    }
    # both call shapes must work: no adaptive dict, and one passed by the
    # Trainer (ignored by models without adaptive time sampling)
    adaptive = {"pr_cum": jnp.linspace(0.2, 1.0, 5), "bins": jnp.linspace(0, 1, 6)}
    for adapt in (None, adaptive):
        new_state, metrics = step(state, batch, jax.random.key(3), adapt)
        assert np.isfinite(float(metrics["train/main_loss"]))
