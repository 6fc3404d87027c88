"""Training-step tests: score-only loss decreases; GAN step runs; both work
data-parallel over the 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from open_universe_tpu.models.condition import ConditionerNetwork
from open_universe_tpu.models.score import ScoreNetwork
from open_universe_tpu.models.universe import Universe
from open_universe_tpu.models.universe_gan import UniverseGAN
from open_universe_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from open_universe_tpu.train.optim import (
    FixedClipper,
    adamw,
    linear_warmup_cosine_annealing,
)
from open_universe_tpu.train.steps import (
    init_train_state,
    make_gan_train_step,
    make_train_step,
)
from open_universe_tpu.nn.module import buffer_mask

RATES = [2, 4, 4, 5]
NCH = 4
FS = 16000
T = 800  # 0.05 s


def _nets(**kw):
    score = ScoreNetwork(rate_factors=RATES, n_channels=NCH, noise_cond_dim=32,
                         extra_conv_block=True, **kw)
    cond = ConditionerNetwork(rate_factors=RATES, n_channels=NCH, n_mels=16,
                              n_mel_oversample=4, extra_conv_block=True)
    return score, cond


def _batch(key, b=8):
    clean = jax.random.normal(key, (b, T, 1)) * 0.05
    noise = jax.random.normal(jax.random.fold_in(key, 1), (b, T, 1)) * 0.02
    return {"noisy": clean + noise, "clean": clean}


def test_score_train_step_loss_decreases():
    score, cond = _nets()
    model = Universe(fs=FS, score_model=score, condition_model=cond,
                     losses={"weights": {"score": 1.0, "signal": 1.0,
                                         "latent": 1.0}, "mdn_n_comp": 2},
                     training={"audio_len": T / FS, "ema_decay": 0.999,
                               "time_sampling": "time_uniform"},
                     normalization_kwargs={"ref": "both", "level_db": -26.0})
    params = model.init(jax.random.key(0))
    mask = buffer_mask(model, params)
    sched = linear_warmup_cosine_annealing(1e-3, 10, 50, 100, 1e-6)
    tx = adamw(sched, params=params, trainable_mask=mask)
    clipper = FixedClipper(1000.0)
    state = init_train_state(model, params, tx, clipper=clipper)
    step = jax.jit(make_train_step(model, tx, clipper=clipper))

    batch = _batch(jax.random.key(1))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(10 + i))
        losses.append(float(metrics["train/loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # buffer (rff freq) must not have been updated
    np.testing.assert_array_equal(
        np.asarray(state["params"]["score_model"]["sigma_block"].get(
            "freq", np.zeros(1))),
        np.asarray(params["score_model"]["sigma_block"].get(
            "freq", np.zeros(1))))
    assert int(state["ema"]["num_updates"]) == 8


def test_gan_train_step_runs():
    score, cond = _nets(use_weight_norm=True, use_antialiasing=True,
                        time_embedding="simple")
    model = UniverseGAN(
        fs=FS, score_model=score, condition_model=cond,
        losses={
            "multi_period_discriminator": {"mpd_reshapes": [2, 3],
                                           "discriminator_channel_mult": 0.25},
            "multi_resolution_discriminator": {
                "resolutions": [[128, 30, 75], [256, 60, 150], [64, 12, 30]],
                "discriminator_channel_mult": 0.25},
            "weights": {"mel_l1": 45.0, "score": 1.0},
            "use_signal_decoupling": True,
            "signal_decoupling_act": "snake",
            "disc_freeze_step": 0,
        },
        training={"audio_len": T / FS, "time_sampling": "time_normal_0.95",
                  "ema_decay": 0.999},
        normalization_kwargs={"ref": "both", "level_db": -26.0},
        edm={"noise": 0.25},
    )
    params = model.init(jax.random.key(0))
    tx_gen = adamw(2e-4, params={k: params[k] for k in model.model_param_keys()})
    tx_disc = adamw(2e-4, weight_decay=0.0)
    state = init_train_state(model, params, tx_gen, disc_tx=tx_disc)
    step = jax.jit(make_gan_train_step(
        model, tx_gen, tx_disc,
        grad_clip_vals={"mpd": 1000.0, "mrd": 1000.0, "score": 1000.0,
                        "cond": 1000.0}))

    batch = _batch(jax.random.key(1), b=2)
    state, metrics = step(state, batch, jax.random.key(2))
    for k in ("train/loss_disc", "train/loss_gen", "train/score",
              "train/signal_mel", "grad/score", "grad/mpd"):
        assert np.isfinite(float(metrics[k])), k
    # second step: params changed
    state2, metrics2 = step(state, batch, jax.random.key(3))
    assert int(state2["step"]) == 2


def test_data_parallel_train_step_on_mesh():
    mesh = make_mesh(dp=8)
    score, cond = _nets()
    model = Universe(fs=FS, score_model=score, condition_model=cond,
                     losses={"weights": {"score": 1.0, "signal": 0.0,
                                         "latent": 0.0}},
                     training={"audio_len": T / FS, "ema_decay": 0.0},
                     normalization_kwargs={"ref": "both", "level_db": -26.0})
    params = model.init(jax.random.key(0))
    tx = adamw(1e-4, params=params)
    state = init_train_state(model, params, tx)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, _batch(jax.random.key(1), b=16))

    step = jax.jit(make_train_step(model, tx))
    state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["train/loss"]))
    # parameters remain replicated after the update
    leaf = state["params"]["score_model"]["input_conv"]["weight"]
    assert leaf.sharding.is_fully_replicated


def test_paired_discriminator_matches_separate_passes():
    """MPD/MRD run real+fake as one 2B batch; must equal two separate B
    passes exactly (convs are batch-parallel)."""
    from open_universe_tpu.models.discriminators import (
        DiscriminatorP,
        DiscriminatorR,
        _paired_apply,
    )

    cfg = {"discriminator_channel_mult": 0.25}
    key = jax.random.key(0)
    y = jax.random.normal(key, (3, T, 1)) * 0.1
    y_hat = jax.random.normal(jax.random.fold_in(key, 1), (3, T, 1)) * 0.1

    for disc in (DiscriminatorP(cfg, period=3),
                 DiscriminatorR(cfg, resolution=[128, 30, 75])):
        p = disc.init(jax.random.key(7))
        s_r_ref, f_r_ref = disc(p, y)
        s_g_ref, f_g_ref = disc(p, y_hat)
        s_r, s_g, f_r, f_g = _paired_apply(disc, p, y, y_hat)
        np.testing.assert_allclose(s_r, s_r_ref, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(s_g, s_g_ref, rtol=1e-6, atol=1e-6)
        for a, b in zip(f_r, f_r_ref):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
        for a, b in zip(f_g, f_g_ref):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("gan", [False, True])
def test_bf16_training_matches_f32_loosely(gan):
    """training.compute_dtype=bf16 runs the nets in bfloat16 (losses f32);
    the resulting losses must be finite and close-ish to the f32 step."""
    def build(compute_dtype):
        score, cond = _nets(**({"use_weight_norm": True,
                                "time_embedding": "simple"} if gan else {}))
        training = {"audio_len": T / FS, "time_sampling": "time_uniform",
                    "ema_decay": 0.999}
        if compute_dtype:
            training["compute_dtype"] = compute_dtype
        if gan:
            return UniverseGAN(
                fs=FS, score_model=score, condition_model=cond,
                losses={
                    "multi_period_discriminator": {
                        "mpd_reshapes": [2], "discriminator_channel_mult": 0.25},
                    "multi_resolution_discriminator": {
                        "resolutions": [[128, 30, 75], [256, 60, 150],
                                        [64, 12, 30]],
                        "discriminator_channel_mult": 0.25},
                    "weights": {"mel_l1": 45.0, "score": 1.0},
                },
                training=training,
                normalization_kwargs={"ref": "both", "level_db": -26.0},
                edm={"noise": 0.25})
        return Universe(fs=FS, score_model=score, condition_model=cond,
                        losses={"weights": {"score": 1.0, "signal": 1.0,
                                            "latent": 1.0}, "mdn_n_comp": 2},
                        training=training,
                        normalization_kwargs={"ref": "both", "level_db": -26.0})

    batch = _batch(jax.random.key(5), b=4)
    key = jax.random.key(11)
    vals = {}
    for cd in (None, "bf16"):
        model = build(cd)
        params = model.init(jax.random.key(0))
        if gan:
            out = model.generator_forward(
                params, key, batch["noisy"], batch["clean"], batch["clean"])
            assert out["y_est"].dtype == jnp.float32
            vals[cd] = float(jnp.mean(jnp.abs(out["y_est"])))
        else:
            loss, metrics = model.training_losses(
                params, key, batch["noisy"], batch["clean"])
            assert jnp.asarray(loss).dtype == jnp.float32
            vals[cd] = float(metrics["train/score"])
        assert np.isfinite(vals[cd])
    # bf16 nets track the f32 result loosely (random init, small magnitudes)
    assert abs(vals["bf16"] - vals[None]) <= 0.1 * (abs(vals[None]) + 1.0)


def test_nan_guard_rolls_back_update():
    """training.nan_guard=True: a batch that produces a non-finite loss must
    leave parameters/optimizer untouched and raise train/update_skipped."""
    score, cond = _nets()
    model = Universe(fs=FS, score_model=score, condition_model=cond,
                     losses={"weights": {"score": 1.0}},
                     training={"audio_len": T / FS, "ema_decay": 0.999,
                               "time_sampling": "time_uniform",
                               "nan_guard": True},
                     normalization_kwargs={"ref": "both", "level_db": -26.0})
    params = model.init(jax.random.key(0))
    tx = adamw(1e-3, params=params)
    state = init_train_state(model, params, tx)
    step = jax.jit(make_train_step(model, tx))

    good = _batch(jax.random.key(1), b=2)
    state1, m1 = step(state, good, jax.random.key(2))
    assert float(m1["train/update_skipped"]) == 0.0
    leaf0 = np.asarray(state1["params"]["score_model"]["input_conv"]["weight"])

    bad = {k: v.at[0, 0, 0].set(jnp.nan) for k, v in good.items()}
    state2, m2 = step(state1, bad, jax.random.key(3))
    assert float(m2["train/update_skipped"]) == 1.0
    leaf2 = np.asarray(state2["params"]["score_model"]["input_conv"]["weight"])
    np.testing.assert_array_equal(leaf0, leaf2)
    assert int(state2["step"]) == int(state1["step"]) + 1
    # a following good batch trains normally again
    state3, m3 = step(state2, good, jax.random.key(4))
    assert float(m3["train/update_skipped"]) == 0.0


def test_frozen_disc_step_matches_full_step():
    """The disc-freeze-phase step function (disc_frozen=True, no MPD/MRD
    compute at all) produces the same generator update and untouched
    discriminator state as the full step where-gating the adversarial terms
    off — at half-ish the cost (the disc convs are the step's compute
    floor)."""
    score, cond = _nets(use_weight_norm=True, use_antialiasing=True,
                        time_embedding="simple")
    model = UniverseGAN(
        fs=FS, score_model=score, condition_model=cond,
        losses={
            "multi_period_discriminator": {"mpd_reshapes": [2, 3],
                                           "discriminator_channel_mult": 0.25},
            "multi_resolution_discriminator": {
                "resolutions": [[128, 30, 75], [256, 60, 150], [64, 12, 30]],
                "discriminator_channel_mult": 0.25},
            "weights": {"mel_l1": 45.0, "score": 1.0},
            "use_signal_decoupling": True,
            "signal_decoupling_act": "snake",
            "disc_freeze_step": 100,  # both steps run in the frozen phase
        },
        training={"audio_len": T / FS, "time_sampling": "time_normal_0.95",
                  "ema_decay": 0.999},
        normalization_kwargs={"ref": "both", "level_db": -26.0},
        edm={"noise": 0.25},
    )
    params = model.init(jax.random.key(0))
    tx_gen = adamw(2e-4,
                   params={k: params[k] for k in model.model_param_keys()})
    tx_disc = adamw(2e-4, weight_decay=0.0)
    state = init_train_state(model, params, tx_gen, disc_tx=tx_disc)
    batch = _batch(jax.random.key(1), b=2)
    key = jax.random.key(2)

    full = jax.jit(make_gan_train_step(model, tx_gen, tx_disc))
    frozen = jax.jit(make_gan_train_step(model, tx_gen, tx_disc,
                                         disc_frozen=True))
    s_full, m_full = full(jax.tree.map(jnp.copy, state), batch, key)
    s_frozen, m_frozen = frozen(state, batch, key)

    # generator updates identical (adversarial grads are exactly zero in the
    # gated full step); discriminator params untouched in both.  The two
    # graphs fuse differently, so allow a few f32 ulps of rounding skew
    # (observed flake: 1/12288 leaves off by 1.2e-8 abs) — a real
    # adversarial-grad leak moves params by >=1e-4.
    for k in model.model_param_keys():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-7),
            s_full["params"][k], s_frozen["params"][k])
    for k in model.disc_param_keys():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            s_frozen["params"][k], params[k])
    np.testing.assert_allclose(float(m_full["train/loss_gen"]),
                               float(m_frozen["train/loss_gen"]), rtol=1e-6)
    assert "train/loss_disc" not in m_frozen  # no disc compute at all


def test_gan_scheduler_units_horizon_derivation():
    """gan_scheduler_units must invert the trainer's LR choreography: a
    horizon derived for a TRAIN-step target makes the schedule event land
    at that train step even across a disc-freeze phase (the r4c/r4d soaks
    hand-converted with a flat 2x and started their cosine 12.5k train
    steps late — notes/soak_r4c, VERDICT r4 Weak #6)."""
    from open_universe_tpu.train.optim import gan_scheduler_units as units
    from open_universe_tpu.train.trainer import _build_schedule

    # the raw mapping
    assert units(0, 0) == 0 and units(7, 0) == 14          # no freeze: 2x
    assert units(10, 25) == 10 and units(25, 25) == 25     # frozen: 1x
    assert units(30, 25) == 35 and units(50, 25) == 75     # past: 1x then 2x

    # composition with the trainer's generator schedule: derive horizons
    # for warmup@2k / cosine@9k / max@15k with a 5k freeze, then check the
    # LR curve realizes exactly that shape in TRAIN steps.
    F, w_s, c_s, m_s = 5_000, 2_000, 9_000, 15_000
    base, eta = 1e-3, 1e-6
    cfg = {"scheduler": {"T_warmup": units(w_s, F), "T_cosine": units(c_s, F),
                         "T_max": units(m_s, F), "eta_min": eta}}
    gen = _build_schedule(cfg, base, m_s, gan_role="generator", freeze_step=F)
    lr = lambda i: float(gen(jnp.asarray(i)))
    assert lr(w_s // 2) == pytest.approx(base / 2, rel=0.01)  # mid-warmup
    assert lr(w_s + 10) == pytest.approx(base, rel=1e-6)      # warmup done
    assert lr(c_s - 5) == pytest.approx(base, rel=1e-6)       # still flat
    assert lr(c_s + 100) < base - 1e-7                        # cosine began
    assert lr(c_s + 1000) < 0.99 * base                       # and is moving
    assert lr((c_s + m_s) // 2) == pytest.approx(
        (base + eta) / 2, rel=0.02)                           # half-decayed
    assert lr(m_s) == pytest.approx(eta, abs=1e-8)            # floor at end
    assert lr(m_s + 500) == pytest.approx(eta, abs=1e-8)      # clamped past

    # the discriminator schedule (update count d maps to train step F + d)
    disc = _build_schedule(cfg, base, m_s, gan_role="discriminator",
                           freeze_step=F)
    dlr = lambda i: float(disc(jnp.asarray(i - F)))
    assert dlr(c_s - 5) == pytest.approx(base, rel=1e-6)
    assert dlr(m_s) == pytest.approx(eta, abs=1e-8)

    # the buggy hand-conversion (flat 2x despite the freeze) starts the
    # cosine measurably late — this is the regression the helper prevents
    bad = {"scheduler": {"T_warmup": 2 * w_s, "T_cosine": 2 * c_s,
                         "T_max": 2 * m_s, "eta_min": eta}}
    gen_bad = _build_schedule(bad, base, m_s, gan_role="generator",
                              freeze_step=F)
    assert float(gen_bad(jnp.asarray(c_s + 100))) == pytest.approx(
        base, rel=1e-6)  # still flat where the cosine was MEANT to start
