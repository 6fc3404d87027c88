"""Universe model tests: losses, time sampling, and the analytic-score sampler.

The fake-score sampler test reuses the reference's diffusion probe idea
(universe.py:278-298): with a near-perfect analytic score the sampler must
reconstruct the (normalized) target regardless of network quality.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from open_universe_tpu.models.condition import ConditionerNetwork
from open_universe_tpu.models.score import ScoreNetwork
from open_universe_tpu.models.universe import Universe

RATES = [2, 4, 4, 5]
NCH = 4
FS = 16000
T = 1600  # 0.1 s


def _make_universe(edm=None, weights=None, **kw):
    score = ScoreNetwork(rate_factors=RATES, n_channels=NCH, noise_cond_dim=32,
                         extra_conv_block=True)
    cond = ConditionerNetwork(rate_factors=RATES, n_channels=NCH, n_mels=16,
                              n_mel_oversample=4, encoder_gru_residual=True,
                              extra_conv_block=True)
    return Universe(
        fs=FS,
        score_model=score,
        condition_model=cond,
        losses={"weights": weights or {"score": 1.0, "signal": 1.0, "latent": 1.0},
                "mdn_n_comp": 2, "mdn_alpha_per_sample": True},
        training={"audio_len": T / FS, "time_sampling": "time_uniform",
                  "ema_decay": 0.999},
        normalization_kwargs={"ref": "both", "level_db": -26.0},
        edm=edm,
        **kw,
    )


def test_training_losses_finite():
    model = _make_universe()
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, T, 1)) * 0.1
    target = mix * 0.5
    loss, metrics = model.training_losses(params, jax.random.key(2), mix, target)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"train/loss", "train/score", "train/signal",
                            "train/latent", "train/time_mean"}
    for v in metrics.values():
        assert np.isfinite(float(v))


def test_training_losses_grad():
    model = _make_universe()
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, T, 1)) * 0.1
    target = mix * 0.5

    def loss_fn(p):
        return model.training_losses(p, jax.random.key(2), mix, target)[0]

    grads = jax.grad(loss_fn)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_edm_parameterization():
    model = _make_universe(edm={"noise": 0.25},
                           weights={"score": 1.0, "signal": 0.0, "latent": 0.0})
    params = model.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, T, 1))
    cond_net = model.condition_model
    conds = cond_net(params["condition_model"], x, train=False)
    sigma = jnp.full((2,), 0.3)
    s, est = model.score(params, x, sigma, conds, with_speech_est=True)
    # score and speech estimate are consistent: est = x + sigma^2 * score
    np.testing.assert_allclose(
        np.asarray(x + sigma[:, None, None] ** 2 * s), np.asarray(est),
        atol=1e-4)


@pytest.mark.parametrize("mode", [
    "time_uniform", "sigma_linear", "diffsym", "time_discrete",
    "time_normal_0.95", "adaptive",
])
def test_sample_sigma_modes(mode):
    model = _make_universe()
    kwargs = {}
    if mode == "adaptive":
        kwargs = {"pr_cum": jnp.array([0.0, 0.2, 0.5, 0.8, 0.9, 1.0 + 1e-5]),
                  "bins": jnp.linspace(0.0, 1.0, 6)}
    sigma, time = model.sample_sigma(jax.random.key(0), 512, mode, **kwargs)
    s, t = np.asarray(sigma), np.asarray(time)
    assert s.shape == (512,)
    assert (t >= 0).all() and (t <= 1).all()
    assert (s >= model.diff_kwargs["sigma_min"] - 1e-6).all()
    assert (s <= model.diff_kwargs["sigma_max"] + 1e-6).all()


def test_enhance_fake_score_reconstructs_target():
    """With a near-perfect analytic score, enhance() must recover the target."""
    model = _make_universe()
    params = model.init(jax.random.key(0))
    t = 5 * 160
    key = jax.random.key(3)
    clean = jnp.sin(2 * jnp.pi * 220.0 * jnp.arange(t) / FS)[None, :, None] * 0.05
    noise = jax.random.normal(key, (1, t, 1)) * 0.02
    mix = clean + noise

    est = model.enhance(params, mix, key=jax.random.key(4), n_steps=16,
                        target=clean, fake_score_snr=80.0)
    # compare against the normalized target (enhance outputs normalized scale)
    (mix_n, clean_n), *_ = model.normalize_batch((model.pad(mix)[0],
                                                  model.pad(clean)[0]))
    clean_n = model.unpad(clean_n, model.pad(mix)[1])
    err = np.linalg.norm(np.asarray(est - clean_n)) / np.linalg.norm(
        np.asarray(clean_n))
    assert err < 0.05, f"relative error {err}"


def test_enhance_shapes_and_ensemble():
    model = _make_universe()
    params = model.init(jax.random.key(0))
    t = 3 * 160 + 17  # non-multiple length
    mix = jax.random.normal(jax.random.key(1), (2, t)) * 0.1
    est = model.enhance(params, mix, key=jax.random.key(2), n_steps=2)
    assert est.shape == (2, t)

    est3 = model.enhance(params, mix, key=jax.random.key(2), n_steps=2,
                         ensemble=3, ensemble_stat="median")
    assert est3.shape == (2, t)

    est_aux = model.enhance(params, mix, key=jax.random.key(2),
                            use_aux_signal=True)
    # aux signal has n_channels channels before decoupling; plain Universe
    # returns it unchanged -> shape (B, T, NCH) reduced to (B, T) is invalid,
    # so just check it runs and is finite
    assert np.isfinite(np.asarray(est_aux)).all()


def test_enhance_warm_start():
    # warm start feeds the aux signal into the score net, so the conditioner
    # must emit a 1-channel estimate (as in the GAN variant's decoupling path)
    score = ScoreNetwork(rate_factors=RATES, n_channels=NCH, noise_cond_dim=32,
                         extra_conv_block=True)
    cond = ConditionerNetwork(rate_factors=RATES, n_channels=NCH, n_mels=16,
                              n_mel_oversample=4, extra_conv_block=True,
                              output_channels=1)
    model = Universe(fs=FS, score_model=score, condition_model=cond,
                     losses={"weights": {"score": 1.0, "signal": 0.0,
                                         "latent": 0.0}},
                     training={"audio_len": T / FS})
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (1, 480)) * 0.1
    est = model.enhance(params, mix, key=jax.random.key(2), n_steps=4,
                        warm_start=2)
    assert est.shape == (1, 480)


def test_enhance_bf16_compute_dtype():
    model = _make_universe()
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, 480)) * 0.1
    o32 = model.enhance(params, mix, key=jax.random.key(2), n_steps=2)
    o16 = model.enhance(params, mix, key=jax.random.key(2), n_steps=2,
                        compute_dtype=jnp.bfloat16)
    assert o16.dtype == jnp.float32
    err = float(jnp.linalg.norm(o32 - o16) / jnp.linalg.norm(o32))
    assert err < 0.1, err


def test_edm_fast_path_matches_generic_wrapper():
    """The algebraically-folded EDM sampler loop must reproduce the generic
    score()-wrapper loop sample-for-sample (same keys, same schedule)."""
    model = _make_universe(edm={"noise": 0.25}, weights={"score": 1.0})
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, T)) * 0.05
    for kw in ({}, {"n_steps": 6}, {"compute_dtype": jnp.bfloat16}):
        key = jax.random.key(7)
        kw = {"n_steps": 4, **kw}
        fast = np.asarray(model.enhance(params, mix, key=key, **kw))
        model._disable_edm_fast = True
        try:
            ref = np.asarray(model.enhance(params, mix, key=key, **kw))
        finally:
            model._disable_edm_fast = False
        # bf16: the fast path does the EDM scalar algebra in f32 (the
        # generic wrapper computes speech_est/score in bf16), so the two
        # legitimately differ at bf16 resolution amplified over the steps
        tol = 0.15 if kw.get("compute_dtype") is not None else 2e-5
        err = np.abs(fast - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < tol, (kw, err)


def test_with_noise_target_training_losses_finite():
    """with_noise_target=True: the 2-channel aux target flows through the
    per-channel mel path (condition.py compute_mel_spec 4-D output) and the
    MDN channel-major flatten (reference universe.py:485-516, mdn.py:107).
    Regression: the mel adapter used to flatten channels into time, which
    crashed the latent loss at trace time."""
    model = _make_universe(with_noise_target=True)
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, T, 1)) * 0.1
    target = jax.random.normal(jax.random.key(2), (2, T, 1)) * 0.1
    loss, metrics = model.training_losses(params, jax.random.key(3), mix,
                                          target)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["train/latent"]))
    assert np.isfinite(float(metrics["train/signal"]))

    # the 4-D fold is exactly the reference's channel-major flatten:
    # torch (B, C, M, F).flatten(1, -2)[b, c*M+m, f] == ours
    # (B, C, F, M) -> (B, F, C*M)[b, f, c*M+m]
    x = np.arange(2 * 3 * 5 * 4).reshape(2, 3, 5, 4).astype(np.float32)
    ours = np.transpose(x, (0, 2, 1, 3)).reshape(2, 5, 3 * 4)
    torch_flat = x.transpose(0, 1, 3, 2).reshape(2, 3 * 4, 5)  # (B, C*M, F)
    np.testing.assert_array_equal(ours, torch_flat.transpose(0, 2, 1))


def test_mdn_blowup_keeps_grads_finite():
    """Regression for the where-NaN-grad trap: a diverged MDN head (huge
    mean, tiny sigma) used to push the NLL to inf and its backward to NaN,
    poisoning ALL gradients despite the where-based loss skip.  The head is
    now bounded (mdn.py clip) so loss and grads stay finite; the reference
    handles this with an eager per-step isnan check (universe.py:531-539)
    that has no jit analog."""
    model = _make_universe(weights={"score": 1.0, "signal": 1.0,
                                    "latent": 0.0})
    params = model.init(jax.random.key(0))
    # bias layout (3, n_comp, tgt): first third mean, second sigma (elu2)
    bias = np.array([1e30, 1e30, -1e30, -1e30, 0.0, 0.0], np.float32)
    params["loss_signal"]["conv"]["conv"]["bias"] = jnp.asarray(bias)

    mix = jax.random.normal(jax.random.key(1), (2, T, 1)) * 0.1
    target = jax.random.normal(jax.random.key(2), (2, T, 1)) * 0.1

    def loss_fn(p):
        loss, metrics = model.training_losses(p, jax.random.key(3), mix,
                                              target)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    bad = [np.asarray(g) for g in jax.tree.leaves(grads)
           if not np.isfinite(np.asarray(g)).all()]
    assert not bad, f"{len(bad)} non-finite grad leaves"


def test_finite_or_skip_blocks_nan_gradients():
    """finite_or_skip (models/universe.py): a plain where on a non-finite
    loss still back-propagates NaN — the zero cotangent multiplies the
    inf/NaN partials saved from the bad forward.  The double-where recompute
    keeps both the value and every gradient finite, and is the identity on
    the finite path."""
    from open_universe_tpu.models.universe import finite_or_skip

    def loss_fn(e):  # NaN value AND NaN partials for e < -1
        return jnp.sum(jnp.sqrt(e + 1.0))

    bad_est = -2.0 * jnp.ones(4)

    def plain_where(e):
        raw = loss_fn(e)
        return jnp.where(jnp.isnan(raw), 0.0, raw)

    _, g_plain = jax.value_and_grad(plain_where)(bad_est)
    assert not np.isfinite(np.asarray(g_plain)).all()  # the trap is real

    def guarded(e):
        term, _ = finite_or_skip(loss_fn, e)
        return term

    v, g = jax.value_and_grad(guarded)(bad_est)
    assert float(v) == 0.0
    np.testing.assert_array_equal(np.asarray(g), np.zeros(4))

    ok_est = jnp.ones(4)
    v_ok, g_ok = jax.value_and_grad(guarded)(ok_est)
    np.testing.assert_allclose(float(v_ok), float(loss_fn(ok_est)))
    assert np.isfinite(np.asarray(g_ok)).all()
    # raw (metrics) value reports the unguarded loss
    _, raw = finite_or_skip(loss_fn, bad_est)
    assert np.isnan(float(raw))


def test_enhance_ensemble_with_target_probe():
    """Regression: enhance(target=..., ensemble=N) crashed for batch > 1 —
    the mix was ensemble-tiled but the fake-score target was not, so
    normalize_batch broadcast (N*B) stats against (B) signals."""
    model = _make_universe()
    params = model.init(jax.random.key(0))
    mix = jax.random.normal(jax.random.key(1), (2, T, 1)) * 0.1
    target = mix * 0.7
    out = model.enhance(params, mix[:, :, 0], key=jax.random.key(2),
                        n_steps=2, target=target[:, :, 0],
                        fake_score_snr=20.0, ensemble=3,
                        ensemble_stat="median")
    assert out.shape == (2, T)
    assert np.isfinite(np.asarray(out)).all()
