"""Full-network golden parity against the ACTUAL reference torch code.

These tests import the reference implementation from /root/reference (via
tests/ref_loader.py + tests/ref_shims/), build the real UNIVERSE/UNIVERSE++
models from the real reference YAML configs, convert their randomly
initialized state dicts through ``inference/torch_convert.py``, and assert
forward parity of the assembled networks and the full ``enhance()`` sampler.

This is the proof that checkpoint ingestion is composition-exact: any drift
in skip ordering, FiLM placement, st_conv summation, MelAdapter frame
alignment, ConvTranspose length trim, EMA shadow ordering, or sampler
coefficients fails here.  (Reference anchors: score.py:277-297,
condition.py:346-377, universe.py:231-375, gan.py:103-284.)
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ref_loader import load_reference, reference_model_config

import open_universe_tpu.models.universe as myuni
from open_universe_tpu.configs.registry import instantiate as my_instantiate
from open_universe_tpu.inference.model_loader import jax_tree_asarray
from open_universe_tpu.inference.torch_convert import (
    apply_ema_shadow,
    convert_state_dict,
    fold_weight_norm,
)

B, T = 2, 8000  # 0.5 s @16 kHz; multiple of tot_ds=160


class Pair:
    """A reference torch model and the converted JAX model + params."""

    def __init__(self, config_name, seed, overrides=None):
        self.ref = load_reference()
        from hydra.utils import instantiate as ref_instantiate
        from omegaconf import OmegaConf

        self.cfg = reference_model_config(config_name, overrides=overrides)
        torch.manual_seed(seed)
        self.tm = ref_instantiate(OmegaConf.create(self.cfg), _recursive_=False)
        self.tm.eval()
        self.sd = self.tm.state_dict()
        self.mm = my_instantiate(self.cfg)
        params, skipped = convert_state_dict(self.mm, self.sd)
        # every skipped key must be a recomputed buffer, not a real weight
        from open_universe_tpu.inference.torch_convert import is_skipped_buffer

        not_buffers = [k for k in skipped if not is_skipped_buffer(k)]
        assert not not_buffers, f"unconverted non-buffer keys: {not_buffers}"
        self.params = jax_tree_asarray(params)


@pytest.fixture(scope="module")
def gan():
    return Pair("default", seed=3)


@pytest.fixture(scope="module")
def orig():
    return Pair("universe_original", seed=4)


@pytest.fixture(scope="module")
def noisy():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((B, T)) * 0.3).astype(np.float32)


def _t(x):  # numpy (B,T) -> torch (B,1,T)
    return torch.from_numpy(x)[:, None, :]


def _j(x):  # numpy (B,T) -> jax (B,T,1)
    return jnp.asarray(x)[:, :, None]


def _nchw(x):  # jax channels-last -> numpy channels-first
    return np.asarray(x).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# assembled networks
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("which", ["gan", "orig"])
def test_conditioner_parity(which, gan, orig, noisy):
    pair = gan if which == "gan" else orig
    with torch.no_grad():
        cond_r, y_r, h_r = pair.tm.condition_model(
            _t(noisy), x_wav=_t(noisy), train=True)
    cond_m, y_m, h_m = pair.mm.condition_model(
        pair.params["condition_model"], _j(noisy), x_wav=_j(noisy), train=True)
    assert len(cond_r) == len(cond_m)
    for cr, cm in zip(cond_r, cond_m):
        np.testing.assert_allclose(cr.numpy(), _nchw(cm), atol=1e-5)
    np.testing.assert_allclose(y_r.numpy(), _nchw(y_m), atol=1e-5)
    np.testing.assert_allclose(h_r.numpy(), _nchw(h_m), atol=1e-5)


@pytest.mark.parametrize("which", ["gan", "orig"])
def test_score_network_parity(which, gan, orig, noisy):
    """EDM-wrapped score for the GAN model, raw score net for the original."""
    pair = gan if which == "gan" else orig
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((B, T)) * 0.5).astype(np.float32)
    sigma = np.array([0.8, 0.02], np.float32)
    with torch.no_grad():
        cond_r, *_ = pair.tm.condition_model(_t(noisy), x_wav=_t(noisy),
                                             train=True)
        s_r = pair.tm.score_model(_t(x), torch.from_numpy(sigma), cond_r)
    cond_m, *_ = pair.mm.condition_model(
        pair.params["condition_model"], _j(noisy), x_wav=_j(noisy), train=True)
    s_m = pair.mm.score(pair.params, _j(x), jnp.asarray(sigma), cond_m)
    sr = s_r.numpy()
    # score values scale as 1/sigma^2 -> compare with a relative tolerance
    tol = 1e-6 * np.abs(sr).max()
    np.testing.assert_allclose(sr, _nchw(s_m), atol=max(tol, 1e-5))


def test_mpd_parity(gan, noisy):
    rng = np.random.default_rng(2)
    fake = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
    with torch.no_grad():
        rs_r, gs_r, fr_r, fg_r = gan.tm.loss_mpd(_t(noisy), _t(fake))
    rs_m, gs_m, fr_m, fg_m = gan.mm.loss_mpd.apply(
        gan.params["loss_mpd"], _j(noisy), _j(fake))
    for a, b in zip(rs_r + gs_r, rs_m + gs_m):
        np.testing.assert_allclose(a.numpy(), np.asarray(b), atol=2e-4)
    # feature maps compared through the (layout-independent) fm loss
    from open_universe_tpu.models.discriminators import feature_loss

    fm_r = gan.ref.bigvgan.feature_loss(fr_r, fg_r)
    fm_m = feature_loss(fr_m, fg_m)
    np.testing.assert_allclose(float(fm_r), float(fm_m), rtol=1e-4)


def test_mrd_parity(gan, noisy):
    rng = np.random.default_rng(5)
    fake = (rng.standard_normal((B, T)) * 0.3).astype(np.float32)
    with torch.no_grad():
        rs_r, gs_r, fr_r, fg_r = gan.tm.loss_mrd(_t(noisy), _t(fake))
    rs_m, gs_m, fr_m, fg_m = gan.mm.loss_mrd.apply(
        gan.params["loss_mrd"], _j(noisy), _j(fake))
    for a, b in zip(rs_r + gs_r, rs_m + gs_m):
        np.testing.assert_allclose(a.numpy(), np.asarray(b), atol=2e-4)
    from open_universe_tpu.models.discriminators import (
        discriminator_loss,
        feature_loss,
        generator_loss,
    )

    np.testing.assert_allclose(
        float(gan.ref.bigvgan.feature_loss(fr_r, fg_r)),
        float(feature_loss(fr_m, fg_m)), rtol=1e-4)
    np.testing.assert_allclose(
        float(gan.ref.bigvgan.discriminator_loss(rs_r, gs_r)[0]),
        float(discriminator_loss(rs_m, gs_m)[0]), rtol=1e-4)
    np.testing.assert_allclose(
        float(gan.ref.bigvgan.generator_loss(gs_r)[0]),
        float(generator_loss(gs_m)[0]), rtol=1e-4)


def test_mdn_loss_parity(orig):
    """MDN NLL on the pinned (C, fs*audio_len) shape (ref mdn.py:59-125)."""
    fs = orig.cfg["fs"]
    t_pin = int(fs * orig.cfg["training"]["audio_len"])
    rng = np.random.default_rng(6)
    est = rng.standard_normal((1, 32, t_pin)).astype(np.float32) * 0.3
    tgt = rng.standard_normal((1, 1, t_pin)).astype(np.float32) * 0.3
    with torch.no_grad():
        nll_r = orig.tm.loss_signal(torch.from_numpy(est),
                                    torch.from_numpy(tgt))
    nll_m = orig.mm.loss_signal.apply(
        orig.params["loss_signal"],
        jnp.asarray(est.transpose(0, 2, 1)), jnp.asarray(tgt.transpose(0, 2, 1)))
    np.testing.assert_allclose(float(nll_r), float(nll_m), rtol=1e-4)


# ---------------------------------------------------------------------------
# full enhance() sampler
# ---------------------------------------------------------------------------


def _patched_noise(ref, z0):
    """Patch both implementations' initial-noise helpers to the same array.

    With epsilon=1.0 the in-loop noise coefficient beta is exactly 0
    (universe.py:300-305), so matching the initial draw makes the full
    sampler deterministic and comparable end to end.
    """
    import contextlib

    @contextlib.contextmanager
    def ctx():
        orig_ref = ref.universe.randn
        orig_my = myuni.randn_sigma

        def ref_randn(x, sigma, rng=None):
            assert tuple(x.shape) == z0.shape, (x.shape, z0.shape)
            return torch.from_numpy(z0).to(x.dtype) * sigma[:, None, None]

        def my_randn(key, shape, sigma, dtype=jnp.float32):
            z = jnp.asarray(z0.transpose(0, 2, 1))
            return (z * sigma[:, None, None]).astype(dtype)

        ref.universe.randn = ref_randn
        myuni.randn_sigma = my_randn
        try:
            yield
        finally:
            ref.universe.randn = orig_ref
            myuni.randn_sigma = orig_my

    return ctx()


@pytest.mark.parametrize("which,packed", [("gan", False), ("gan", True),
                                          ("orig", False)])
def test_enhance_full_sampler_parity(which, packed, gan, orig, noisy):
    pair = gan if which == "gan" else orig
    z0 = (np.random.default_rng(7)
          .standard_normal((B, 1, T + 160)).astype(np.float32))
    with _patched_noise(pair.ref, z0):
        with torch.no_grad():
            out_r = pair.tm.enhance(torch.from_numpy(noisy), n_steps=4,
                                    epsilon=1.0)
        out_m = pair.mm.enhance(pair.params, jnp.asarray(noisy), n_steps=4,
                                epsilon=1.0, packed=packed)
    np.testing.assert_allclose(out_r.numpy(), np.asarray(out_m), atol=2e-5)


def test_enhance_folded_weight_norm_parity(gan, noisy):
    params = fold_weight_norm(gan.mm, jax_tree_asarray(
        convert_state_dict(gan.mm, gan.sd)[0]))
    z0 = (np.random.default_rng(8)
          .standard_normal((B, 1, T + 160)).astype(np.float32))
    with _patched_noise(gan.ref, z0):
        with torch.no_grad():
            out_r = gan.tm.enhance(torch.from_numpy(noisy), n_steps=3,
                                   epsilon=1.0)
        out_m = gan.mm.enhance(params, jnp.asarray(noisy), n_steps=3,
                               epsilon=1.0, packed=False)
    np.testing.assert_allclose(out_r.numpy(), np.asarray(out_m), atol=2e-5)


def test_enhance_aux_signal_parity(gan, noisy):
    """use_aux_signal path: conditioner + signal-decoupling Snake conv
    (universe_gan.py:146-149, snake.py, alias_free_act.py) — deterministic,
    no noise patching needed."""
    with torch.no_grad():
        out_r = gan.tm.enhance(torch.from_numpy(noisy), use_aux_signal=True)
    out_m = gan.mm.enhance(gan.params, jnp.asarray(noisy),
                           use_aux_signal=True, packed=False)
    np.testing.assert_allclose(out_r.numpy(), np.asarray(out_m), atol=2e-5)


def test_enhance_ema_ingestion_parity(gan, noisy):
    """EMA shadow ordering: perturb params, update EMA, eval() on the torch
    side (copies shadows in), apply_ema_shadow on ours — outputs must match
    (ref universe.py:130-133,841-865; torch_convert.ordered_param_names)."""
    torch.manual_seed(11)
    with torch.no_grad():
        for p in gan.tm.model_parameters():
            p.add_(torch.randn_like(p) * 0.01)
    gan.tm.ema.update(gan.tm.model_parameters())
    gan.tm.ema.update(gan.tm.model_parameters())
    sd = gan.tm.state_dict()
    ema_sd = gan.tm.ema.state_dict()
    gan.tm.eval()  # copies EMA shadows over the live params

    params, _ = convert_state_dict(gan.mm, sd)
    subs = list(gan.mm.model_param_keys())
    if any(k.startswith("_edm_model.") for k in sd):
        subs = ["_edm_model" if s == "score_model" else s for s in subs]
    params = apply_ema_shadow(gan.mm, params, sd, ema_sd["shadow_params"],
                              subs)
    params = jax_tree_asarray(params)

    z0 = (np.random.default_rng(9)
          .standard_normal((B, 1, T + 160)).astype(np.float32))
    with _patched_noise(gan.ref, z0):
        with torch.no_grad():
            out_r = gan.tm.enhance(torch.from_numpy(noisy), n_steps=3,
                                   epsilon=1.0)
        out_m = gan.mm.enhance(params, jnp.asarray(noisy), n_steps=3,
                               epsilon=1.0, packed=False)
    np.testing.assert_allclose(out_r.numpy(), np.asarray(out_m), atol=2e-5)

    # restore the module-scoped fixture's weights for later tests
    gan.tm.train()
    sd2 = {k: torch.from_numpy(np.asarray(v)) if not torch.is_tensor(v) else v
           for k, v in gan.sd.items()}
    gan.tm.load_state_dict(sd2)
    gan.tm.eval()


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def test_compressed_mag_stft_parity(gan, noisy):
    ref = gan.ref
    stft_kwargs = {"n_fft": 510, "hop_length": 128, "window_name": "hann"}
    spec_kwargs = {"transform_type": "exponent", "abs_exponent": 0.5,
                   "factor": 0.15}
    tr_r = ref.dyn_range_comp.CompressedMagSTFT(dict(stft_kwargs),
                                                dict(spec_kwargs))
    from open_universe_tpu.models.transforms import CompressedMagSTFT

    tr_m = CompressedMagSTFT(dict(stft_kwargs), dict(spec_kwargs))
    with torch.no_grad():
        spec_r = tr_r(_t(noisy))
        back_r = tr_r(spec_r, inv=True, length=T)
    spec_m = tr_m.apply({}, _j(noisy))
    back_m = tr_m.apply({}, spec_m, inv=True, length=T)
    np.testing.assert_allclose(spec_r.numpy(), _nchw(spec_m), atol=1e-5)
    np.testing.assert_allclose(back_r.numpy(), _nchw(back_m), atol=1e-5)


# ---------------------------------------------------------------------------
# GAN loss stack, LoRA adapters, aux multires loss
# ---------------------------------------------------------------------------


def test_gan_loss_stack_parity(gan, noisy):
    """Discriminator/generator/feature-matching/mel losses on the same
    (target, estimate) pair match the reference's loss stack numerically
    (reference universe_gan.py:205-302, bigvgan/gan.py:287-336).  This also
    validates the 2B-batched real+fake pairing and LSGAN loss forms."""
    from open_universe_tpu.models.discriminators import (
        discriminator_loss as my_dl, feature_loss as my_fl,
        generator_loss as my_gl)

    rng = np.random.default_rng(11)
    target = (rng.standard_normal((B, T)) * 0.2).astype(np.float32)
    y_est = (target + 0.1 * rng.standard_normal((B, T))).astype(np.float32)

    ref_gan = gan.ref.bigvgan
    with torch.no_grad():
        for name in ("loss_mpd", "loss_mrd"):
            r, g, fr, fg = getattr(gan.tm, name)(_t(target), _t(y_est))
            d_ref, _, _ = ref_gan.discriminator_loss(r, g)
            fm_ref = ref_gan.feature_loss(fr, fg)
            gl_ref, _ = ref_gan.generator_loss(g)

            disc = getattr(gan.mm, name)
            rm, gm, frm, fgm = disc(gan.params[name], _j(target), _j(y_est))
            d_my, _, _ = my_dl(rm, gm)
            fm_my = my_fl(frm, fgm)
            gl_my, _ = my_gl(gm)
            np.testing.assert_allclose(float(d_my), d_ref.item(),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
            np.testing.assert_allclose(float(fm_my), fm_ref.item(),
                                       rtol=1e-4, atol=1e-4, err_msg=name)
            np.testing.assert_allclose(float(gl_my), gl_ref.item(),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

        # the 45x mel-L1 regularizer (universe_gan.py:201-203,247)
        mel_t_ref = gan.tm.condition_model.input_mel.compute_mel_spec(
            _t(target))
        mel_e_ref = gan.tm.condition_model.input_mel.compute_mel_spec(
            _t(y_est))
        mel_ref = torch.nn.functional.l1_loss(mel_e_ref, mel_t_ref).item()
    mel_t = gan.mm.condition_model.input_mel.compute_mel_spec(_j(target))
    mel_e = gan.mm.condition_model.input_mel.compute_mel_spec(_j(y_est))
    mel_my = float(jnp.mean(jnp.abs(mel_e - mel_t)))
    np.testing.assert_allclose(mel_my, mel_ref, rtol=1e-4, atol=1e-5)


def test_lora_adapter_parity(gan):
    """LoRA-injected Conv1d/ConvTranspose1d/Linear forward and the folded
    (un_lora'd) weights match the reference adapter classes
    (reference lora/lora.py:25-253) with identical A/B matrices."""
    from open_universe_tpu.nn import Conv1d, ConvTranspose1d, Linear
    from open_universe_tpu.nn.lora import inject, remove

    ref_lora = gan.ref.lora
    rng = np.random.default_rng(5)
    torch.manual_seed(5)
    x = rng.standard_normal((2, 8, 64)).astype(np.float32)

    cases = []
    tconv = torch.nn.Conv1d(8, 12, 5, padding=2)
    cases.append((ref_lora.LoraConv1d(tconv, rank=4, alpha=2.0),
                  Conv1d(8, 12, 5, padding=2),
                  lambda w: w.transpose(2, 1, 0)))
    tct = torch.nn.ConvTranspose1d(8, 12, 4, stride=2)
    # not re-exported by the reference lora/__init__.py; lives in the module
    cases.append((ref_lora.lora.LoraConvTranspose1d(tct, rank=4, alpha=2.0),
                  ConvTranspose1d(8, 12, 4, stride=2),
                  lambda w: w.transpose(2, 0, 1)[::-1].copy()))

    for tmod, jmod, conv_w in cases:
        with torch.no_grad():
            tmod.lora_weight_a.normal_()  # reference inits A to zero
            ref_y = tmod(torch.from_numpy(x)).numpy()
            # NOT via un_lora(): the reference's Conv1d un_lora forgets
            # kernel_size and crashes (reference lora/lora.py:88-95, a real
            # bug); _get_weights() is the same folded tensor
            folded_w = tmod._get_weights().detach().numpy()

        base = tmod.conv
        params = {"weight": jnp.asarray(conv_w(base.weight.detach().numpy())),
                  "bias": jnp.asarray(base.bias.detach().numpy())}
        lp = inject(jmod, params, rank=4, alpha=2.0)
        lp["lora_weight_a"] = jnp.asarray(tmod.lora_weight_a.detach().numpy())
        lp["lora_weight_b"] = jnp.asarray(tmod.lora_weight_b.detach().numpy())
        y = jmod(lp, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), ref_y,
                                   atol=2e-5)
        # folding parity
        fp = remove(jmod, lp)
        np.testing.assert_allclose(np.asarray(fp["weight"]),
                                   conv_w(folded_w), atol=2e-6)

    # Linear
    tlin = torch.nn.Linear(16, 10)
    tl = ref_lora.LoraLinear(tlin, rank=4, alpha=3.0)
    with torch.no_grad():
        tl.lora_linear_b.normal_()  # reference inits B (not A) to zero here
        xf = rng.standard_normal((6, 16)).astype(np.float32)
        ref_y = tl(torch.from_numpy(xf)).numpy()
    jlin = Linear(16, 10)
    params = {"weight": jnp.asarray(tlin.weight.detach().numpy().T),
              "bias": jnp.asarray(tlin.bias.detach().numpy())}
    lp = inject(jlin, params, rank=4, alpha=3.0)
    # reference LoraLinear uses lora_linear_* names and nests under .linear
    assert "lora_linear_a" in lp and "linear" in lp
    lp["lora_linear_a"] = jnp.asarray(tl.lora_linear_a.detach().numpy())
    lp["lora_linear_b"] = jnp.asarray(tl.lora_linear_b.detach().numpy())
    y = jlin(lp, jnp.asarray(xf))
    np.testing.assert_allclose(np.asarray(y), ref_y, atol=2e-5)


# ---------------------------------------------------------------------------
# universepp_24k (rate [2,3,5,8], 48 ch, 128 mels at the fbank's native fs)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gan24():
    return Pair("universepp_24k", seed=6)


B24, T24 = 2, 7200  # 0.3 s @24 kHz; multiple of tot_ds = 2*3*5*8 = 240


@pytest.fixture(scope="module")
def noisy24():
    rng = np.random.default_rng(24)
    return (rng.standard_normal((B24, T24)) * 0.3).astype(np.float32)


def test_universepp_24k_network_parity(gan24, noisy24):
    """Conditioner (all three outputs) + EDM-wrapped score for the 24 kHz
    recipe (reference config/model/universepp_24k.yaml: rate_factors
    [2,3,5,8], 48 channels, 128 mels — the MelAdapter at its NATIVE 24 kHz,
    where the fs=24000 fbank quirk is self-consistent)."""
    with torch.no_grad():
        cond_r, y_r, h_r = gan24.tm.condition_model(
            _t(noisy24), x_wav=_t(noisy24), train=True)
    cond_m, y_m, h_m = gan24.mm.condition_model(
        gan24.params["condition_model"], _j(noisy24), x_wav=_j(noisy24),
        train=True)
    assert len(cond_r) == len(cond_m)
    for cr, cm in zip(cond_r, cond_m):
        np.testing.assert_allclose(cr.numpy(), _nchw(cm), atol=2e-5)
    np.testing.assert_allclose(y_r.numpy(), _nchw(y_m), atol=2e-5)
    np.testing.assert_allclose(h_r.numpy(), _nchw(h_m), atol=2e-5)

    rng = np.random.default_rng(25)
    x = (rng.standard_normal((B24, T24)) * 0.5).astype(np.float32)
    sigma = np.array([0.7, 0.03], np.float32)
    with torch.no_grad():
        s_r = gan24.tm.score_model(_t(x), torch.from_numpy(sigma), cond_r)
    s_m = gan24.mm.score(gan24.params, _j(x), jnp.asarray(sigma), cond_m)
    sr = s_r.numpy()
    tol = 1e-6 * np.abs(sr).max()
    np.testing.assert_allclose(sr, _nchw(s_m), atol=max(tol, 2e-5))


def test_universepp_24k_enhance_parity(gan24, noisy24):
    z0 = (np.random.default_rng(26)
          .standard_normal((B24, 1, T24 + 240)).astype(np.float32))
    with _patched_noise(gan24.ref, z0):
        with torch.no_grad():
            out_r = gan24.tm.enhance(torch.from_numpy(noisy24), n_steps=4,
                                     epsilon=1.0)
        out_m = gan24.mm.enhance(gan24.params, jnp.asarray(noisy24),
                                 n_steps=4, epsilon=1.0, packed=False)
    np.testing.assert_allclose(out_r.numpy(), np.asarray(out_m), atol=2e-5)


# ---------------------------------------------------------------------------
# UniverseLoRA: unrolled sampler forward + n_steps_backprop gradient gate
# ---------------------------------------------------------------------------


def _build_lora_pair(n_steps_backprop=2):
    """A reference UniverseLoRA wrapping a fresh UNIVERSE++ and our
    UniverseLoRA on the converted weights, with IDENTICAL (randomized)
    adapter matrices copied across (reference lora.py:39-126: EMA fold,
    weight-norm removal, loss-module drop, adapter injection, freezing)."""
    from open_universe_tpu.models.universe_lora import UniverseLoRA

    pair = Pair("default", seed=15)
    # reference EnhancementBaseModel uses attribute access on these configs
    # (base.py:257 ``val_kwargs.enh_losses``) -> shim DictConfig, not dict
    from omegaconf import OmegaConf

    tm_lora = pair.ref.lora_model.UniverseLoRA(
        model=pair.tm, fs=16000, losses=OmegaConf.create({}),
        training=OmegaConf.create({"audio_len": 2.0}),
        validation=OmegaConf.create({"enh_losses": {}}),
        optimizer=None, scheduler=None, grad_clipper=None,
        diffusion={"n_steps": 4, "epsilon": 1.3},
        n_steps_backprop=n_steps_backprop, use_lora=True, use_lora_score=True,
        use_lora_condition=True, lora_rank=4, lora_alpha=2.0,
        lora_train_biases=True)
    # randomize the zero-initialized adapter halves so LoRA actually
    # contributes to the forward (reference inits A=0 for convs, B=0 for
    # Linear -> a zero delta would not test the adapter math)
    torch.manual_seed(77)
    with torch.no_grad():
        for mod in tm_lora.modules():
            for attr in ("lora_weight_a", "lora_weight_b", "lora_linear_a",
                         "lora_linear_b"):
                if hasattr(mod, attr):
                    getattr(mod, attr).normal_(std=0.1)

    my_lora = UniverseLoRA(
        model=pair.mm, fs=16000, losses={}, training={"audio_len": 2.0},
        validation={}, diffusion={"n_steps": 4, "epsilon": 1.3},
        n_steps_backprop=n_steps_backprop, use_lora=True, use_lora_score=True,
        use_lora_condition=True, lora_rank=4, lora_alpha=2.0,
        lora_train_biases=True,
        base_params=fold_weight_norm(pair.mm, pair.params))
    params, skipped = convert_state_dict(my_lora, tm_lora.state_dict())
    from open_universe_tpu.inference.torch_convert import is_skipped_buffer

    not_buffers = [k for k in skipped if not is_skipped_buffer(k)]
    assert not not_buffers, f"unconverted non-buffer keys: {not_buffers}"
    return pair, tm_lora, my_lora, jax_tree_asarray(params)


def _patched_lora_noise(ref, z0):
    """Same trick as _patched_noise, but UniverseLoRA binds randn/randn_sigma
    by name in its own module (reference lora.py:34; ours universe_lora.py)."""
    import contextlib

    import open_universe_tpu.models.universe_lora as my_lora_mod

    @contextlib.contextmanager
    def ctx():
        orig_ref = ref.lora_model.randn
        orig_my = my_lora_mod.randn_sigma

        def ref_randn(x, sigma, rng=None):
            assert tuple(x.shape) == z0.shape, (x.shape, z0.shape)
            return torch.from_numpy(z0).to(x.dtype) * sigma[:, None, None]

        def my_randn(key, shape, sigma, dtype=jnp.float32):
            z = jnp.asarray(z0.transpose(0, 2, 1))
            return (z * sigma[:, None, None]).astype(dtype)

        ref.lora_model.randn = ref_randn
        my_lora_mod.randn_sigma = my_randn
        try:
            yield
        finally:
            ref.lora_model.randn = orig_ref
            my_lora_mod.randn_sigma = orig_my

    return ctx()


def test_universe_lora_unrolled_forward_and_grad_gate_parity():
    """UniverseLoRA.forward (the UNROLLED sampler trained through, reference
    lora.py:300-397) and its n_steps_backprop gradient gate: identical
    outputs AND identical gradients w.r.t. the LoRA adapters/biases when
    only the last 2 of 4 steps carry gradients."""
    pair, tm_lora, my_lora, params = _build_lora_pair(n_steps_backprop=2)

    b, t = 1, 3200
    rng = np.random.default_rng(31)
    mix = (rng.standard_normal((b, t)) * 0.3).astype(np.float32)
    z0 = rng.standard_normal((b, 1, t + 160)).astype(np.float32)

    # --- trainable-mask parity: same trainable tensor count and size
    mask = my_lora.trainable_mask(params)
    my_trainable = [leaf for leaf, m in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(mask)) if m]
    ref_trainable = [p for p in tm_lora.parameters() if p.requires_grad]
    assert len(my_trainable) == len(ref_trainable)
    assert (sum(int(np.prod(p.shape)) for p in my_trainable)
            == sum(p.numel() for p in ref_trainable))

    with _patched_lora_noise(pair.ref, z0):
        mix_t = torch.from_numpy(mix)
        out_r = tm_lora.forward(mix_t, n_steps=4, epsilon=1.0)
        loss_r = out_r.mean()
        loss_r.backward()

        def my_loss(p):
            return jnp.mean(my_lora.forward(p, jnp.asarray(mix), n_steps=4,
                                            epsilon=1.0))

        out_m = my_lora.forward(params, jnp.asarray(mix), n_steps=4,
                                epsilon=1.0)
        grads = jax.grad(my_loss)(params)

    np.testing.assert_allclose(out_r.detach().numpy(), np.asarray(out_m),
                               atol=2e-5)

    # --- gradient parity on every trainable leaf (validates the stop-
    # gradient placement exactly: a gate off by one step changes these)
    ref_grads = {name: p.grad for name, p in tm_lora.named_parameters()
                 if p.requires_grad}
    my_grads, _ = convert_state_dict(
        my_lora, {k: v for k, v in ref_grads.items() if v is not None})
    checked = 0

    def walk(mine, ref_conv, msk, path):
        nonlocal checked
        if isinstance(mine, dict):
            for k in mine:
                if isinstance(ref_conv, dict) and k in ref_conv:
                    walk(mine[k], ref_conv[k], msk[k], path + "/" + str(k))
            return
        if not msk:
            return
        g_my = np.asarray(mine, np.float64)
        g_ref = np.asarray(ref_conv, np.float64)
        denom = max(np.linalg.norm(g_ref), 1e-12)
        rel = np.linalg.norm(g_my - g_ref) / denom
        assert rel < 2e-3, f"{path}: grad mismatch rel={rel:.2e}"
        checked += 1

    grads_masked = jax.tree_util.tree_map(lambda g, m: g if m else None,
                                          grads, mask)
    walk(jax.tree_util.tree_map(lambda g: g, grads_masked), my_grads, mask,
         "")
    assert checked > 50, f"only {checked} gradient leaves compared"


# ---------------------------------------------------------------------------
# one-step training dynamics (full training_step vs make_gan_train_step)
# ---------------------------------------------------------------------------


def _patched_train_randomness(pair, zs, sigmas):
    """Pin the two stochastic draws of one GAN training step on BOTH sides:
    the per-batch sigma (sample_sigma, reference universe_gan.py:180) and the
    diffusion noise z (reference universe_gan.py:183 ``.normal_()``; ours
    jax.random.normal in generator_forward).  Each side consumes one (z,
    sigma) per step, so iterating in lockstep keeps 2+ steps comparable."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        z_t, z_j = iter(zs), iter(zs)
        s_t, s_j = iter(sigmas), iter(sigmas)
        orig_normal_ = torch.Tensor.normal_
        orig_jnormal = jax.random.normal
        orig_sample_t = pair.tm.sample_sigma
        orig_sample_j = pair.mm.sample_sigma

        def fake_normal_(self, *a, **k):
            z = next(z_t)
            assert tuple(self.shape) == z.shape, (self.shape, z.shape)
            with torch.no_grad():
                self.copy_(torch.from_numpy(z).to(self.dtype))
            return self

        def fake_jnormal(key, shape=(), dtype=jnp.float32):
            z = next(z_j).transpose(0, 2, 1)  # (B,1,T) -> (B,T,1)
            assert tuple(shape) == z.shape, (shape, z.shape)
            return jnp.asarray(z).astype(dtype)

        def fake_sample_t(x, strategy, t_min, t_max):
            s = next(s_t)
            return torch.from_numpy(s), torch.zeros(s.shape[0])

        def fake_sample_j(key, n, strategy, t_min, t_max,
                          pr_cum=None, bins=None):
            s = next(s_j)
            return jnp.asarray(s), jnp.zeros(s.shape[0])

        torch.Tensor.normal_ = fake_normal_
        jax.random.normal = fake_jnormal
        pair.tm.sample_sigma = fake_sample_t
        pair.mm.sample_sigma = fake_sample_j
        try:
            yield
        finally:
            torch.Tensor.normal_ = orig_normal_
            jax.random.normal = orig_jnormal
            del pair.tm.sample_sigma
            pair.mm.sample_sigma = orig_sample_j

    return ctx()


def _flat_delta(tree_after, tree_before):
    leaves_a = jax.tree_util.tree_leaves(tree_after)
    leaves_b = jax.tree_util.tree_leaves(tree_before)
    return np.concatenate([
        (np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel()
        for a, b in zip(leaves_a, leaves_b)])


def test_gan_train_step_dynamics_parity():
    """TWO full reference ``UniverseGAN.training_step`` calls (manual
    two-optimizer Lightning choreography, universe_gan.py:151-302) vs two
    ``make_gan_train_step`` calls on identical converted weights, batch, and
    pinned noise/sigma draws.  Asserts per-submodule parameter deltas, the
    optimizer-moment effect (the 2nd step), EMA shadows, loss values, and
    the scheduler-at-(2i, 2i+1) LR choreography.

    Short schedule horizons (T_warmup=4) make the LR move ~50% per scheduler
    step, so any drift in the update ordering (disc step -> scheduler ->
    gen step -> EMA -> scheduler) is glaring rather than a 1e-8 epsilon.

    The reference's disc optimizer registers the MRD parameters twice and
    the MPD never (universe_gan.py:415-419, a real bug we intentionally
    fix); the quirk is pinned below and the dynamics comparison runs against
    a quirk-fixed disc optimizer (MPD+MRD once each, same hyperparameters
    incl. torch.optim.AdamW's DEFAULT weight_decay=0.01)."""
    import importlib
    from types import SimpleNamespace

    from open_universe_tpu.nn.module import buffer_mask
    from open_universe_tpu.train.optim import adamw
    from open_universe_tpu.train.steps import (
        init_train_state,
        make_gan_train_step,
    )
    from open_universe_tpu.train.trainer import _build_schedule

    sched_over = {}
    for role in ("generator", "discriminator"):
        sched_over.update({
            f"scheduler.{role}.scheduler.T_warmup": 4,
            f"scheduler.{role}.scheduler.T_cosine": 6,
            f"scheduler.{role}.scheduler.T_max": 12,
            f"scheduler.{role}.scheduler.eta_min": 1e-4,
        })
    pair = Pair("default", seed=13, overrides=sched_over)
    tm, mm, cfg = pair.tm, pair.mm, pair.cfg
    tm.train()

    t_len = 4000  # multiple of tot_ds=160, > the 2048-fft MRD branch
    rng = np.random.default_rng(21)
    target = (rng.standard_normal((2, 1, t_len)) * 0.2).astype(np.float32)
    mix = (target + 0.1 * rng.standard_normal((2, 1, t_len))).astype(
        np.float32)
    zs = [rng.standard_normal((2, 1, t_len)).astype(np.float32)
          for _ in range(2)]
    sigmas = [np.array([0.9, 0.05], np.float32),
              np.array([0.3, 1.8], np.float32)]

    # ---- reference side: optimizers + schedulers via configure_optimizers
    # (CosineAnnealingLR in the installed torch lost the ``verbose`` arg the
    # reference passes through positionally)
    orig_cos_init = torch.optim.lr_scheduler.CosineAnnealingLR.__init__

    def cos_init_compat(self, optimizer, T_max, eta_min=0.0, last_epoch=-1,
                        verbose=False):
        orig_cos_init(self, optimizer, T_max, eta_min, last_epoch)

    torch.optim.lr_scheduler.CosineAnnealingLR.__init__ = cos_init_compat
    try:
        (opt_gen, opt_disc_buggy), (sch_g_cfg, sch_d_cfg) = \
            tm.configure_optimizers()

        # pin the reference quirk: MRD registered twice, MPD never
        buggy = [p for g in opt_disc_buggy.param_groups for p in g["params"]]
        mpd_params = list(tm.loss_mpd.parameters())
        mrd_params = list(tm.loss_mrd.parameters())
        assert len(buggy) == 2 * len(mrd_params)
        assert not any(any(p is q for q in mpd_params) for p in buggy)

        # quirk-fixed disc optimizer: both discriminators once, reference
        # hyperparameters (no weight_decay in the config -> torch default)
        dcfg = cfg["optimizer"]["discriminator"]
        opt_disc = torch.optim.AdamW(
            mpd_params + mrd_params, lr=dcfg["lr"],
            betas=tuple(dcfg["betas"]))
        ref_gan_mod = importlib.import_module(
            "open_universe.networks.universe.universe_gan")
        sch_disc = ref_gan_mod.instantiate_scheduler(
            tm.schedule_kwargs["discriminator"], opt_disc)["scheduler"]
        tm.set_optimizers([opt_gen, opt_disc],
                          [sch_g_cfg["scheduler"], sch_disc])
        tm.trainer = SimpleNamespace(is_last_batch=False)

        # record the LR each optimizer actually used (the scheduler steps
        # BETWEEN the disc and gen updates, so they differ within one step)
        gen_lrs, disc_lrs = [], []
        orig_gstep, orig_dstep = opt_gen.step, opt_disc.step

        def gstep(*a, **k):
            gen_lrs.append(opt_gen.param_groups[0]["lr"])
            return orig_gstep(*a, **k)

        def dstep(*a, **k):
            disc_lrs.append(opt_disc.param_groups[0]["lr"])
            return orig_dstep(*a, **k)

        opt_gen.step, opt_disc.step = gstep, dstep

        ref_logs = []
        with _patched_train_randomness(pair, zs, sigmas):
            for i in range(2):
                tm.global_step = i
                tm.training_step(
                    (torch.from_numpy(mix), torch.from_numpy(target)), i)
                ref_logs.append({k: float(v) for k, v in tm.logged.items()})

            # ---- our side: mirror the Trainer's optimizer construction
            params0 = pair.params
            mask = buffer_mask(mm, params0)
            gen_keys = list(mm.model_param_keys())
            gcfg = cfg["optimizer"]["generator"]
            sched_g = _build_schedule(cfg["scheduler"]["generator"],
                                      gcfg["lr"], 12, gan_role="generator",
                                      freeze_step=0)
            sched_d = _build_schedule(cfg["scheduler"]["discriminator"],
                                      dcfg["lr"], 12,
                                      gan_role="discriminator", freeze_step=0)
            # mirror the Trainer: the signal_decoupling_layer is in the
            # forward but never optimized (reference configure_optimizers
            # quirk — see UniverseGAN.optimized_param_keys)
            optimized = set(mm.optimized_param_keys())
            gen_mask = {
                k: (mask[k] if k in optimized else jax.tree_util.tree_map(
                    lambda _: False, mask[k]))
                for k in gen_keys}
            tx_gen = adamw(
                sched_g, betas=tuple(gcfg["betas"]),
                weight_decay=gcfg.get("weight_decay", 0.0),
                weight_decay_exclude=gcfg.get("weight_decay_exclude",
                                              ("prelu", "bias")),
                params={k: params0[k] for k in gen_keys},
                trainable_mask=gen_mask)
            tx_disc = adamw(sched_d, betas=tuple(dcfg["betas"]),
                            weight_decay=0.01)
            state = init_train_state(mm, params0, tx_gen, disc_tx=tx_disc)
            step_fn = make_gan_train_step(
                mm, tx_gen, tx_disc,
                grad_clip_vals=cfg["optimizer"]["grad_clip_vals"])
            batch = {"noisy": jnp.asarray(mix.transpose(0, 2, 1)),
                     "clean": jnp.asarray(target.transpose(0, 2, 1))}
            my_metrics = []
            for i in range(2):
                state, metrics = step_fn(state, batch, jax.random.key(i))
                my_metrics.append(metrics)
    finally:
        torch.optim.lr_scheduler.CosineAnnealingLR.__init__ = orig_cos_init

    # ---- LR choreography: disc at sched(2i), gen at sched(2i+1)
    for i in range(2):
        np.testing.assert_allclose(float(sched_d(i)), disc_lrs[i], rtol=1e-6,
                                   err_msg=f"disc lr step {i}")
        np.testing.assert_allclose(float(sched_g(i)), gen_lrs[i], rtol=1e-6,
                                   err_msg=f"gen lr step {i}")

    # ---- loss values per step (step 0 pre-update; step 1 post-moments)
    for i in range(2):
        for name in ("train/loss_disc", "train/loss_gen", "train/score",
                     "train/signal_mel"):
            np.testing.assert_allclose(
                float(my_metrics[i][name]), ref_logs[i][name],
                rtol=1e-3, atol=1e-6, err_msg=f"step {i} {name}")

    # ---- per-submodule parameter deltas after 2 steps
    ref_after, _ = convert_state_dict(mm, tm.state_dict())
    ref_after = jax_tree_asarray(ref_after)
    for key in (*gen_keys, "loss_mpd", "loss_mrd"):
        d_ref = _flat_delta(ref_after[key], params0[key])
        d_my = _flat_delta(state["params"][key], params0[key])
        ref_norm = np.linalg.norm(d_ref)
        if key not in optimized and key not in ("loss_mpd", "loss_mrd"):
            # the never-optimized signal_decoupling_layer must stay at init
            # on BOTH sides (reference configure_optimizers quirk)
            assert ref_norm == 0, f"{key}: reference moved unexpectedly"
            assert np.linalg.norm(d_my) == 0, f"{key}: ours moved"
            continue
        assert ref_norm > 0, f"{key}: reference did not move"
        rel = np.linalg.norm(d_my - d_ref) / ref_norm
        assert rel < 5e-3, f"{key}: delta mismatch rel={rel:.2e}"

    # ---- EMA shadows (updated after the gen step, decay min-rule at t=1,2)
    sd_after = tm.state_dict()
    subs = list(gen_keys)
    if any(k.startswith("_edm_model.") for k in sd_after):
        subs = ["_edm_model" if s == "score_model" else s for s in subs]
    ema_params = apply_ema_shadow(
        mm, convert_state_dict(mm, sd_after)[0], sd_after,
        tm.ema.state_dict()["shadow_params"], subs)
    ema_params = jax_tree_asarray(ema_params)
    for key in gen_keys:
        d_ref = _flat_delta(ema_params[key], params0[key])
        d_my = _flat_delta(state["ema"]["shadow"][key], params0[key])
        rel = (np.linalg.norm(d_my - d_ref)
               / max(np.linalg.norm(d_ref), 1e-30))
        assert rel < 5e-3, f"ema/{key}: shadow mismatch rel={rel:.2e}"


@pytest.mark.parametrize("scale_invariant", [False, True])
def test_multires_l1_spec_loss_parity(gan, scale_invariant):
    """MultiResL1SpecLoss matches the reference ESPnet-derived loss
    (reference losses/multires_stft.py:20-129) across windows and the
    scale-invariant projection."""
    from open_universe_tpu.losses.multires_stft import MultiResL1SpecLoss

    ref = gan.ref.multires.MultiResL1SpecLoss(
        window_sz=[80, 160, 512], time_domain_weight=0.5,
        scale_invariant=scale_invariant)
    mine = MultiResL1SpecLoss(window_sz=[80, 160, 512],
                              time_domain_weight=0.5,
                              scale_invariant=scale_invariant)
    rng = np.random.default_rng(9)
    target = rng.standard_normal((3, 4000)).astype(np.float32) * 0.3
    est = (target + 0.05 * rng.standard_normal((3, 4000))).astype(np.float32)
    with torch.no_grad():
        ref_val = ref(torch.from_numpy(target),
                      torch.from_numpy(est)).mean().item()
    my_val = float(mine(jnp.asarray(est), jnp.asarray(target)))
    np.testing.assert_allclose(my_val, ref_val, rtol=1e-5, atol=1e-6)


def test_mel_spec_multichannel_parity(gan, noisy):
    """compute_mel_spec on a 2-channel input (the with_noise_target latent
    target, reference universe.py:485-516) matches the reference per-channel
    torchaudio path (condition.py:92-107): same values, channels kept
    separate for the per-channel norm."""
    x2 = np.stack([noisy, 0.5 * noisy[:, ::-1]], axis=1)  # (B, 2, T)
    with torch.no_grad():
        ref = gan.tm.condition_model.input_mel.compute_mel_spec(
            torch.from_numpy(x2))  # (B, 2, M, F)
    mine = gan.mm.condition_model.input_mel.compute_mel_spec(
        jnp.asarray(x2.transpose(0, 2, 1)))  # (B, 2, F, M)
    assert mine.shape == (ref.shape[0], ref.shape[1], ref.shape[3],
                          ref.shape[2])
    np.testing.assert_allclose(np.asarray(mine).transpose(0, 1, 3, 2),
                               ref.numpy(), atol=2e-4)


def test_lr_scheduler_parity():
    """Our closed-form warmup-hold-cosine schedule (train/optim.py) matches
    the reference's chained-recurrence LinearWarmupCosineAnnealingLR
    (utils/schedulers.py:25-97) at every optimizer step: lr used at update i
    equals the torch value after i scheduler.step() calls."""
    import importlib

    load_reference()
    sched_mod = importlib.import_module("open_universe.utils.schedulers")
    from open_universe_tpu.train.optim import linear_warmup_cosine_annealing

    class _Compat(sched_mod.LinearWarmupCosineAnnealingLR):
        # the installed torch removed CosineAnnealingLR's ``verbose`` arg the
        # reference's __init__ passes through; replicate the reference
        # __init__ without it — get_lr (the behavior under test) is inherited
        # from the reference class untouched
        def __init__(self, optimizer, T_warmup, T_cosine, T_max, eta_min=0.0):
            self.T_cosine = T_cosine
            self.T_warmup = T_warmup
            torch.optim.lr_scheduler.CosineAnnealingLR.__init__(
                self, optimizer, T_max, eta_min)
            assert self.T_warmup < self.T_cosine < self.T_max

    base_lr, eta_min = 2e-4, 1e-7
    t_warmup, t_cosine, t_max = 10, 40, 120
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    ref_sched = _Compat(opt, T_warmup=t_warmup, T_cosine=t_cosine,
                        T_max=t_max, eta_min=eta_min)
    mine = linear_warmup_cosine_annealing(base_lr, t_warmup, t_cosine, t_max,
                                          eta_min)
    for step in range(t_max):
        ref_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(float(mine(step)), ref_lr, rtol=2e-3,
                                   atol=1e-9, err_msg=f"step {step}")
        opt.step()
        ref_sched.step()


def test_autoclip_parity():
    """Our jittable ring-buffer AutoClipper (train/optim.py) picks the same
    percentile threshold and applies the same clipping as the reference's
    sorted-list AutoClipper (utils/autoclip_module.py:54-89) while the
    history is below capacity (the ring buffer only diverges by design once
    the unbounded reference history exceeds history_size)."""
    import importlib

    load_reference()
    ac_mod = importlib.import_module("open_universe.utils.autoclip_module")
    from open_universe_tpu.train.optim import AutoClipper

    rng = np.random.default_rng(0)
    mine = AutoClipper(p=10.0, history_size=64)
    state = mine.init()
    lin = torch.nn.Linear(5, 1, bias=False)
    ref = ac_mod.AutoClipper(p=10.0)
    for i in range(40):
        g = rng.standard_normal(5).astype(np.float32) * (
            1.0 + 3.0 * rng.random())
        lin.weight.grad = torch.from_numpy(g)[None, :].clone()
        ref_gnorm, ref_clip = ref(lin)
        ref_clipped = lin.weight.grad.numpy().copy()

        clipped, state, gnorm, clip_norm = mine({"w": jnp.asarray(g)}, state)
        np.testing.assert_allclose(float(gnorm), float(ref_gnorm), rtol=1e-5,
                                   err_msg=f"step {i}")
        np.testing.assert_allclose(float(clip_norm), float(ref_clip),
                                   rtol=1e-5, err_msg=f"step {i}")
        np.testing.assert_allclose(np.asarray(clipped["w"]), ref_clipped[0],
                                   rtol=1e-4, atol=1e-7, err_msg=f"step {i}")


@pytest.mark.parametrize("norm,ref_mode,level_db",
                         [(2, "noisy", -26.0), (2, "both", -26.0),
                          ("max", "noisy", 0.0), ("max", "both", -20.0)])
def test_normalize_batch_parity(norm, ref_mode, level_db):
    """utils.normalize_batch/denormalize_batch match the reference
    (utils/norm.py:47-121) for every norm/ref combination the configs use —
    isolated from the sampler goldens that exercise them end-to-end."""
    ref_ns = load_reference()
    rng = np.random.default_rng(7)
    mix = (rng.standard_normal((2, 1, 4000)) * 0.3).astype(np.float32) + 0.05
    tgt = (rng.standard_normal((2, 1, 4000)) * 0.2).astype(np.float32)

    (mix_r, tgt_r), mean_r, std_r = ref_ns.utils.normalize_batch(
        (torch.from_numpy(mix), torch.from_numpy(tgt)), norm=norm,
        level_db=level_db, ref=ref_mode)

    from open_universe_tpu import utils as my_utils

    jmix = jnp.asarray(mix.transpose(0, 2, 1))
    jtgt = jnp.asarray(tgt.transpose(0, 2, 1))
    (mix_m, tgt_m), mean_m, std_m = my_utils.normalize_batch(
        (jmix, jtgt), norm=norm, level_db=level_db, ref=ref_mode)

    # rtol: the L2 gain accumulates 8000 squares in f32 — torch and XLA sum
    # in different orders (norm='max' is exact)
    np.testing.assert_allclose(mix_r.numpy(), _nchw(mix_m), rtol=5e-4,
                               atol=1e-7)
    np.testing.assert_allclose(tgt_r.numpy(), _nchw(tgt_m), rtol=5e-4,
                               atol=1e-7)

    back_r = ref_ns.utils.denormalize_batch(mix_r, mean_r, std_r)
    back_m = my_utils.denormalize_batch(mix_m, mean_m, std_m)
    np.testing.assert_allclose(back_r.numpy(), _nchw(back_m), rtol=5e-4,
                               atol=1e-7)
    np.testing.assert_allclose(back_r.numpy(), mix, atol=1e-5)


def test_signal_median_documented_algorithm():
    """utils.signal_median implements the algorithm the reference DOCUMENTS
    (stats.py docstring steps 1-5: per-sample median-rank member, modal
    member returned whole).  The reference torch code does not implement its
    own docstring — it argmins |original_member_index - n/2| over ranks and
    reuses that modal RANK as a member index (utils/stats.py:41-59), which
    reduces to tracking the fixed member n//2.  Quirk intentionally fixed
    (recorded in CLAUDE.md); this test pins ours to the documented intent
    and checks the shared contract (output is an ensemble member) for both."""
    ref_ns = load_reference()
    from open_universe_tpu.utils import signal_median

    rng = np.random.default_rng(11)
    for trial in range(5):
        n_ens, b, t = int(rng.integers(3, 8)), 2, 50
        ens = rng.standard_normal((n_ens, b, t)).astype(np.float32)

        # docstring-faithful numpy reference
        sorted_idx = np.argsort(ens, axis=0)
        member = sorted_idx[n_ens // 2]  # (B, T) per-sample median member
        expect = np.stack([
            ens[np.bincount(member[bi], minlength=n_ens).argmax(), bi]
            for bi in range(b)])

        my_med = np.asarray(signal_median(jnp.asarray(ens)))
        np.testing.assert_allclose(my_med, expect, atol=0, err_msg=f"t{trial}")

        # shared contract: both implementations return some ensemble member
        ref_med = ref_ns.utils.signal_median(torch.from_numpy(ens)).numpy()
        for out in (my_med, ref_med):
            for bi in range(b):
                assert any(np.array_equal(out[bi], ens[m, bi])
                           for m in range(n_ens)), f"t{trial} b{bi}"
